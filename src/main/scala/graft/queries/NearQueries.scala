package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.near.{Fixtures, Ingest}

/** Driver-facing NEAR-indexer queries: each runs the real ETL DAG
  * (parse → transform → lineage) over the embedded fixture chain and
  * returns one of the 17 output tables, ordered deterministically.
  * No DuckDB oracle (the fixture stream isn't a parquet table in the
  * driver's sfDir) — these get the rows-only check; the golden-value
  * assertions live in NearSpec.
  */
object NearQueries {

  private def tables(s: SparkSession): Map[String, DataFrame] =
    Ingest.allTables(Ingest.blocksFromJson(s, Fixtures.chain).toDF())

  private def table(name: String, order: Seq[String])(
      s: SparkSession, dir: String): DataFrame =
    tables(s)(name).orderBy(order.map(col): _*)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "near_blocks" -> table("blocks", Seq("block_height", "block_hash")) _,
    "near_chunks" -> table("chunks", Seq("chunk_hash")) _,
    "near_transactions" -> table("transactions", Seq("transaction_hash")) _,
    "near_transaction_actions" ->
      table("transaction_actions", Seq("transaction_hash", "index_in_transaction")) _,
    "near_receipts" -> table("receipts", Seq("receipt_id")) _,
    "near_action_receipt_actions" ->
      table("action_receipt_actions", Seq("receipt_id", "index_in_action_receipt")) _,
    "near_data_receipts" -> table("data_receipts", Seq("data_id")) _,
    "near_execution_outcomes" -> table("execution_outcomes", Seq("receipt_id")) _,
    "near_execution_outcome_receipts" ->
      table("execution_outcome_receipts",
        Seq("executed_receipt_id", "index_in_execution_outcome")) _,
    "near_accounts" -> table("accounts", Seq("account_id")) _,
    "near_access_keys" -> table("access_keys", Seq("account_id", "public_key")) _,
    "near_account_changes" ->
      table("account_changes", Seq("changed_in_block_timestamp", "index_in_block")) _,
    "near_ft_events" ->
      table("assets__fungible_token_events",
        Seq("emitted_at_block_timestamp", "emitted_in_shard_id",
          "emitted_index_of_event_entry_in_shard")) _,
    "near_nft_events" ->
      table("assets__non_fungible_token_events",
        Seq("emitted_at_block_timestamp", "emitted_in_shard_id",
          "emitted_index_of_event_entry_in_shard")) _,
  )
}
