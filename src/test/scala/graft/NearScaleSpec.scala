package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.near.{Fixtures, Ingest}

/** Property-style invariants on the synthetic chain (SURVEY §5):
  * PK uniqueness, lineage totality, dense ordinals — the invariants
  * the reference enforces with DB constraints + strict mode.
  */
class NearScaleSpec extends AnyFunSuite {
  import SparkTestSession._

  private val n = 64
  private val txPerBlock = 4

  lazy val tables = Ingest.allTables(
    Ingest.blocksFromJson(spark, Fixtures.syntheticChain(n, txPerBlock)).toDF())
    .map { case (k, v) => k -> v.cache() }

  test("lineage totality: every chunk ACTION/DATA receipt resolves") {
    // Receipts in blocks 1..n-1: SR receipts (txPerBlock each) + PR
    // receipts in blocks 2..n-1. None may be dropped: parents always
    // exist within the chain.
    val expected = (n - 1) * txPerBlock + (n - 2) * txPerBlock
    assert(tables("receipts").count() == expected)
    val bad = tables("receipts")
      .filter(!org.apache.spark.sql.functions
        .col("originated_from_transaction_hash").startsWith("STX"))
      .count()
    assert(bad == 0)
  }

  test("PK uniqueness holds on every table") {
    val pks = Map(
      "blocks" -> Seq("block_hash"),
      "chunks" -> Seq("chunk_hash"),
      "transactions" -> Seq("transaction_hash"),
      "receipts" -> Seq("receipt_id"),
      "execution_outcomes" -> Seq("receipt_id"),
      "accounts" -> Seq("account_id"),
      "assets__fungible_token_events" ->
        Seq("emitted_for_receipt_id", "emitted_index_of_event_entry_in_shard"))
    pks.foreach { case (t, pk) =>
      val df = tables(t)
      assert(df.count() == df.select(pk.map(
        org.apache.spark.sql.functions.col): _*).distinct().count(),
        s"PK violation in $t")
    }
  }

  test("produced-receipt edges line up with the next block's receipts") {
    // Every PR edge target from block i's outcomes appears as a
    // receipt in block i+1 (except the tail, which never arrives).
    val eor = tables("execution_outcome_receipts")
    assert(eor.count() == (n - 1) * txPerBlock)
  }
}
