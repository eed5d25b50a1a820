package graft.near

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Receipt → parent transaction lineage (SURVEY §2.4 /
  * receipts.rs:159-482), re-expressed as a deterministic iterative
  * propagation join instead of the reference's LRU-cache + DB-retry
  * loop.
  *
  * The lineage graph has three node kinds — receipt ids, data ids, and
  * transactions (roots):
  *
  *  seeds  = transactions: converted_into_receipt_id → tx_hash
  *           (∪, in streaming, the resolved map carried over from
  *           earlier microbatches — the principled form of the
  *           reference's 100k LRU cache, receipts_cache.rs:4-16)
  *  edges  = execution_outcome_receipts: produced ← executed
  *         ∪ output_data_receivers: data_id ← declaring receipt
  *           (the DataId cache path, receipts.rs:107-132)
  *         ∪ data receipts: receipt ← its data_id
  *
  * Then resolved_{n+1} = resolved ∪ step(edges ⋈ resolved) until
  * fixpoint. The iteration count is bounded by the receipt DAG depth
  * within the batch; each round localCheckpoints to truncate the
  * lineage of the growing plan. In streaming, unresolved rows carry
  * over to the next microbatch (that IS the reference's retry loop,
  * made deterministic).
  */
object Lineage {

  /** Edge set (child ← parent) from the per-batch tables. */
  def edges(outcomeReceipts: DataFrame, outputData: DataFrame,
      dataReceipts: DataFrame): DataFrame = {
    val produceEdges = outcomeReceipts.select(
      col("produced_receipt_id").as("child"),
      col("executed_receipt_id").as("parent"))
    val dataDeclEdges = outputData.select(
      col("output_data_id").as("child"),
      col("output_from_receipt_id").as("parent"))
    val dataRcptEdges = dataReceipts.select(
      col("receipt_id").as("child"),
      col("data_id").as("parent"))
    produceEdges.unionByName(dataDeclEdges).unionByName(dataRcptEdges)
  }

  /** Seed map (child → tx) from this batch's transactions. */
  def seeds(transactions: DataFrame): DataFrame =
    transactions.select(
      col("converted_into_receipt_id").as("child"),
      col("transaction_hash").as("tx"))

  /** Fixpoint propagation over an explicit (seeds, edges) graph.
    * Returns every reachable node: receipt ids AND data ids → tx.
    */
  def resolveGraph(seedMap: DataFrame, edgeSet: DataFrame,
      maxIter: Int = 50): DataFrame = {
    var resolved = seedMap.dropDuplicates("child").localCheckpoint(true)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val newly = edgeSet.alias("e")
        .join(resolved.alias("r"), col("e.parent") === col("r.child"))
        .select(col("e.child").as("child"), col("r.tx").as("tx"))
        .dropDuplicates("child")
        .join(resolved.select(col("child").as("rc")),
          col("child") === col("rc"), "left_anti")
        .localCheckpoint(true)
      if (newly.isEmpty) done = true
      else resolved = resolved.unionByName(newly).localCheckpoint(true)
      iter += 1
    }
    resolved
  }

  /** Batch entry point: (lineage_receipt_id,
    * originated_from_transaction_hash) for every resolvable receipt.
    */
  def resolve(transactions: DataFrame, outcomeReceipts: DataFrame,
      outputData: DataFrame, dataReceipts: DataFrame,
      maxIter: Int = 50): DataFrame =
    resolveGraph(seeds(transactions),
      edges(outcomeReceipts, outputData, dataReceipts), maxIter)
      .select(col("child").as("lineage_receipt_id"),
        col("tx").as("originated_from_transaction_hash"))
}
