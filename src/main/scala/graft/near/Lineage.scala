package graft.near

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Receipt → parent transaction lineage (SURVEY §2.4 /
  * receipts.rs:159-482), re-expressed as a deterministic iterative
  * propagation join instead of the reference's LRU-cache + DB-retry
  * loop:
  *
  *  seeds  = transactions: converted_into_receipt_id → tx_hash
  *  edges  = execution_outcome_receipts: produced ← executed
  *         ∪ data receipts: data receipt ← receipt that declared the
  *           data_id in output_data_receivers (the DataId cache path,
  *           receipts.rs:107-132)
  *
  * Then resolved_{n+1} = resolved ∪ step(edges ⋈ resolved) until
  * fixpoint. The iteration count is bounded by the receipt DAG depth
  * within the batch; each round localCheckpoints to truncate the plan.
  * In streaming, unresolved rows carry over to the next microbatch
  * (that IS the reference's retry loop, made deterministic).
  */
object Lineage {

  /** @param transactions  output of Transforms.transactions (or any df
    *                      with transaction_hash + converted_into_receipt_id)
    * @param outcomeReceipts Transforms.executionOutcomeReceipts
    * @param outputData    Transforms.actionReceiptOutputData
    * @param dataReceipts  Transforms.dataReceipts
    * @return (lineage_receipt_id, originated_from_transaction_hash)
    */
  def resolve(transactions: DataFrame, outcomeReceipts: DataFrame,
      outputData: DataFrame, dataReceipts: DataFrame,
      maxIter: Int = 50): DataFrame = {

    val seeds = transactions.select(
      col("converted_into_receipt_id").as("child"),
      col("transaction_hash").as("tx"))

    val produceEdges = outcomeReceipts.select(
      col("produced_receipt_id").as("child"),
      col("executed_receipt_id").as("parent"))

    // Data receipts inherit the tx of the receipt that declared their
    // data_id as an output.
    val dataEdges = dataReceipts.alias("dr")
      .join(outputData.alias("od"),
        col("dr.data_id") === col("od.output_data_id"))
      .select(col("dr.receipt_id").as("child"),
        col("od.output_from_receipt_id").as("parent"))

    val edges = produceEdges.unionByName(dataEdges)

    var resolved = seeds.dropDuplicates("child").localCheckpoint(true)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val newly = edges.alias("e")
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
    resolved.select(col("child").as("lineage_receipt_id"),
      col("tx").as("originated_from_transaction_hash"))
  }
}
