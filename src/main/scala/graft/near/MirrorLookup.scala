package graft.near

import java.sql.Connection

/** J1/J2/J3 as indexed point lookups against the JDBC mirror — the
  * queries the reference itself runs on lineage misses
  * (`receipts.rs:249-264` tx conversion, `:348-375` produced-by,
  * `:409-429` declared-data-id). The lookups are O(frontier) per batch,
  * replacing the parquet fallback's O(history) scans when a mirror is
  * configured. [[resolveFrontierDistributed]] is the streaming path:
  * each executor partition resolves its own slice of the frontier over
  * its own connection in 500-id chunks, so even a worst-case recovery
  * frontier never materializes on the driver; [[resolveFrontier]] is
  * the driver-side variant for bounded ad-hoc lookups.
  */
object MirrorLookup {

  /** J3: the id was a transaction's converted receipt. */
  val J3Sql: String =
    "SELECT converted_into_receipt_id, transaction_hash FROM transactions " +
      "WHERE converted_into_receipt_id IN (%s)"

  /** J2: the id was produced by an already-mirrored executed receipt. */
  val J2Sql: String =
    "SELECT eor.produced_receipt_id, r.originated_from_transaction_hash " +
      "FROM execution_outcome_receipts eor " +
      "JOIN receipts r ON eor.executed_receipt_id = r.receipt_id " +
      "WHERE eor.produced_receipt_id IN (%s)"

  /** J1: the id is a data_id declared by a mirrored receipt. */
  val J1Sql: String =
    "SELECT o.output_data_id, r.originated_from_transaction_hash " +
      "FROM action_receipt_output_data o " +
      "JOIN receipts r ON o.output_from_receipt_id = r.receipt_id " +
      "WHERE o.output_data_id IN (%s)"

  /** Same 500 bound as the sink's insert chunks (adapters/mod.rs:13). */
  val ChunkSize = 500

  private def query(conn: Connection, template: String,
      ids: Seq[String]): Seq[(String, String)] =
    ids.grouped(ChunkSize).flatMap { chunk =>
      val sql = template.format(Seq.fill(chunk.size)("?").mkString(", "))
      val ps = conn.prepareStatement(sql)
      try {
        chunk.zipWithIndex.foreach { case (id, i) => ps.setString(i + 1, id) }
        val rs = ps.executeQuery()
        val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
        while (rs.next()) out += ((rs.getString(1), rs.getString(2)))
        out.toSeq
      } finally ps.close()
    }.toSeq

  /** Resolve frontier ids → (child, tx) lineage seeds via the three
    * indexed lookups.
    */
  def resolveFrontier(factory: JdbcSink.ConnectionFactory,
      ids: Seq[String]): Seq[(String, String)] = {
    if (ids.isEmpty) return Seq.empty
    val conn = factory.connect()
    try query(conn, J3Sql, ids) ++ query(conn, J2Sql, ids) ++
      query(conn, J1Sql, ids)
    finally conn.close()
  }

  /** Executor-side frontier resolution: one connection per partition,
    * each resolving its slice of `frontier` (a DataFrame with a
    * `parent` string column) → a (child, tx) seed DataFrame. Memory is
    * bounded per partition, not per driver — the streaming path.
    */
  def resolveFrontierDistributed(factory: JdbcSink.ConnectionFactory,
      frontier: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = frontier.sparkSession
    import spark.implicits._
    frontier.select("parent").as[String].mapPartitions { it =>
      val ids = it.toVector
      if (ids.isEmpty) Iterator.empty
      else {
        val conn = factory.connect()
        val out =
          try query(conn, J3Sql, ids) ++ query(conn, J2Sql, ids) ++
            query(conn, J1Sql, ids)
          finally conn.close()
        out.iterator
      }
    }.toDF("child", "tx")
  }
}
