package graft.near

import java.sql.{Connection, PreparedStatement, SQLException}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** The idempotent JDBC mirror sink (SURVEY S5–S8): every table insert
  * is `INSERT … ON CONFLICT DO NOTHING` (S5, receipts.rs:484-498) in
  * chunks of 500 (S6, adapters/mod.rs:13), retried with exponential
  * backoff 100 ms → ×2 → cap 120 s (retryable.rs:1-43, lib.rs:14-17);
  * mutable registries use a guarded upsert that collapses the
  * reference's insert-then-conditional-UPDATE dance
  * (accounts.rs:85-198) into one `ON CONFLICT … DO UPDATE … WHERE`
  * statement (S7); unique-violation errors branch on constraint name —
  * duplicate = fine, other = logged broken data (S8,
  * assets/events.rs:20-42).
  *
  * No database in the build container ever parses these statements
  * (the spec records through a java.sql proxy), so the exact SQL text
  * is frozen by golden assertions in JdbcSinkSpec and executed for
  * real — parse + merge semantics — against DuckDB by
  * `dev/check_sink_sql.py` (the executable twin of the goldens).
  *
  * Plain `df.write.jdbc` cannot emit ON CONFLICT, hence this writer:
  * `df.foreachPartition` → chunked addBatch/executeBatch over a
  * driver-agnostic [[JdbcSink.ConnectionFactory]]. Each Spark
  * partition holds one connection, so write parallelism ==
  * `df.rdd.getNumPartitions` — `df.coalesce(30)` caps it like the
  * reference's 30-connection pool (models/mod.rs:30-34).
  */
object JdbcSink {

  /** Serializable connection source (executors open their own). */
  trait ConnectionFactory extends Serializable {
    def connect(): Connection
  }

  final case class DriverManagerFactory(url: String,
      props: Map[String, String] = Map.empty) extends ConnectionFactory {
    def connect(): Connection = {
      val p = new java.util.Properties()
      props.foreach { case (k, v) => p.setProperty(k, v) }
      java.sql.DriverManager.getConnection(url, p)
    }
  }

  final case class RetryPolicy(
      maxAttempts: Int = 10,
      initialBackoffMs: Long = 100L,
      maxBackoffMs: Long = 120000L)

  // ---- SQL generation --------------------------------------------------

  private def placeholders(n: Int) = Seq.fill(n)("?").mkString(", ")

  /** S5: `INSERT … ON CONFLICT DO NOTHING` (diesel
    * on_conflict_do_nothing emits the targetless form).
    */
  def insertDoNothingSql(table: String, cols: Seq[String]): String =
    s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${placeholders(cols.size)}) ON CONFLICT DO NOTHING"

  /** S7: guarded upsert — insert wins only over an absent row; an
    * existing row is updated iff the incoming row is newer
    * (`guardCol` strictly greater) AND `extraGuard` (e.g. the
    * implicit-account recreate rule) holds.
    */
  def guardedUpsertSql(table: String, cols: Seq[String],
      conflictCols: Seq[String], updateCols: Seq[String], guardCol: String,
      extraGuard: Option[String] = None): String = {
    val sets = updateCols.map(c => s"$c = excluded.$c").mkString(", ")
    val guard =
      s"$table.$guardCol < excluded.$guardCol" +
        extraGuard.map(g => s" AND ($g)").getOrElse("")
    s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${placeholders(cols.size)}) " +
      s"ON CONFLICT (${conflictCols.mkString(", ")}) DO UPDATE SET $sets " +
      s"WHERE $guard"
  }

  /** The accounts-registry merge (accounts.rs:93-193): one statement
    * per delta row. Implicit accounts (64-char ids) arriving as a
    * re-create (created set, deleted NULL) may only update a row that
    * is already deleted (issue #68, accounts.rs:137-151: the reference
    * filters `deleted_by_receipt_id IS NOT NULL` and otherwise skips
    * the UPDATE entirely — including the height bump); delete-only
    * deltas (created NULL) must not null out an existing created
    * receipt, hence the COALESCE column-wise merge.
    */
  def accountsUpsertSql: String =
    "INSERT INTO accounts (account_id, created_by_receipt_id, " +
      "deleted_by_receipt_id, last_update_block_height) VALUES (?, ?, ?, ?) " +
      "ON CONFLICT (account_id) DO UPDATE SET " +
      "created_by_receipt_id = COALESCE(excluded.created_by_receipt_id, " +
      "accounts.created_by_receipt_id), " +
      "deleted_by_receipt_id = excluded.deleted_by_receipt_id, " +
      "last_update_block_height = excluded.last_update_block_height " +
      "WHERE accounts.last_update_block_height < excluded.last_update_block_height " +
      "AND NOT (length(excluded.account_id) = 64 " +
      "AND excluded.created_by_receipt_id IS NOT NULL " +
      "AND excluded.deleted_by_receipt_id IS NULL " +
      "AND accounts.deleted_by_receipt_id IS NULL)"

  /** The access-keys merge. `permission_kind` updates only when the
    * delta saw an UPDATE (created_by non-null): a DELETE-only batch
    * delta carries the FULL_ACCESS placeholder, which must not shadow
    * the real permission of the last UPDATE in an earlier batch — the
    * reference never touches permission_kind after insert
    * (access_keys.rs:79-143), and the parquet compaction
    * ([[Warehouse.accessKeysCurrent]]) keys the perm on the latest
    * created_by-bearing delta for the same reason.
    */
  def accessKeysUpsertSql: String =
    "INSERT INTO access_keys (public_key, account_id, created_by_receipt_id, " +
      "deleted_by_receipt_id, permission_kind, last_update_block_height) " +
      "VALUES (?, ?, ?, ?, ?, ?) " +
      "ON CONFLICT (public_key, account_id) DO UPDATE SET " +
      "created_by_receipt_id = COALESCE(excluded.created_by_receipt_id, " +
      "access_keys.created_by_receipt_id), " +
      "deleted_by_receipt_id = excluded.deleted_by_receipt_id, " +
      "permission_kind = CASE WHEN excluded.created_by_receipt_id IS NOT NULL " +
      "THEN excluded.permission_kind ELSE access_keys.permission_kind END, " +
      "last_update_block_height = excluded.last_update_block_height " +
      "WHERE access_keys.last_update_block_height < excluded.last_update_block_height"

  // ---- Row binding -----------------------------------------------------

  /** Bind a Spark Row to a PreparedStatement in schema order. */
  def bind(ps: PreparedStatement, schema: StructType, row: Row): Unit =
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val j = i + 1
      if (row.isNullAt(i)) ps.setObject(j, null)
      else f.dataType match {
        case StringType => ps.setString(j, row.getString(i))
        case IntegerType => ps.setInt(j, row.getInt(i))
        case LongType => ps.setLong(j, row.getLong(i))
        case BooleanType => ps.setBoolean(j, row.getBoolean(i))
        case DoubleType => ps.setDouble(j, row.getDouble(i))
        case _: DecimalType => ps.setBigDecimal(j, row.getDecimal(i))
        case BinaryType => ps.setBytes(j, row.getAs[Array[Byte]](i))
        case _ => ps.setObject(j, row.get(i))
      }
    }

  // ---- Execution -------------------------------------------------------

  /** S8 branch: SQLState 23505 (unique violation). The expected
    * (duplicate) constraint means the row is already there — fine
    * under at-least-once replay; any other unique constraint is
    * logged broken data. Returns true when the error is handled.
    */
  def handleUniqueViolation(e: SQLException,
      duplicateConstraint: String, brokenDataConstraint: String): Boolean =
    if (e.getSQLState == "23505") {
      val msg = Option(e.getMessage).getOrElse("")
      if (msg.contains(duplicateConstraint)) true
      else {
        if (msg.contains(brokenDataConstraint))
          System.err.println(s"[jdbc-sink] data inconsistency found: $msg")
        false
      }
    } else false

  /** Run `body` with the reference's retry schedule (retryable.rs:
    * 34-36), except the interval is clamped AT the cap — the
    * reference's "double while below" lets the last sleep overshoot to
    * just under 2×maxBackoffMs, a quirk not worth keeping. `sleep`
    * is injectable for tests.
    */
  def retry[T](policy: RetryPolicy, sleep: Long => Unit = Thread.sleep)(
      body: () => T): T = {
    var interval = policy.initialBackoffMs
    var attempt = 0
    var last: Throwable = null
    while (attempt < policy.maxAttempts) {
      attempt += 1
      try return body()
      catch {
        case e: SQLException =>
          last = e
          if (attempt < policy.maxAttempts) {
            sleep(interval)
            interval = math.min(interval * 2, policy.maxBackoffMs)
          }
      }
    }
    throw new SQLException(
      s"Failed to perform query to database after ${policy.maxAttempts} " +
        "attempts. Stop trying.", last)
  }

  /** Write `df` through `sql` (one ? per column, in df column order),
    * chunked `batchSize` rows per executeBatch, one connection per
    * Spark partition, retried per chunk.
    */
  def write(df: DataFrame, factory: ConnectionFactory, sql: String,
      batchSize: Int = 500, policy: RetryPolicy = RetryPolicy()): Unit = {
    val schema = df.schema
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = factory.connect()
        try {
          val ps = conn.prepareStatement(sql)
          val buf = new scala.collection.mutable.ArrayBuffer[Row](batchSize)
          // A failed executeBatch clears the driver-side batch, so each
          // chunk is re-bound from the buffer on retry.
          def flush(): Unit = if (buf.nonEmpty) {
            retry(policy) { () =>
              ps.clearBatch()
              buf.foreach { r => bind(ps, schema, r); ps.addBatch() }
              ps.executeBatch()
            }
            buf.clear()
          }
          rows.foreach { r =>
            buf += r
            if (buf.size == batchSize) flush()
          }
          flush()
        } finally conn.close()
      }
    }
  }
}
