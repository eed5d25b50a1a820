package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement, SQLException}
import scala.collection.mutable
import org.scalatest.funsuite.AnyFunSuite
import graft.near.JdbcSink

/** The ON-CONFLICT JDBC sink (S5–S8): SQL generation, chunked
  * batching, retry/backoff, and error-class handling — exercised
  * against a recording java.sql proxy (no database needed; local-mode
  * executors share the JVM with the collector).
  */
object JdbcRecorder {
  // (sql, boundRows) per executeBatch call; shared across local executors
  val batches = mutable.ArrayBuffer[(String, Seq[Seq[Any]])]()
  val failuresLeft = new java.util.concurrent.atomic.AtomicInteger(0)
  val sleeps = mutable.ArrayBuffer[Long]()

  def reset(failures: Int = 0): Unit = synchronized {
    batches.clear(); sleeps.clear(); failuresLeft.set(failures)
  }

  private class PsHandler(sql: String) extends InvocationHandler {
    private val current = mutable.ArrayBuffer[mutable.ArrayBuffer[Any]]()
    private var row = mutable.ArrayBuffer[Any]()
    def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef =
      m.getName match {
        case n if n.startsWith("set") =>
          val idx = args(0).asInstanceOf[Int]
          while (row.size < idx) row += null
          row(idx - 1) = if (args.length > 1) args(1) else null
          null
        case "addBatch" => current += row; row = mutable.ArrayBuffer[Any](); null
        case "clearBatch" => current.clear(); row.clear(); null
        case "executeBatch" =>
          if (JdbcRecorder.failuresLeft.getAndDecrement() > 0)
            throw new SQLException("transient fault", "08000")
          JdbcRecorder.synchronized {
            JdbcRecorder.batches += ((sql, current.map(_.toSeq).toSeq))
          }
          current.clear()
          Array.empty[Int]
        case "close" => null
        case _ => null
      }
  }

  private class ConnHandler extends InvocationHandler {
    def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef =
      m.getName match {
        case "prepareStatement" =>
          Proxy.newProxyInstance(getClass.getClassLoader,
            Array(classOf[PreparedStatement]),
            new PsHandler(args(0).asInstanceOf[String]))
        case "close" => null
        case "isClosed" => java.lang.Boolean.FALSE
        case _ => null
      }
  }

  class Factory extends JdbcSink.ConnectionFactory {
    def connect(): Connection =
      Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[Connection]), new ConnHandler).asInstanceOf[Connection]
  }
}

class JdbcSinkSpec extends AnyFunSuite {
  import SparkTestSession._

  test("S5 insert-do-nothing SQL") {
    assert(JdbcSink.insertDoNothingSql("blocks",
      Seq("block_hash", "block_height")) ==
      "INSERT INTO blocks (block_hash, block_height) VALUES (?, ?) " +
        "ON CONFLICT DO NOTHING")
  }

  test("S7 guarded upsert SQL: height guard and extra condition") {
    val sql = JdbcSink.guardedUpsertSql("access_keys",
      Seq("public_key", "account_id", "permission_kind"),
      Seq("public_key", "account_id"), Seq("permission_kind"),
      "last_update_block_height",
      extraGuard = Some("access_keys.deleted_by_receipt_id IS NOT NULL"))
    assert(sql.contains("ON CONFLICT (public_key, account_id) DO UPDATE SET " +
      "permission_kind = excluded.permission_kind"))
    assert(sql.contains("WHERE access_keys.last_update_block_height < " +
      "excluded.last_update_block_height AND " +
      "(access_keys.deleted_by_receipt_id IS NOT NULL)"))
  }

  test("accounts merge SQL keeps implicit-account and delete-only rules") {
    val sql = JdbcSink.accountsUpsertSql
    // issue #68: an implicit (64-char) re-create against a LIVE stored
    // row skips the WHOLE update (no deleted/height overwrite either) —
    // the gate is on the statement's WHERE, not per-column
    assert(sql.contains(
      "AND NOT (length(excluded.account_id) = 64 " +
        "AND excluded.created_by_receipt_id IS NOT NULL " +
        "AND excluded.deleted_by_receipt_id IS NULL " +
        "AND accounts.deleted_by_receipt_id IS NULL)"))
    // delete-only deltas keep the stored created receipt
    assert(sql.contains(
      "COALESCE(excluded.created_by_receipt_id, accounts.created_by_receipt_id)"))
    assert(sql.contains(
      "WHERE accounts.last_update_block_height < excluded.last_update_block_height"))
  }

  test("chunked batching: 1200 rows → 500/500/200 with bound values") {
    import spark.implicits._
    JdbcRecorder.reset()
    val df = (1 to 1200).map(i => (s"h$i", i.toLong)).toDF("hash", "height")
      .coalesce(1)
    JdbcSink.write(df, new JdbcRecorder.Factory,
      JdbcSink.insertDoNothingSql("t", Seq("hash", "height")))
    val sizes = JdbcRecorder.batches.map(_._2.size).sorted
    assert(sizes == Seq(200, 500, 500))
    val allRows = JdbcRecorder.batches.flatMap(_._2)
    assert(allRows.size == 1200)
    assert(allRows.forall(r => r.size == 2 &&
      r(0).toString.startsWith("h") && r(1).isInstanceOf[java.lang.Long]))
  }

  test("transient failures retry with re-bound chunk, then succeed") {
    import spark.implicits._
    JdbcRecorder.reset(failures = 2)
    val df = (1 to 10).map(i => (s"h$i", i.toLong)).toDF("hash", "height")
      .coalesce(1)
    JdbcSink.write(df, new JdbcRecorder.Factory,
      JdbcSink.insertDoNothingSql("t", Seq("hash", "height")),
      policy = JdbcSink.RetryPolicy(maxAttempts = 5, initialBackoffMs = 1))
    assert(JdbcRecorder.batches.map(_._2.size) == Seq(10)) // rebound once
  }

  test("retry exhaustion throws after maxAttempts with backoff doubling") {
    val slept = mutable.ArrayBuffer[Long]()
    val e = intercept[SQLException] {
      JdbcSink.retry(JdbcSink.RetryPolicy(maxAttempts = 4,
        initialBackoffMs = 100, maxBackoffMs = 120000), slept += _) { () =>
        throw new SQLException("down")
      }
    }
    assert(e.getMessage.contains("after 4 attempts"))
    assert(slept.toSeq == Seq(100, 200, 400)) // no sleep after final attempt
  }

  test("S8 unique-violation branch: duplicate ok, broken data logged") {
    val dup = new SQLException(
      "duplicate key value violates unique constraint \"t_pkey\"", "23505")
    assert(JdbcSink.handleUniqueViolation(dup, "t_pkey", "t_unique"))
    val broken = new SQLException(
      "duplicate key value violates unique constraint \"t_unique\"", "23505")
    assert(!JdbcSink.handleUniqueViolation(broken, "t_pkey", "t_unique"))
    val other = new SQLException("connection reset", "08000")
    assert(!JdbcSink.handleUniqueViolation(other, "t_pkey", "t_unique"))
  }

  // Golden statements: no database in this container ever parses these
  // (the proxy records, it doesn't execute), so freeze the exact SQL.
  // A refactor that changes conflict semantics — the COALESCE column
  // merge, the strict `<` height guard, or the issue #68 implicit-
  // account recreate screen (accounts.rs:93-193, access_keys.rs:79-144)
  // — must consciously update these literals.
  test("golden SQL: insert-do-nothing is the targetless diesel form") {
    assert(JdbcSink.insertDoNothingSql("blocks",
        Seq("block_height", "block_hash")) ==
      "INSERT INTO blocks (block_height, block_hash) VALUES (?, ?) " +
        "ON CONFLICT DO NOTHING")
  }

  test("golden SQL: accounts upsert (COALESCE merge + height guard + issue #68 screen)") {
    assert(JdbcSink.accountsUpsertSql ==
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
        "AND accounts.deleted_by_receipt_id IS NULL)")
  }

  test("golden SQL: access_keys upsert (composite key + COALESCE merge + height guard + perm no-shadow)") {
    // The CASE guard is the mirror-side twin of the r9 parquet-
    // compaction fix (Warehouse.accessKeysCurrent): a DELETE-only
    // delta's FULL_ACCESS placeholder must not overwrite the real
    // permission from an earlier batch's UPDATE (access_keys.rs:79-143
    // never updates permission_kind after insert).
    assert(JdbcSink.accessKeysUpsertSql ==
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
        "WHERE access_keys.last_update_block_height < excluded.last_update_block_height")
  }
}
