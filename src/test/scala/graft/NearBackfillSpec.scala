package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.near.{Backfill, Fixtures, Ingest, Views}

/** J7 backfill joins and the A4/daily-job orchestration. */
class NearBackfillSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val tables: Map[String, DataFrame] =
    Ingest.allTables(Ingest.blocksFromJson(spark, Fixtures.chain).toDF())
      .map { case (k, v) => k -> v.cache() }

  test("J7: re-denormalized action_receipt_actions equals live transform") {
    val live = tables("action_receipt_actions")
      // only resolvable receipts exist in `receipts` (the join target)
      .join(tables("receipts").select("receipt_id"), Seq("receipt_id"))
    val backfilled = Backfill.denormalizeActionReceiptActions(
      live, tables("receipts"))
    val cols = live.columns.sorted.map(col).toSeq
    assert(backfilled.select(cols: _*).except(live.select(cols: _*)).isEmpty)
    assert(live.select(cols: _*).except(backfilled.select(cols: _*)).isEmpty)
  }

  test("J7: outcome shard_id backfill matches the chunk's shard") {
    val bf = Backfill.backfillOutcomeShardId(tables("execution_outcomes"),
      tables("receipts"), tables("chunks"))
    val r1 = bf.filter(col("receipt_id") === "R1").collect()(0)
    assert(r1.getAs[java.math.BigDecimal]("shard_id").intValue == 0)
  }

  test("J7: args_base64 → args_json backfill (decode_or_null, bridge skip)") {
    import spark.implicits._
    val validB64 = java.util.Base64.getEncoder
      .encodeToString("""{"b":2,"a":1}""".getBytes("UTF-8"))
    val badB64 = java.util.Base64.getEncoder
      .encodeToString("not json".getBytes("UTF-8"))
    val rows = Seq(
      ("R1", "FUNCTION_CALL", "app.near",
        s"""{"args_base64":"$validB64","deposit":"0"}"""),
      ("R2", "FUNCTION_CALL", "app.near",
        s"""{"args_base64":"$badB64","deposit":"0"}"""),
      ("R3", "FUNCTION_CALL", "client.bridge.near",
        s"""{"args_base64":"$validB64","deposit":"0"}"""),
      ("R4", "TRANSFER", "app.near", """{"deposit":"5"}"""))
      .toDF("receipt_id", "action_kind", "receipt_receiver_account_id", "args")
    val out = Backfill.convertArgsJson(rows).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    // valid JSON embedded canonically (keys sorted, jsonb parity)
    assert(out("R1") ==
      s"""{"args_base64":"$validB64","args_json":{"a":1,"b":2},"deposit":"0"}""")
    // unparseable payload → {} (decode_or_null)
    assert(out("R2") ==
      s"""{"args_base64":"$badB64","args_json":{},"deposit":"0"}""")
    // bridge receiver excluded by the migration's WHERE
    assert(out("R3") == s"""{"args_base64":"$validB64","deposit":"0"}""")
    // non-FUNCTION_CALL untouched
    assert(out("R4") == """{"deposit":"5"}""")
  }

  test("A4 + daily orchestration: compute once, then skip") {
    import spark.implicits._
    val v = Views.aggregatedLockups(tables("accounts"), tables("receipts"),
      tables("blocks"))
    val states = spark.createDataset(Fixtures.lockupStates)
    // request time = one day after the chain tip → day boundary above
    // every block, so A2 picks the tip (B102a).
    val requestTs = BigInt("1700000002000000000") + BigInt(86400L) * 1000000000L

    val first = Views.computeDailyIfMissing(spark, tables("blocks"), v,
      aggregatedSupply = None, states, Fixtures.foundationLocked, requestTs)
    assert(first.isDefined)
    val row = first.get.collect()(0)
    assert(row.getAs[String]("computed_at_block_hash") == "B102a")

    // Second run with the computed row present → skipped.
    val second = Views.computeDailyIfMissing(spark, tables("blocks"), v,
      aggregatedSupply = Some(first.get), states,
      Fixtures.foundationLocked, requestTs)
    assert(second.isEmpty)

    // Day boundary before genesis → no block → None.
    val tooEarly = Views.computeDailyIfMissing(spark, tables("blocks"), v,
      None, states, Fixtures.foundationLocked, BigInt("1000000000000000000"))
    assert(tooEarly.isEmpty)
  }
}
