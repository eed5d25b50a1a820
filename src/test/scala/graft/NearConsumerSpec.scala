package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.near.{ConsumerQueries => CQ, Fixtures, Ingest}

/** Golden tests for the consumer analytics surface (SURVEY §3.3) —
  * the query shapes the reference's indexes serve, over the fixture
  * chain's tables.
  */
class NearConsumerSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val tables: Map[String, DataFrame] =
    Ingest.allTables(Ingest.blocksFromJson(spark, Fixtures.chain).toDF())
      .map { case (k, v) => k -> v.cache() }

  test("point lookup: transaction by hash") {
    val rows = CQ.transactionByHash(tables("transactions"), "T1").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("signer_account_id") == "alice.near")
  }

  test("account activity: signer scan with keyset pagination") {
    val all = CQ.transactionsBySigner(tables("transactions"), "alice.near")
      .collect().map(_.getAs[String]("transaction_hash"))
    assert(all.toSeq == Seq("T1", "T2", "T3", "T5")) // (ts, index) order
    // Composite cursor: after (ts0, index 0) = after T1 — T2 shares
    // ts0 but has a higher index, so it MUST appear on page 2.
    val page2 = CQ.transactionsBySigner(tables("transactions"), "alice.near",
      after = Some((BigDecimal("1700000000000000000"), 0)))
      .collect().map(_.getAs[String]("transaction_hash"))
    assert(page2.toSeq == Seq("T2", "T3", "T5"))
    val limited = CQ.transactionsBySigner(tables("transactions"),
      "alice.near", limit = 2).collect()
    assert(limited.length == 2)
  }

  test("account activity: receipts by receiver in canonical order") {
    val got = CQ.receiptsByReceiver(tables("receipts"), "bob.near")
      .collect().map(_.getAs[String]("receipt_id"))
    assert(got.toSeq == Seq("R1", "R5", "R12")) // ts then index_in_chunk
  }

  test("JSON predicate: function calls by method name and args receiver") {
    val calls = CQ.functionCallsByMethod(tables("action_receipt_actions"),
      "do_it").collect()
    // R3 + R12's delegate-inner call; orphan R6 (also a do_it call)
    // has NO satellite rows — the reference skips satellites for
    // skipped receipts.
    assert(calls.map(_.getAs[String]("receipt_id")).toSet == Set("R3", "R12"))
    // nested args_json predicate (args->'args_json'->>'receiver_id')
    assert(CQ.functionCallsByMethod(tables("action_receipt_actions"),
      "do_it", argsReceiverId = Some("app.near")).count() == 2)
    assert(CQ.functionCallsByMethod(tables("action_receipt_actions"),
      "do_it", argsReceiverId = Some("other.near")).count() == 0)
    assert(CQ.functionCallsByMethod(tables("action_receipt_actions"),
      "nope").count() == 0)
  }

  test("token history: FT by contract+owner, NFT by contract+token") {
    val mints = CQ.ftHistory(tables("assets__fungible_token_events"),
      "carol.near", "bob.near").collect()
    assert(mints.length == 1 && mints(0).getAs[String]("event_kind") == "MINT")
    val transfers = CQ.ftHistory(tables("assets__fungible_token_events"),
      Fixtures.ImplicitId, "bob.near").collect()
    assert(transfers.length == 1 &&
      transfers(0).getAs[String]("event_kind") == "TRANSFER")
    val tk1 = CQ.nftTokenHistory(tables("assets__non_fungible_token_events"),
      "carol.near", "tk1").collect()
    assert(tk1.length == 1 &&
      tk1(0).getAs[String]("token_new_owner_account_id") == "carol.near")
  }

  test("account balance history in (timestamp, index) order") {
    val h = CQ.accountBalanceHistory(tables("account_changes"), "alice.near")
      .collect()
    assert(h.length == 1)
    assert(h(0).getAs[java.math.BigDecimal](
      "affected_account_nonstaked_balance").intValue == 90)
    assert(h(0).getAs[String]("caused_by_transaction_hash") == "T1")
  }

  test("batch file-directory ingest matches in-memory parse (S1 batch)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_batch_in")
    Fixtures.chain.zipWithIndex.foreach { case (json, i) =>
      java.nio.file.Files.write(dir.resolve(s"b$i.json"),
        json.getBytes("UTF-8"))
    }
    val fromFiles = Ingest.allTables(
      graft.near.Ingest.blocks(spark, dir.toString).toDF())
    assert(fromFiles("blocks").count() == tables("blocks").count())
    assert(fromFiles("receipts").collect()
      .map(_.getAs[String]("receipt_id")).toSet ==
      tables("receipts").collect().map(_.getAs[String]("receipt_id")).toSet)
  }

  test("access-keys delta compaction keeps latest permission") {
    import SparkTestSession.spark.implicits._
    val deltas = Seq(
      ("pk1", "a.near", Some("R1"), None: Option[String], "FULL_ACCESS", 100L),
      ("pk1", "a.near", Some("R9"), None: Option[String], "FUNCTION_CALL", 102L),
      ("pk2", "a.near", None: Option[String], Some("R7"), "FULL_ACCESS", 101L))
      .toDF("public_key", "account_id", "created_by_receipt_id",
        "deleted_by_receipt_id", "permission_kind", "last_update_block_height")
    val cur = graft.near.Warehouse.accessKeysCurrent(deltas).collect()
      .map(r => r.getAs[String]("public_key") -> r).toMap
    assert(cur("pk1").getAs[String]("permission_kind") == "FUNCTION_CALL")
    assert(cur("pk1").getAs[Long]("last_update_block_height") == 102L)
    assert(cur("pk1").getAs[String]("created_by_receipt_id") == "R9")
    assert(cur("pk2").getAs[String]("deleted_by_receipt_id") == "R7")
    // pk2's only delta is the DELETE-only placeholder: stays FULL_ACCESS
    assert(cur("pk2").getAs[String]("permission_kind") == "FULL_ACCESS")
  }

  test("DELETE-only later delta must not shadow the last UPDATE's perm") {
    // Regression pin (found by the widened r9 streamed volume gate): a
    // microbatch that saw only the key's DELETE writes the FULL_ACCESS
    // placeholder; compaction must keep FUNCTION_CALL from the earlier
    // batch's last UPDATE (access_keys.rs:55-64 applies the placeholder
    // only when no update ever preceded the delete).
    import SparkTestSession.spark.implicits._
    val deltas = Seq(
      ("pk1", "a.near", Some("R1"), None: Option[String], "FUNCTION_CALL", 100L),
      ("pk1", "a.near", None: Option[String], Some("R2"), "FULL_ACCESS", 105L))
      .toDF("public_key", "account_id", "created_by_receipt_id",
        "deleted_by_receipt_id", "permission_kind", "last_update_block_height")
    val cur = graft.near.Warehouse.accessKeysCurrent(deltas).collect()
    assert(cur.length == 1)
    assert(cur(0).getAs[String]("permission_kind") == "FUNCTION_CALL")
    assert(cur(0).getAs[String]("deleted_by_receipt_id") == "R2")
    assert(cur(0).getAs[Long]("last_update_block_height") == 105L)
  }

  test("transaction receipt tree joins execution status") {
    val tree = CQ.transactionReceiptTree(tables("receipts"),
      tables("execution_outcomes"), "T1").collect()
      .map(r => r.getAs[String]("receipt_id") -> r.getAs[String]("status")).toMap
    assert(tree.keySet == Set("R1", "R3", "R5"))
    assert(tree("R1") == "SUCCESS_VALUE")
    assert(tree("R5") == null) // data receipt: no outcome row
  }

  test("daily gas and active-account aggregates conserve totals") {
    import org.apache.spark.sql.functions._
    val gas = CQ.dailyGasStats(tables("execution_outcomes")).collect()
    assert(gas.map(_.getAs[Long]("n_outcomes")).sum ==
      tables("execution_outcomes").count())
    val totalGas = tables("execution_outcomes")
      .agg(sum(col("gas_burnt"))).collect()(0).getDecimal(0)
    assert(gas.map(_.getAs[java.math.BigDecimal]("gas_burnt_total"))
      .map(BigDecimal(_)).sum == BigDecimal(totalGas))
    gas.foreach { r =>
      val d = r.getAs[java.math.BigDecimal]("day_ns")
      assert(BigDecimal(d) % BigDecimal(86400000000000L) == 0)
    }
    val act = CQ.dailyActiveAccounts(tables("transactions")).collect()
    assert(act.map(_.getAs[Long]("n_txs")).sum == tables("transactions").count())
    act.foreach(r => assert(r.getAs[Long]("n_signers") <= r.getAs[Long]("n_txs")))
  }
}
