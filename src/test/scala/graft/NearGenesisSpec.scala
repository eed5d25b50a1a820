package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.near.{Genesis, Metrics}

/** Genesis seed load (S3) and the metrics surface (S9). */
class NearGenesisSpec extends AnyFunSuite {
  import SparkTestSession._

  private val genesisJson =
    """{
      |  "genesis_height": 9820210,
      |  "records": [
      |    {"Account": {"account_id": "alice.near",
      |                 "account": {"amount": "100", "locked": "0"}}},
      |    {"Account": {"account_id": "bob.near",
      |                 "account": {"amount": "7", "locked": "0"}}},
      |    {"AccessKey": {"account_id": "alice.near",
      |                   "public_key": "ed25519:GK1",
      |                   "access_key": {"nonce": 0, "permission": "FullAccess"}}},
      |    {"AccessKey": {"account_id": "bob.near",
      |                   "public_key": "ed25519:GK2",
      |                   "access_key": {"nonce": 3, "permission":
      |                     {"FunctionCall": {"allowance": "1000",
      |                       "receiver_id": "app.near", "method_names": []}}}}},
      |    {"Contract": {"account_id": "alice.near", "code": "AAAA"}}
      |  ]
      |}""".stripMargin

  test("genesis records seed accounts and access_keys at genesis height") {
    val dir = Files.createTempDirectory("graft_genesis")
    val path = dir.resolve("genesis.json")
    Files.write(path, genesisJson.getBytes("UTF-8"))

    val (accounts, accessKeys) = Genesis.load(spark, path.toString)

    val a = accounts.collect().map(r =>
      r.getAs[String]("account_id") -> r).toMap
    assert(a.keySet == Set("alice.near", "bob.near")) // Contract ignored
    assert(a("alice.near").getAs[Any]("created_by_receipt_id") == null)
    assert(a("alice.near")
      .getAs[java.math.BigDecimal]("last_update_block_height")
      .longValue == 9820210L)

    val k = accessKeys.collect().map(r =>
      (r.getAs[String]("account_id"), r.getAs[String]("public_key")) -> r).toMap
    assert(k.keySet == Set(("alice.near", "ed25519:GK1"),
      ("bob.near", "ed25519:GK2")))
    assert(k(("alice.near", "ed25519:GK1"))
      .getAs[String]("permission_kind") == "FULL_ACCESS")
    assert(k(("bob.near", "ed25519:GK2"))
      .getAs[String]("permission_kind") == "FUNCTION_CALL")
  }

  test("streamed genesis (>memory route) matches the one-shot load") {
    val dir = Files.createTempDirectory("graft_genesis_stream")
    val path = dir.resolve("genesis.json")
    Files.write(path, genesisJson.getBytes("UTF-8"))
    val jsonl = dir.resolve("records.jsonl").toString

    val (accounts, accessKeys) =
      Genesis.loadStreamed(spark, path.toString, jsonl)
    val (a0, k0) = Genesis.load(spark, path.toString)

    // JSONL actually materialized one record per line (splittable).
    val lines = Files.readAllLines(Paths.get(jsonl))
    assert(lines.size == 5) // incl. the ignored Contract record
    assert(lines.get(0).contains("alice.near"))

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(rows(accounts) == rows(a0))
    assert(rows(accessKeys) == rows(k0))
  }

  test("metrics: counters, gauge, and the /metrics endpoint") {
    Metrics.reset()
    Metrics.recordBatch(3, 102)
    Metrics.recordBatch(2, 101) // lower height must not regress the gauge
    assert(Metrics.blockCount.get == 5)
    assert(Metrics.latestBlockHeight.get == 102)

    val server = Metrics.serve(port = 0) // ephemeral port
    try {
      val port = server.getAddress.getPort
      val body = scala.io.Source.fromURL(
        s"http://localhost:$port/metrics").mkString
      assert(body.contains("indexer_explorer_block_count 5"))
      assert(body.contains("indexer_explorer_latest_block_height 102"))
    } finally server.stop(0)
  }
}
