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

  test("random chains: lineage equals the generator's ground truth") {
    Seq(11L, 42L, 1337L).foreach { seed =>
      val (chain, truth, nTx, nEdges) = RandomChains.chain(seed)
      val t = Ingest.allTables(Ingest.blocksFromJson(spark, chain).toDF())
      val got = t("receipts").collect()
        .map(r => r.getAs[String]("receipt_id") ->
          r.getAs[String]("originated_from_transaction_hash")).toMap
      assert(got == truth, s"seed=$seed lineage mismatch: " +
        s"missing=${truth.keySet -- got.keySet} extra=${got.keySet -- truth.keySet} " +
        s"wrong=${truth.collect { case (k, v) if got.get(k).exists(_ != v) => k }}")
      assert(t("transactions").count() == nTx, s"seed=$seed tx count")
      assert(t("execution_outcome_receipts").count() == nEdges, s"seed=$seed edges")
      // receipts PK + ordinal density per chunk
      val ords = t("receipts").collect()
        .groupBy(_.getAs[String]("included_in_chunk_hash"))
      ords.values.foreach { rs =>
        assert(rs.map(_.getAs[Int]("index_in_chunk")).sorted
          .sameElements(rs.indices), s"seed=$seed ordinals not dense")
      }
    }
  }
}

/** Seeded random chain with ground-truth lineage: txs convert to
  * receipts 1–2 blocks later; each arriving receipt's outcome
  * produces 0–2 child receipts, again 1–2 blocks later, branching
  * into random DAGs. The generator records the tx every receipt must
  * resolve to, so invariants are exact equality, not just "resolved".
  * Tail receipts scheduled past the last block never arrive (their
  * eor edges still must). Returns (blocks, receipt→tx ground truth,
  * n transactions, n produced edges).
  */
object RandomChains {
  def chain(seed: Long): (Seq[String], Map[String, String], Int, Int) = {
    val rnd = new scala.util.Random(seed)
    val nBlocks = 6 + rnd.nextInt(10)
    val scheduled = scala.collection.mutable.Map[Int, Vector[(String, String)]]()
      .withDefaultValue(Vector.empty)
    val lineage = scala.collection.mutable.Map[String, String]()
    var rc = 0
    var nTxTotal = 0
    var nEdges = 0
    def schedule(from: Int, tx: String): String = {
      val rid = s"R$rc"; rc += 1
      val tgt = from + 1 + rnd.nextInt(2)
      if (tgt < nBlocks) {
        scheduled(tgt) = scheduled(tgt) :+ (rid, tx)
        lineage(rid) = tx
      }
      rid
    }
    val F = Fixtures
    val blocks = (0 until nBlocks).map { i =>
      val nTx = rnd.nextInt(4)
      nTxTotal += nTx
      val txs = (0 until nTx).map { j =>
        val h = s"TX${i}_$j"
        F.tx(h, s"user$j.near", "app.near", F.transfer, F.svOk,
          schedule(i, h))
      }
      val arriving = scheduled(i)
      val receipts = arriving.map { case (rid, _) =>
        F.actionReceipt(rid, "app.near", "bob.near", "app.near", F.transfer)
      }
      val outcomes = arriving.map { case (rid, tx) =>
        val produced = (0 until rnd.nextInt(3)).map(_ => schedule(i, tx))
        nEdges += produced.size
        F.outcome(rid, s"B$i", F.svOk, produced, Seq.empty,
          F.actionReceipt(rid, "app.near", "bob.near", "app.near", F.transfer))
      }
      F.block(i, s"B$i", if (i == 0) "G" else s"B${i - 1}",
        (1700000000000000000L + i * 1000000000L).toString,
        Seq(F.shard(0, Some(F.chunk(s"C$i", 0, txs, receipts)), outcomes, Seq.empty)))
    }
    (blocks, lineage.toMap, nTxTotal, nEdges)
  }
}
