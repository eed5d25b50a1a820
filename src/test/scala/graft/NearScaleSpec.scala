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

  test("ScaleChain is deterministic across invocations") {
    // The volume gate depends on the chain (and thus the parquet the
    // DuckDB oracle reads) being bit-identical on every JVM/run.
    val a = graft.near.ScaleChain.chain()
    val b = graft.near.ScaleChain.chain()
    assert(a == b)
    assert(a.size >= 256) // 256 canonical blocks + forks
  }

  test("ScaleChain ETL invariants at small n") {
    val t = Ingest.allTables(
      Ingest.blocksFromJson(spark, graft.near.ScaleChain.chain(7L, 48)).toDF())
      .map { case (k, v) => k -> v.cache() }
    Seq("blocks" -> Seq("block_hash"), "transactions" -> Seq("transaction_hash"),
      "receipts" -> Seq("receipt_id"),
      "execution_outcomes" -> Seq("receipt_id")).foreach { case (name, pk) =>
      val df = t(name)
      assert(df.count() == df.select(pk.map(
        org.apache.spark.sql.functions.col): _*).distinct().count(),
        s"PK violation in $name")
    }
    // every receipt row resolved (receipts table only keeps resolved)
    assert(t("receipts").filter(org.apache.spark.sql.functions
      .col("originated_from_transaction_hash").isNull).count() == 0)
    // the whale subtree exists and is multi-generation
    val whale = t("receipts").filter(org.apache.spark.sql.functions
      .col("originated_from_transaction_hash") === graft.near.ScaleChain.WhaleTx)
    assert(whale.count() >= 50)
  }

  test("random chains: lineage equals the generator's ground truth") {
    Seq(11L, 42L, 1337L).foreach { seed =>
      val g = RandomChains.chain(seed)
      val t = Ingest.allTables(Ingest.blocksFromJson(spark, g.blocks).toDF())
      val got = t("receipts").collect()
        .map(r => r.getAs[String]("receipt_id") ->
          r.getAs[String]("originated_from_transaction_hash")).toMap
      assert(got == g.lineage, s"seed=$seed lineage mismatch: " +
        s"missing=${g.lineage.keySet -- got.keySet} extra=${got.keySet -- g.lineage.keySet} " +
        s"wrong=${g.lineage.collect { case (k, v) if got.get(k).exists(_ != v) => k }}")
      val gotTx = t("transactions").collect()
        .map(_.getAs[String]("transaction_hash"))
      assert(gotTx.length == gotTx.distinct.length, s"seed=$seed dup tx rows")
      assert(gotTx.toSet == g.txHashes, s"seed=$seed tx hashes: " +
        s"missing=${g.txHashes -- gotTx} extra=${gotTx.toSet -- g.txHashes}")
      assert(t("blocks").count() == g.nBlockRows, s"seed=$seed block rows")
      assert(t("execution_outcome_receipts").count() == g.nEdges, s"seed=$seed edges")
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
  * eor edges still must).
  *
  * Adversarial shapes mixed in with known ground truth:
  *  - issue84 collisions: a later block reuses an earlier tx hash
  *    with a NEW receipt — expected to surface as `hash_issue84_<h>`
  *    and its receipt lineage carries the suffixed hash;
  *  - same-height fork blocks re-delivering the canonical block's txs
  *    (same hash + same receipt) — expected to dedup to nothing but
  *    still contribute a blocks row.
  */
object RandomChains {
  final case class Generated(
      blocks: Seq[String],
      lineage: Map[String, String],
      txHashes: Set[String],
      nBlockRows: Int,
      nEdges: Int,
      lastTsNanos: Long = 0L)

  /** `maxDayGap > 0` spaces consecutive blocks by a random 0..maxDayGap
    * DAYS (default 0 keeps the original 1-second cadence and draws
    * nothing from the RNG, so existing seeds generate byte-identical
    * chains) — the knob the pruned-lookback recovery property uses to
    * make parent rows land outside a small block_date lookback window.
    */
  def chain(seed: Long, maxDayGap: Int = 0): Generated = {
    val rnd = new scala.util.Random(seed)
    val nBlocks = 6 + rnd.nextInt(10)
    val scheduled = scala.collection.mutable.Map[Int, Vector[(String, String)]]()
      .withDefaultValue(Vector.empty)
    val lineage = scala.collection.mutable.Map[String, String]()
    val txHashes = scala.collection.mutable.Set[String]()
    val priorTx = scala.collection.mutable.ArrayBuffer[String]()
    var rc = 0
    var nEdges = 0
    var nBlockRows = 0
    var dayOff = 0L
    var lastTs = 0L
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
    val out = scala.collection.mutable.ArrayBuffer[String]()
    for (i <- 0 until nBlocks) {
      val nTx = rnd.nextInt(4)
      var txs = (0 until nTx).map { j =>
        val h = s"TX${i}_$j"
        txHashes += h; priorTx += h
        F.tx(h, s"user$j.near", "app.near", F.transfer, F.svOk,
          schedule(i, h))
      }.toVector
      // issue84: reuse an EARLIER original hash with a fresh receipt;
      // ground truth expects the suffixed row and suffixed lineage.
      if (i >= 2 && priorTx.nonEmpty && rnd.nextInt(100) < 30) {
        val h = priorTx(rnd.nextInt(priorTx.length))
        val suffixed = s"${h}_issue84_$i"
        txHashes += suffixed
        txs :+= F.tx(h, "mallory.near", "app.near", F.transfer, F.svOk,
          schedule(i, suffixed))
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
      if (maxDayGap > 0) dayOff += rnd.nextInt(maxDayGap + 1)
      val tsNanos = 1700000000000000000L +
        dayOff * 86400L * 1000000000L + i * 1000000000L
      lastTs = tsNanos
      val ts = tsNanos.toString
      val prev = if (i == 0) "G" else s"B${i - 1}"
      out += F.block(i, s"B$i", prev, ts,
        Seq(F.shard(0, Some(F.chunk(s"C$i", 0, txs, receipts)), outcomes, Seq.empty)))
      nBlockRows += 1
      // Same-height fork re-delivering this block's txs (same hash AND
      // same converted receipt ⇒ dropped wholesale, never suffixed).
      if (txs.nonEmpty && rnd.nextInt(100) < 25) {
        out += F.block(i, s"B${i}F", prev, ts,
          Seq(F.shard(0, Some(F.chunk(s"C${i}F", 0, txs, Seq.empty)),
            Seq.empty, Seq.empty)))
        nBlockRows += 1
      }
    }
    Generated(out.toSeq, lineage.toMap, txHashes.toSet, nBlockRows, nEdges,
      lastTs)
  }
}
