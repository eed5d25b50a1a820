package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

object Bench {
  // Streaming entries open one state-store instance PER STORE PER
  // SHUFFLE PARTITION at query start — at 32 partitions q72's 4
  // stores mean 128 RocksDB opens of pure fixed setup that measures
  // the harness, not the operator (r14 verdict #6). State volume at
  // sf0.1 is tiny, so bench those entries at 8 partitions: identical
  // plan shape and results (every entry is oracle-gated at cpus=4 in
  // Verify), 4× less fixed store setup. Restore the session default
  // afterwards so batch entries are untouched. Shared with QBench so
  // an isolated re-measure of a streaming entry prices the same
  // partition policy as the sweep (r18: QBench previously ran
  // streaming entries at 32 partitions, inflating them ~2-3× vs the
  // Bench isolated loop and making bisection numbers incomparable).
  private[graft] val isStreaming = (n: String) => n.contains("stream")
  private[graft] def withBenchConf[T](s: SparkSession, n: String)(f: => T): T =
    if (!isStreaming(n)) f
    else {
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try f finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }

  /** The default isolated re-run list (fresh session per entry) —
    * object-level so the headline-length spec prices the REAL shed
    * set against the full registry.
    */
  private[graft] val DefaultIsolated: Seq[String] = Seq(
    "q02_revenue_by_nation", "q24_embedding_dups", "q24b_embedding_dups_lsh",
    "q25_ann_ivf", "q26_multimodal_features", "q27_winnow_fingerprint",
    "q28_dup_clusters", "q29_quantize_int8", "q30_simhash_dups",
    "q31_text_chunks", "q34_dedup_apply", "q35b_stream_dedup_windowed",
    "q36_contamination", "q37b_stream_sessions_append", "q38_ngram_jaccard",
    "q43_image_meta", "q45_source_mix", "q48_stream_near_dup",
    "q51_semantic_dedup", "q53_corpus_recipe", "q55c_pq_recall",
    "q56_bigram_lm",
    "q65b_dedup_agreement_star", "q72_stream_funnel_join",
    "q75_stream_funnel_outer", "q75b_stream_funnel_full",
    "q76_incremental_dedup", "q76b_growing_index_dedup",
    "q76c_compacted_index_dedup", "q77_ann_int8_rerank",
    "q79_substring_dedup", "q79b_substring_dedup_2ph",
    "q79c_substring_scrub", "q25b_ann_ivf_append",
    "q80_stream_corpus_probe", "q81_ann_pq", "q82_ann_ivfpq",
    "q82b_ann_ivfpq_residual", "q83_stream_ann_gate",
    "q95b_corpus_build_incr", "q96_token_budget_select",
    "q97_stream_shard_ledger",
    "near_scale_receipts")

  /** The driver-contract headline line — factored out of main so the
    * length spec can exercise the REAL assembly against the full
    * registry (the r17 regression class: the line silently outgrew
    * the driver's 2000-char tail window and BENCH_r17.json came back
    * parsed:null). r19 made the shed DURABLE instead of incremental:
    * the full per-query sweep lives in the [[detailJson]] sidecar
    * file (every value, full names, 3-decimal precision) and the
    * headline carries only what the driver contract and the
    * round-over-round adjudication need — q01–q10 + the near total
    * in `queries`, the isolated pins (the trustworthy fresh-session
    * signal), ingest rates, and the calibration pair. At the full
    * registry width this is <1 kB with no trimming, so entry growth
    * can never blind the driver's bench gate again (the r18
    * trim-to-fit backstop had ~20 entries of headroom left).
    */
  private[graft] def headlineJson(sweep: Seq[(String, Double)],
      nearTablesTotal: Double, isolated: Seq[(String, Double)],
      total: Double, ingestFields: Seq[(String, Double)],
      calib: Option[(Double, Double)], sfDir: String,
      cpus: Int = 0): String = {
    def fmt2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def fmt3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jmap2(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + fmt2(v) }
        .mkString("{", ",", "}")
    def shortKey(n: String): String = n.takeWhile(_ != '_')
    val alwaysKeep = (1 to 10).map(i => f"q$i%02d").toSet
    val qShort = sweep.map { case (k, v) => shortKey(k) -> v }
      .filter { case (k, _) => alwaysKeep.contains(k) }
    val iso = jmap2(isolated.map { case (k, v) => shortKey(k) -> v })
    val ing = ingestFields
      .map { case (k, v) => s""","$k":${fmt2(v)}""" }.mkString
    val cal = calib.map { case (p, q) =>
      s""","calib":{"pre":${fmt3(p)},"post":${fmt3(q)}}""" }.getOrElse("")
    val cpu = if (cpus > 0) s""","cpus":$cpus""" else ""
    // SCALING-LEGIBILITY entry (r20 verdict #2): at sf0.1 every
    // headline query sits at a fixed-overhead floor, so the driver's
    // 8-core-vs-32-core ratio table reads ≈1 everywhere and its
    // "cpus ignored?" heuristic cannot distinguish a serial engine
    // from an overhead floor. The calibration probe is a CPU-bound
    // aggregate at `parallelism = cpus` — its seconds DO scale with
    // the core count (measured 1.04 s @ 8c vs 0.48 s @ 32c on this
    // box) — so shipping it as a queries entry gives the ratio table
    // one entry that moves with cores. Additive only: no existing key
    // is renamed or dropped.
    val qs = jmap2(qShort ++
      calib.map(c => "scaling_probe" -> c._1).toSeq :+
      ("near_tables_total" -> nearTablesTotal))
    s"""{"metric":"total","value":${fmt2(total)},"unit":"sec","queries":$qs,"isolated":$iso$ing$cal$cpu,"detail_file":"$DetailFile","sf":"$sfDir"}"""
  }

  /** Sidecar file carrying EVERYTHING the headline sheds. */
  private[graft] val DetailFile = "BENCH_detail.json"

  /** The ambient-drift calibration probe: a fixed-cost,
    * input-independent, CPU-bound query (codegen'd hash-mix aggregate
    * over a constant range). Shared by the parent's pre/post pair AND
    * every forked QBench child (per-child calib, r19 verdict #1), so
    * all three readings are the same measurement. MIN of three timed
    * runs after one untimed warmup — the probe measures the BOX, not
    * scheduler jitter (a single sample carried ~1.7× spread).
    */
  private[graft] def calibProbe(s: SparkSession, parallelism: Int): Double = {
    def run(): Unit = s.range(0, 1024L << 20, 1, parallelism)
      .selectExpr("sum(hash(id, id * 31 + 7)) AS h")
      .write.mode("overwrite").format("noop").save()
    run() // untimed: JIT + codegen cache
    (1 to 3).map { _ =>
      val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
    }.min
  }

  /** Ambient-degradation threshold for a forked child's calib against
    * the parent's pre-sweep calib: above this ratio the child is
    * re-forked once and the lower-calib attempt wins (the r19 isolated
    * tail ran at calib ratio ~1.59 with no in-artifact trace).
    */
  private[graft] val CalibReforkRatio = 1.3

  /** The sidecar payload: full-name sweep + isolated + near micro
    * groups + ingest + calib, all at 3-decimal precision — the
    * durable home for per-query numbers now that the headline ships
    * only the contract keys. One JSON object, written to
    * [[DetailFile]] in the working directory (the repo root under
    * the driver's sbt invocation, so it lands in the round commit).
    */
  private[graft] def detailJson(sweep: Seq[(String, Double)],
      nearMicro: Seq[(String, Double)], isolated: Seq[(String, Double)],
      total: Double, ingestFields: Seq[(String, Double)],
      calib: Option[(Double, Double)], sfDir: String,
      isolatedCalib: Seq[(String, Double)] = Nil,
      isolatedReforked: Seq[String] = Nil,
      streamFloor: Seq[(String, (Double, Double))] = Nil): String = {
    def fmt3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + fmt3(v) }
        .mkString("{", ",", "}")
    val cal = calib.map { case (p, q) =>
      s""","calib":{"pre":${fmt3(p)},"post":${fmt3(q)}}""" }.getOrElse("")
    // Per-entry ambient calib for the forked isolated loop (empty in
    // in-process fallback mode) + which entries needed a re-fork: the
    // in-artifact normalization the r19 adjudication lacked.
    val isoCal =
      if (isolatedCalib.isEmpty) ""
      else s""","isolated_calib":${jmap(isolatedCalib)}"""
    // CALIB-NORMALIZED isolated seconds (r20 verdict #8): raw seconds
    // divided by the child's ambient ratio (child calib / parent
    // pre-sweep calib), so cross-round isolated tables can be read
    // without hand-normalizing. Raw stays authoritative; this is the
    // derived view, shipped next to it.
    val isoNorm = {
      val pre = calib.map(_._1).getOrElse(0.0)
      val cmap = isolatedCalib.toMap
      val norm = isolated.flatMap { case (n, t) =>
        cmap.get(n).filter(c => c > 0 && pre > 0)
          .map(c => n -> t * pre / c)
      }
      if (norm.isEmpty) "" else s""","isolated_norm":${jmap(norm)}"""
    }
    // Children whose calib sat >1.3× BELOW the parent's pre-sweep
    // calib ran in a suspiciously FAST window (the symmetric twin of
    // the re-fork trigger). They are flagged, not re-forked — a
    // retried fast window would bias shipped numbers slower; the flag
    // plus isolated_norm is the legible record.
    val isoFast = {
      val pre = calib.map(_._1).getOrElse(0.0)
      val fast = isolatedCalib.collect {
        case (n, c) if pre > 0 && c > 0 && c * CalibReforkRatio < pre => n
      }
      if (fast.isEmpty) ""
      else fast.map("\"" + _ + "\"")
        .mkString(""","isolated_fastwin":[""", ",", "]")
    }
    val isoRef =
      if (isolatedReforked.isEmpty) ""
      else isolatedReforked.map("\"" + _ + "\"")
        .mkString(""","isolated_reforked":[""", ",", "]")
    // Jobs-vs-wall split for the streaming entries (r20 verdict #6):
    // `jobs` is the summed duration of the entry's Spark jobs, `wall`
    // its sweep wall-clock — the gap is streaming bring-up/teardown
    // (state-store provider opens, checkpoint dirs), i.e. the
    // deployment floor the bench deliberately prices. In-artifact so
    // the floor is machine-readable instead of re-adjudicated each
    // round.
    val floor =
      if (streamFloor.isEmpty) ""
      else streamFloor.map { case (n, (j, w)) =>
        s""""$n":{"jobs":${fmt3(j)},"wall":${fmt3(w)}}""" }
        .mkString(""","stream_floor":{""", ",", "}")
    s"""{"total":${fmt3(total)},"sweep":${jmap(sweep)},"isolated":${
      jmap(isolated)}$isoCal$isoNorm$isoFast$isoRef$floor,"near_micro":${
      jmap(nearMicro)},"ingest":${jmap(ingestFields)}$cal,"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // The bench runs every streaming entry under the PRODUCTION state
    // store backend (RocksDB) by default, so the per-round numbers are
    // the deployable ones and the state-size metrics printed below pin
    // the "bounded state" claims with a number per round. Override
    // with SPARK_GRAFT_STATE_STORE=default for the in-memory provider.
    val stateProviderClass =
      if (sys.env.getOrElse("SPARK_GRAFT_STATE_STORE", "rocksdb") == "rocksdb")
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      else
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", stateProviderClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Running sum of Spark-job durations (ms), fed by a listener: the
    // jobs-vs-wall split for streaming entries (stream_floor). Job
    // start times are held until the matching end so only completed
    // jobs count; the bus is drained (ListenerSync) before each
    // read so the counter is consistent, not sleep-raced.
    val jobMsTotal = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobStarts = scala.collection.concurrent.TrieMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStarts(e.jobId) = e.time
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobStarts.remove(e.jobId)
            .foreach(t0 => jobMsTotal.addAndGet(e.time - t0))
      })
    def jobMsSnapshot(): Long = {
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      jobMsTotal.get()
    }
    // Per-job state-store totals, keyed by the drain()-assigned query
    // prefix (the uuid suffix contains no '_'). Last progress wins —
    // with Trigger.AvailableNow that is the final state size.
    val stateMetrics =
      scala.collection.concurrent.TrieMap[String, (Long, Long)]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val p = e.progress
          if (p.stateOperators.nonEmpty && p.name != null) {
            val cut = p.name.lastIndexOf('_')
            val key = if (cut < 0) p.name else p.name.substring(0, cut + 1)
            stateMetrics(key) = (p.stateOperators.map(_.numRowsTotal).sum,
              p.stateOperators.map(_.memoryUsedBytes).sum)
          }
        }
      })

    // noop write forces full materialization of every output column —
    // count() would let Catalyst prune the computed projections and
    // under-report (e.g. minhash columns never evaluated).
    def exec(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // The q* entries leave localCheckpoint blocks behind (released only
    // on GC); across an 80-query sweep the residue measurably slows
    // later queries. Unpersist exactly the blocks a query created —
    // the near section's shared ETL caches (snapshot `before`) stay.
    def execReleasing(df: DataFrame): Unit = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      exec(df)
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before.contains(id)) rdd.unpersist(false)
      }
    }

    // Ingest-only mode: skip the query sweep + isolated re-runs and
    // measure just the block-ingest points — for investigating ingest
    // scaling (e.g. fixed-overhead amortization across batch sizes)
    // without paying the ~8-minute full sweep.
    val ingestOnly = sys.env.contains("SPARK_GRAFT_INGEST_ONLY")
    val names =
      if (ingestOnly) Seq.empty[String] else SparkEntry.queries.keys.toSeq.sorted
    val isNear = (n: String) => n.startsWith("near_")
    import Bench.withBenchConf
    // Warmup pass: JVM/JIT + parquet footer caches; excluded from timing.
    names.foreach { n =>
      try withBenchConf(spark, n) {
        if (isNear(n)) exec(SparkEntry.queries(n)(spark, sfDir))
        else execReleasing(SparkEntry.queries(n)(spark, sfDir))
      } catch { case _: Throwable => () }
    }
    val lastNear = names.filter(isNear) match {
      case Seq() => None
      case ns    => Some(ns.max)
    }
    // Ambient-drift CALIBRATION PROBE: a fixed-cost, input-independent,
    // CPU-bound query — a codegen'd hash-mix aggregate over a constant
    // range — timed FIRST (pre: in the sweep session, right after
    // warmup) and LAST (post: in its own fresh session after the
    // isolated loop). Its plan and data never change round-over-round,
    // so calib_rN / calib_rM estimates the box's ambient speed ratio
    // between rounds; per-query comparisons should divide by that
    // ratio before reading anything as a regression (r16 carried a
    // uniform ~15% environment drift that was indistinguishable from
    // plan changes without this). README § Bench documents the
    // normalization.
    def calibOn(s: SparkSession): Double = Bench.calibProbe(s, cpus.toInt)
    // A swallowed per-entry failure must be LOUD in the log, not a
    // silent near-zero time (the r19 preview shipped eight 0.00s
    // isolated values with no trace of why — stale classes from a
    // mid-run recompile; the number looked like a measurement).
    def failLine(loop: String, n: String, e: Throwable): Unit = {
      val msg = String.valueOf(e).take(300)
        .replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\x00-\\x1f]", " ")
      println(s"""{"detail":"${loop}_failure","query":"$n","error":"$msg"}""")
    }
    val calibPre = if (ingestOnly) 0.0 else calibOn(spark)
    // (entry, (summed job seconds, wall seconds)) for streaming
    // entries — the machine-readable bring-up/teardown floor record.
    val streamFloor =
      scala.collection.mutable.ArrayBuffer.empty[(String, (Double, Double))]
    val results = names.map { n =>
      val streaming = Bench.isStreaming(n)
      val jobsPre = if (streaming) jobMsSnapshot() else 0L
      val t0 = System.nanoTime()
      try withBenchConf(spark, n) {
        if (isNear(n)) exec(SparkEntry.queries(n)(spark, sfDir))
        else execReleasing(SparkEntry.queries(n)(spark, sfDir))
      } catch { case e: Throwable => failLine("sweep", n, e) }
      val dt = (System.nanoTime() - t0) / 1e9
      if (streaming) // both snapshots are outside the timed window
        streamFloor += n -> (((jobMsSnapshot() - jobsPre) / 1e3, dt))
      // Once the timed near section is done its ~34 cached ETL tables
      // are dead weight for every later query — drop them (outside the
      // timed window; the cost lands on no entry).
      if (lastNear.contains(n)) {
        graft.queries.NearQueries.releaseCaches(spark)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        spark.catalog.clearCache()
      }
      n -> dt
    }
    // q48b TTL eviction, PRICED: the sweep's q48b drains the one-file
    // fixture in a single microbatch, where no event-time timeout can
    // fire — its state row count equals ALL distinct signatures and
    // says nothing about the TTL bound. Re-drive the same operator
    // (production ttl = 1 h) through a staged multi-batch source: two
    // corpus halves, then two far-future ticks whose watermark jump
    // fires every stale timeout. The final "neardupb_" state size in
    // the state_store line is therefore POST-eviction, and the
    // pre/post pair prints on its own detail line.
    val q48bTtl: Option[(Long, Long)] = if (ingestOnly) None else try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text").as[(Long, String)].collect()
      val maxId = docs.map(_._1).max
      val ms = MemoryStream[(Long, String)]
      val dups = graft.streaming.StreamingJobs.nearDupBoundedStream(
        spark, ms.toDF().toDF("doc_id", "text"), ttlMs = 3600L * 1000L)
      val name = "neardupb_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = dups.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      def stateRows: Long = q.recentProgress
        .filter(_.stateOperators.nonEmpty).lastOption
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      try {
        val (h1, h2) = docs.partition(_._1 < maxId / 2)
        ms.addData(h1.toIndexedSeq); q.processAllAvailable()
        ms.addData(h2.toIndexedSeq); q.processAllAvailable()
        val pre = stateRows // every distinct signature is live
        // tick 1 advances the watermark 9 h past the corpus; tick 2's
        // batch then starts under that watermark and fires the
        // timeouts (EventTimeTimeout evictions always land one batch
        // after the watermark move).
        ms.addData(Seq((maxId + 36000L, "tick tock tick")))
        q.processAllAvailable()
        ms.addData(Seq((maxId + 36001L, "tock tick tock")))
        q.processAllAvailable()
        val post = stateRows // ticks only — the corpus horizon expired
        Some((pre, post))
      } finally {
        q.stop(); spark.catalog.dropTempView(name)
        org.apache.spark.sql.graft.StateStoreHygiene.unloadAll()
      }
    } catch { case _: Throwable => None }

    // q63b TTL eviction, PRICED the same way: the sweep's q63b drains
    // the 96-image fixture in one microbatch (no timeout can fire), so
    // re-drive the image fold through two fixture halves + two
    // far-future ticks. The final "imgdedupb_" state size in the
    // state_store line is therefore POST-eviction (this drive runs
    // after the sweep; last progress wins), and the pre/post pair
    // prints on its own detail line.
    val q63bTtl: Option[(Long, Long)] = if (ingestOnly) None else try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val n = graft.functions.MediaFixture.nImages
      val imgs = (0 until n)
        .map(i => (i.toLong, graft.functions.MediaFixture.png(i)))
      val ms = MemoryStream[(Long, Array[Byte])]
      val dups = graft.streaming.StreamingJobs.imageDedupBoundedStream(
        spark, ms.toDF().toDF("img_id", "png"), ttlMs = 3600L * 1000L)
      val name = "imgdedupb_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = dups.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      def stateRows: Long = q.recentProgress
        .filter(_.stateOperators.nonEmpty).lastOption
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      try {
        val (h1, h2) = imgs.partition(_._1 < n / 2)
        ms.addData(h1.toIndexedSeq); q.processAllAvailable()
        ms.addData(h2.toIndexedSeq); q.processAllAvailable()
        val pre = stateRows // every distinct fingerprint is live
        ms.addData(Seq((n + 36000L, graft.functions.MediaFixture.png(0))))
        q.processAllAvailable()
        ms.addData(Seq((n + 36001L, graft.functions.MediaFixture.png(1))))
        q.processAllAvailable()
        val post = stateRows // ticks only — the fixture horizon expired
        Some((pre, post))
      } finally {
        q.stop(); spark.catalog.dropTempView(name)
        org.apache.spark.sql.graft.StateStoreHygiene.unloadAll()
      }
    } catch { case _: Throwable => None }

    // NEAR ingest throughput: full block-JSON → 17-table ETL (incl.
    // lineage fixpoint) over a synthetic chain. The reference sustains
    // ~1 block/s (BASELINE.md); this measures our blocks/s at the same
    // per-block shape. Measured at TWO chain lengths so the
    // round-over-round trend exposes any O(history) creep a single
    // point would hide (2× blocks should be ≈2× seconds).
    def ingest(nBlocks: Int): Double = {
      val norm = graft.near.Ingest.blocksFromJson(spark,
        graft.near.Fixtures.syntheticChain(nBlocks)).toDF()
      val t0 = System.nanoTime()
      graft.near.Ingest.allTables(norm.persist()).values.foreach(exec)
      val dt = (System.nanoTime() - t0) / 1e9
      norm.unpersist()
      dt
    }
    val nBlocks = sys.env.getOrElse("SPARK_GRAFT_NEAR_BLOCKS", "512").toInt
    // 0 disables the second point; a value equal to nBlocks would
    // produce a duplicate JSON key, so it is treated as disabled too.
    val nBlocks2 = sys.env.getOrElse("SPARK_GRAFT_NEAR_BLOCKS2", "1024").toInt
    val ingestSec = ingest(nBlocks)
    val run2 = nBlocks2 > 0 && nBlocks2 != nBlocks
    val ingestSec2 = if (run2) ingest(nBlocks2) else 0.0
    val allResults = results :+
      (s"near_ingest_${nBlocks}_blocks" -> ingestSec) :++
      (if (run2) Seq(s"near_ingest_${nBlocks2}_blocks" -> ingestSec2)
       else Seq.empty)

    // Isolated re-runs: the shared-session numbers above can drift with
    // scheduling/codegen-cache noise accumulated across 70 queries, so
    // creep-prone entries are re-measured in a FRESH session each (same
    // JVM — JIT stays warm, Spark-session state does not). A query that
    // regressed in the shared run but is stable here moved because of
    // session noise, not a plan change.
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val isolatedNames = (if (ingestOnly) "" else
      sys.env.getOrElse("SPARK_GRAFT_ISOLATED",
        Bench.DefaultIsolated.mkString(",")))
      .split(",").map(_.trim).filter(SparkEntry.queries.contains).toSeq
    // Compute entries run BEFORE the streaming drains: a drained
    // streaming entry leaves JVM-level residue a fresh SparkSession
    // does not clear (drain() already unloads the RocksDB providers,
    // so what remains is heap/code-cache/allocator accumulation), and
    // two rounds in a row a compute entry measured right after the
    // drains regressed 2-3× on unchanged code (q75b r17, q38 r18 —
    // both adjudicated back to fresh-JVM numbers). Stable partition:
    // relative order within each class is unchanged, so cross-round
    // comparisons inside a class stay like-for-like.
    val isolatedOrdered =
      isolatedNames.filterNot(Bench.isStreaming) ++
        isolatedNames.filter(Bench.isStreaming)
    // Isolated entries run in a FORKED JVM each (graft.QBench as the
    // child, warmup + 3 timed reps, min reported): fresh-session-in-
    // shared-JVM measurement carried heap/code-cache accumulation
    // that produced a 2-3× phantom mover THREE rounds running (q75b
    // r17, q38 r18, q76b/q76c in an r19 preview — each adjudicated
    // back to its fresh-JVM number with zero code change). A forked
    // child is the measurement QBench pins already use, so the
    // isolated map and a manual QBench are now the SAME basis.
    // Cross-round note: r19 is the basis change — compare r19+
    // isolated values to QBench pins, not to r18 isolated values.
    // Falls back to in-process (previous behavior) if forking fails,
    // announcing the mode either way.
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val inheritedJvmArgs = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.toSeq.filter(a =>
          a.startsWith("--add-opens") || a.startsWith("--add-exports"))
    }
    // Children get a FIXED, MODEST heap (8g default) rather than the
    // parent's: 40 back-to-back children inheriting a 24g -Xmx
    // inflated several entries 3-8× in the first forked run (page
    // zeroing + reclaim churn between consecutive large heaps; the
    // same commands replayed on an idle box measured normal), and 8g
    // matches the heap every historical QBench pin was taken at.
    val childMem = sys.env.getOrElse("SPARK_GRAFT_CHILD_MEM", "8g")
    def forkChild(childArgs: Seq[String]): Option[String] = try {
      import scala.jdk.CollectionConverters._
      val cmd = (Seq(javaBin) ++ inheritedJvmArgs ++ Seq(s"-Xmx$childMem",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", System.getProperty("java.class.path"),
        "graft.QBench") ++ childArgs).asJava
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      pb.environment().put("SPARK_GRAFT_CPUS", cpus)
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      val rc = p.waitFor()
      if (rc == 0) Some(out) else None
    } catch { case _: Throwable => None }
    // One forked measurement: (min seconds, child ambient calib).
    def forkQBench(n: String): Option[(Double, Double)] =
      forkChild(Seq(n, "3")).flatMap { out =>
        def num(key: String): Option[Double] =
          (s""""$key":([0-9.]+)""").r.findFirstMatchIn(out)
            .map(_.group(1).toDouble)
        num("min").map(m => (m, num("calib").getOrElse(0.0)))
      }
    // Fork viability is probed with a NO-OP child (session bring-up
    // only), not with the first entry: an entry-specific failure must
    // not silently flip every isolated entry to the in-process basis
    // (r19 ADVICE). A failed fork of an individual entry is announced
    // and the entry OMITTED from the isolated maps — never shipped as
    // a 0.0 that downstream comparison could read as a speedup.
    val forkMode = isolatedOrdered.nonEmpty &&
      sys.env.getOrElse("SPARK_GRAFT_ISOLATED_FORK", "1") != "0" &&
      forkChild(Seq("--probe")).exists(_.contains("\"probe\":\"ok\""))
    if (isolatedOrdered.nonEmpty)
      println(s"""{"detail":"isolated_mode","forked_jvm":$forkMode}""")
    val reforked = scala.collection.mutable.ArrayBuffer.empty[String]
    val isolatedMeasured: Seq[(String, (Double, Double))] =
      if (forkMode) isolatedOrdered.flatMap { n =>
        val first = forkQBench(n)
        // Per-child ambient normalization (r19 verdict #1): a child
        // whose calib sits far above the parent's pre-sweep calib ran
        // in a degraded ambient window — re-fork once, keep the
        // attempt taken in the healthier window (lower calib).
        val attempt = first match {
          case Some((_, c1)) if calibPre > 0 &&
              c1 > calibPre * Bench.CalibReforkRatio =>
            forkQBench(n) match {
              case Some(r2) if r2._2 < c1 =>
                reforked += n; Some(r2)
              case Some(_) =>
                // Retry ran but in a worse window — keep the first.
                reforked += n; first
              case None =>
                // A crashed retry must be LOUD and must NOT land in
                // isolated_reforked (that would claim the protocol
                // completed and the better attempt won): the shipped
                // number is the degraded FIRST attempt, and its high
                // calib in isolated_calib is the honest record.
                failLine("isolated_refork", n,
                  new RuntimeException("re-fork produced no result"))
                first
            }
          case other => other
        }
        if (attempt.isEmpty) failLine("isolated", n,
          new RuntimeException("forked QBench produced no result"))
        attempt.map(n -> _)
      }
      else isolatedOrdered.map { n =>
        val s = SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .config("spark.sql.streaming.stateStore.providerClass",
            stateProviderClass)
          .getOrCreate()
        s.sparkContext.setLogLevel("WARN")
        try {
          def execS(): Unit = withBenchConf(s, n) {
            SparkEntry.queries(n)(s, sfDir)
              .write.mode("overwrite").format("noop").save()
          }
          try execS() catch { case _: Throwable => () } // warmup
          val t0 = System.nanoTime()
          try execS() catch { case e: Throwable =>
            failLine("isolated", n, e) }
          n -> ((System.nanoTime() - t0) / 1e9, 0.0)
        } finally {
          s.stop()
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
        }
      }
    val isolated = isolatedMeasured.map { case (n, (t, _)) => n -> t }
    val isolatedCalib: Seq[(String, Double)] =
      if (forkMode) isolatedMeasured.map { case (n, (_, c)) => n -> c }
      else Nil

    // The post-sweep calibration point, in a fresh session like the
    // isolated entries (ambient drift WITHIN the run shows up as
    // pre/post disagreement; drift BETWEEN rounds as calib_rN ratio).
    val calibPost = if (ingestOnly) 0.0 else {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      try calibOn(s) finally {
        s.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }

    // Output layout: the driver snapshots the LAST 2000 chars of this
    // process's output and JSON-parses the headline out of that
    // window. parsed:null in rounds 1-11 even when the full headline
    // line WAS inside the window (r11) — root cause is sbt's
    // LoggedOutput "[info] " prefix on every forked-run line (fixed in
    // build.sbt via run/outputStrategy := StdoutOutput). Belt and
    // braces, the FINAL line is also kept tiny (~400 chars: total +
    // isolated map + ingest rates only) so it survives any tail-window
    // clipping; the per-query sweeps (full-name and short-key) and the
    // ~62 per-table near_* micro-times print on separate detail lines
    // just before it (no "metric" key — the driver greps for that).
    // ms precision — sub-ms digits are noise.
    // Locale.ROOT: a comma-decimal default locale would otherwise
    // print 0,123 and corrupt the driver-parsed JSON.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
    val (nearMicro, headline) = allResults.partition { case (k, _) =>
      isNear(k) && !k.startsWith("near_ingest") }
    Seq("hand" -> nearMicro.filterNot(_._1.startsWith("near_scale")),
      "scale" -> nearMicro.filter(k => k._1.startsWith("near_scale") &&
        !k._1.contains("_streamed_")),
      "streamed" -> nearMicro.filter(k => k._1.startsWith("near_scale") &&
        k._1.contains("_streamed_")))
      .foreach { case (g, kvs) =>
        if (kvs.nonEmpty)
          println(s"""{"near_detail":"$g","queries":${jmap(kvs)}}""")
      }
    // Full-name sweep for human readers / logs (clipped from the
    // driver's tail window, load-bearing numbers all re-appear below).
    println(s"""{"detail":"sweep","queries":${jmap(headline)}}""")
    // Leak gauge: after the fresh-session-per-entry isolated loop every
    // session but (at most) the last is stopped, so the session-keyed
    // fixture/ETL caches must have swept down to ≤1 live entry each —
    // >1 here means stopped sessions are being retained again.
    println(s"""{"detail":"session_caches","multimodal":${
      graft.functions.Multimodal.fixtureCacheSize},"near_etl":${
      graft.queries.NearQueries.etlCacheSize}}""")
    // Final state-store totals per streaming job (prefix → rows/bytes)
    // under the provider above — the per-round "bounded state" number.
    if (stateMetrics.nonEmpty) {
      val ops = stateMetrics.toSeq.sortBy(_._1).map { case (k, (rows, bytes)) =>
        s""""$k":{"rows":$rows,"bytes":$bytes}""" }.mkString(",")
      val prov = stateProviderClass.split('.').last
      println(s"""{"detail":"state_store","provider":"$prov","ops":{$ops}}""")
    }
    q48bTtl.foreach { case (pre, post) =>
      println(s"""{"detail":"q48b_ttl_eviction","pre_rows":$pre,"post_rows":$post}""")
    }
    q63bTtl.foreach { case (pre, post) =>
      println(s"""{"detail":"q63b_ttl_eviction","pre_rows":$pre,"post_rows":$post}""")
    }
    // The driver contract is ONE JSON line with metric/value/unit/
    // queries/sf, JSON-parsed out of the LAST 2000 chars of process
    // output — see Bench.headlineJson for the assembly and its sheds
    // (the r17 regression: the line silently outgrew the window). The
    // length spec (BenchSpec) prices the assembly against the full
    // registry at worst-case widths, so entry growth fails a test
    // instead of silently blinding the driver's bench gate.
    val total = allResults.map(_._2).sum
    val ingestFields =
      Seq("ingest_blocks_per_sec" -> nBlocks / ingestSec) ++
        (if (run2)
          Seq(s"ingest_${nBlocks2}_blocks_per_sec" -> nBlocks2 / ingestSec2)
        else Seq.empty)
    // Durable per-query numbers: the sidecar file carries the full
    // sweep/isolated/near/ingest maps the slim headline sheds (also
    // still printed above as detail lines for the driver log).
    // Ingest-only adjudication runs skip it: they carry no sweep, and
    // overwriting would destroy the durable full-run record.
    // Per-entry child calib on its own detail line (also in the
    // sidecar): the in-artifact ambient record the r19 adjudication
    // lacked — read an isolated value only next to its calib.
    if (isolatedCalib.nonEmpty)
      println(s"""{"detail":"isolated_calib","pre":${fmt(calibPre)},"children":${
        jmap(isolatedCalib)},"reforked":${
        reforked.map("\"" + _ + "\"").mkString("[", ",", "]")}}""")
    // Jobs-vs-wall for every streaming entry, on its own detail line
    // (also in the sidecar): wall − jobs ≈ streaming bring-up/teardown
    // under the production RocksDB provider — the floor the funnels'
    // cross-round drift keeps getting re-adjudicated against.
    if (streamFloor.nonEmpty) {
      val ops = streamFloor.map { case (n, (j, w)) =>
        s""""$n":{"jobs":${fmt(j)},"wall":${fmt(w)}}""" }.mkString(",")
      println(s"""{"detail":"stream_floor","queries":{$ops}}""")
    }
    if (!ingestOnly) {
      val detail = Bench.detailJson(headline, nearMicro, isolated, total,
        ingestFields, Some((calibPre, calibPost)), sfDir,
        isolatedCalib, reforked.toSeq, streamFloor.toSeq)
      try {
        val w = new java.io.PrintWriter(Bench.DetailFile, "UTF-8")
        try w.println(detail) finally w.close()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not write ${Bench.DetailFile}: $e")
      }
    }
    val line = Bench.headlineJson(headline, nearMicro.map(_._2).sum,
      isolated, total, ingestFields,
      if (ingestOnly) None else Some((calibPre, calibPost)), sfDir,
      cpus.toInt)
    if (line.length > 1600) // keep headroom inside the 2000-char window
      System.err.println(s"[bench] headline ${line.length} chars — " +
        "approaching the driver's 2000-char tail window")
    println(line)
  }
}
