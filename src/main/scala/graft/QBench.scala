package graft
import org.apache.spark.sql.SparkSession

/** One-query micro-bench in a fresh session: `runMain graft.QBench
  * <query> [reps]` — warmup + reps timed executions, min/median
  * printed. The isolated counterpart of [[Bench]]'s shared-session
  * sweep, for distinguishing plan regressions from session noise.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Fork-viability probe (Bench's isolated loop): prove the child
    // JVM + classpath + session bring-up work WITHOUT running any
    // registry entry — so an entry-specific failure of the first
    // isolated query can never flip the whole loop back to the
    // in-process basis (r19 ADVICE: fork mode was decided by whether
    // the first entry's child happened to succeed).
    if (name == "--probe") {
      val s = SparkSession.builder().master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false").getOrCreate()
      try {
        require(s.range(0, 4).count() == 4)
        println("""{"probe":"ok"}""")
      } finally s.stop()
      return
    }
    // Same state-store backend selection as Bench so a QBench
    // re-measure of a streaming entry prices the same provider.
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
    // Same streaming partition policy as Bench's sweep and isolated
    // loop (8 shuffle partitions for streaming entries) — a QBench
    // number must be comparable to the BENCH_r*.json it bisects.
    def exec(): Double = {
      val t0 = System.nanoTime()
      Bench.withBenchConf(spark, name) {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
      (System.nanoTime() - t0) / 1e9
    }
    // Per-child AMBIENT CALIBRATION (r19 verdict #1 — the instrument's
    // last blind spot): the same fixed-cost CPU probe Bench runs
    // pre-sweep and post-isolated, measured INSIDE this child. The
    // normalization point (`calib`) runs BEFORE the entry's reps so it
    // reads the BOX, not the entry: probing after the reps would fold
    // entry-induced JVM state (retained heap, GC pressure, native
    // memory) into the ambient number, and README § Bench's
    // divide-by-calib discipline would then adjudicate a real memory
    // regression away as a degraded window. The post-reps probe is
    // ALSO reported (`calib_post`): the post/pre gap is itself a
    // diagnostic — large gap = the entry left the JVM measurably
    // slower, worth a look regardless of its timing.
    val calib = Bench.calibProbe(spark, cpus.toInt)
    exec() // warmup
    val times = (1 to reps).map(_ => exec()).sorted
    val calibPost = Bench.calibProbe(spark, cpus.toInt)
    // Locale.ROOT: a comma-decimal default locale would corrupt the
    // JSON that Bench's forked-isolation parent parses.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"query":"$name","min":${fmt(times.head)},"median":${fmt(times(times.length / 2))},"reps":$reps,"calib":${fmt(calib)},"calib_post":${fmt(calibPost)}}""")
    spark.stop()
  }
}
