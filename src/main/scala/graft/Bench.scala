package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // noop write forces full materialization of every output column —
    // count() would let Catalyst prune the computed projections and
    // under-report (e.g. minhash columns never evaluated).
    def exec(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Warmup pass: JVM/JIT + parquet footer caches; excluded from timing.
    names.foreach { n =>
      try exec(SparkEntry.queries(n)(spark, sfDir))
      catch { case _: Throwable => () }
    }
    val results = names.map { n =>
      val t0 = System.nanoTime()
      try exec(SparkEntry.queries(n)(spark, sfDir))
      catch { case _: Throwable => () }
      n -> (System.nanoTime() - t0) / 1e9
    }
    // NEAR ingest throughput: full block-JSON → 17-table ETL (incl.
    // lineage fixpoint) over a synthetic 512-block chain. The
    // reference sustains ~1 block/s (BASELINE.md); this measures our
    // blocks/s at the same per-block shape.
    val nBlocks = sys.env.getOrElse("SPARK_GRAFT_NEAR_BLOCKS", "512").toInt
    val ingestSec = {
      val norm = graft.near.Ingest.blocksFromJson(spark,
        graft.near.Fixtures.syntheticChain(nBlocks)).toDF()
      val t0 = System.nanoTime()
      graft.near.Ingest.allTables(norm.persist()).values.foreach(exec)
      val dt = (System.nanoTime() - t0) / 1e9
      norm.unpersist()
      dt
    }
    val allResults = results :+ (s"near_ingest_${nBlocks}_blocks" -> ingestSec)

    // Isolated re-runs: the shared-session numbers above can drift with
    // scheduling/codegen-cache noise accumulated across 70 queries, so
    // creep-prone entries are re-measured in a FRESH session each (same
    // JVM — JIT stays warm, Spark-session state does not). A query that
    // regressed in the shared run but is stable here moved because of
    // session noise, not a plan change.
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val isolatedNames = sys.env.getOrElse("SPARK_GRAFT_ISOLATED",
        "q02_revenue_by_nation,q25_ann_ivf,q29_quantize_int8," +
          "q31_text_chunks,q36_contamination,q38_ngram_jaccard")
      .split(",").map(_.trim).filter(SparkEntry.queries.contains).toSeq
    val isolated = isolatedNames.map { n =>
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      try {
        def execS(): Unit = SparkEntry.queries(n)(s, sfDir)
          .write.mode("overwrite").format("noop").save()
        try execS() catch { case _: Throwable => () } // warmup
        val t0 = System.nanoTime()
        try execS() catch { case _: Throwable => () }
        n -> (System.nanoTime() - t0) / 1e9
      } finally {
        s.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }

    val qs = allResults.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val iso = isolated.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = allResults.map(_._2).sum
    val bps = nBlocks / ingestSec
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"isolated":$iso,"ingest_blocks_per_sec":$bps,"sf":"$sfDir"}""")
  }
}
