package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch profiler for the ingest bench path — not part of the API. */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def exec(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val nBlocks = 512
    // warmup identical to Bench: full pass once
    val normW = graft.near.Ingest.blocksFromJson(spark,
      graft.near.Fixtures.syntheticChain(nBlocks)).toDF().persist()
    graft.near.Ingest.allTables(normW).values.foreach(exec)
    normW.unpersist()

    val norm = graft.near.Ingest.blocksFromJson(spark,
      graft.near.Fixtures.syntheticChain(nBlocks)).toDF()
    val persisted = time("persist+count")(
      { val p = norm.persist(); p.count(); p })
    val tables = time("allTables (plan+lineage)")(
      graft.near.Ingest.allTables(persisted))
    tables.foreach { case (n, df) => time(s"write $n")(exec(df)) }
    spark.stop()
  }
}
