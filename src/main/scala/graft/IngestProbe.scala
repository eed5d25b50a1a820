package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch: marginal ingest cost vs block count. */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def exec(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    for (n <- Seq(128, 512, 2048, 8192)) {
      val norm = graft.near.Ingest.blocksFromJson(spark,
        graft.near.Fixtures.syntheticChain(n)).toDF().persist()
      norm.count()
      val t0 = System.nanoTime()
      graft.near.Ingest.allTables(norm).values.foreach(exec)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"BLOCKS=$n%6d  sec=$dt%8.2f  blocks_per_sec=${n / dt}%8.1f")
      norm.unpersist()
    }
    spark.stop()
  }
}
