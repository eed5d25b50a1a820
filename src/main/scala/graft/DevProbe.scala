package graft
import org.apache.spark.sql.SparkSession

/** Scratch main for local experiments; not part of the library surface. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = "/root/testdata/sf0.001/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(p)
    df.printSchema()
    df.selectExpr("ts", "ts % 1000 AS sub_us").show(5, false)
    spark.stop()
  }
}
