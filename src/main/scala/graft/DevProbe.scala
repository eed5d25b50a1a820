package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for local experiments; not part of the library surface. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.expressions.Sketches.register(spark)
    // probe 1: empty + short word arrays through minhash/simhash
    val df = Seq(
      (1L, Seq[String]()),
      (2L, Seq("a")),
      (3L, Seq("a", "b", "c")),
      (4L, Seq("a", "b", "c", "d"))).toDF("id", "w")
    df.selectExpr("id", "graft_simhash32(w) AS sh",
        "graft_minhash_shingles(w) AS mh",
        "graft_shingle_jaccard(w, w) AS jself")
      .show(false)
    // probe 2: wrong input type
    try {
      Seq((1, Seq(1, 2, 3))).toDF("id", "xs")
        .selectExpr("graft_simhash32(xs)").collect()
      println("PROBE2: no error (unexpected)")
    } catch { case e: Throwable => println("PROBE2 error class: " + e.getClass.getSimpleName) }
    spark.stop()
  }
}
