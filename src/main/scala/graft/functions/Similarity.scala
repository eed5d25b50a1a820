package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import TextFunctions.hash60

/** Similarity search over an embedding column (Array[Float]).
  *
  * Brute-force cosine top-k is the correctness baseline; the
  * random-hyperplane LSH bucketing is the scale path — at 100 TB the
  * bucket assignment is a map-only pass and the candidate join shuffles
  * on the (short) bucket key instead of crossing the full corpus.
  */
object Similarity {

  /** Exact cosine similarity between two float-array columns, computed
    * as a left-fold so the summation order is fixed (deterministic and
    * identical to the oracle's sequential list_sum).
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Brute-force top-k neighbors for a small set of anchor vectors:
    * broadcast the anchors, one pass over the corpus, per-anchor window
    * rank. Output: (anchor_id, vec_id, cos_sim, rank).
    */
  def bruteTopK(embeddings: DataFrame, anchorIds: Seq[Long], k: Int): DataFrame = {
    val anchors = embeddings
      .filter(col("vec_id").isin(anchorIds: _*))
      .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_emb"))
    val scored = embeddings.crossJoin(broadcast(anchors))
      .filter(col("vec_id") =!= col("anchor_id"))
      .withColumn("cos_sim", round(cosine(col("embedding"), col("anchor_emb")), 6))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("vec_id"), col("cos_sim"), col("rank"))
      .orderBy(col("anchor_id"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component: in [-1, 1),
    * derived from the portable hash of "plane_dim" so both engines (and
    * every executor) see the same hyperplanes without broadcasting
    * state.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (hash60(concat(lit(s"hp${plane}_"), dim.cast("string"))) % 2001 - 1000)
      .cast("double") / 1000.0

  /** nBits-bit LSH bucket signature of an embedding: bit j = sign of
    * the dot product with deterministic hyperplane j. Map-only.
    */
  def lshBucket(emb: Column, dims: Int, nBits: Int): Column = {
    val bits = (0 until nBits).map { j =>
      val dot = aggregate(sequence(lit(1), lit(dims)), lit(0.0),
        (acc, i) => acc +
          element_at(emb, i).cast("double") * planeComponent(j, i))
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN via LSH buckets: anchors probe only their own bucket, then
    * exact cosine rank within the candidates. Output mirrors bruteTopK
    * (recall < 1 by construction; that is the documented trade).
    */
  def annTopK(embeddings: DataFrame, anchorIds: Seq[Long], k: Int,
      dims: Int = 64, nBits: Int = 8): DataFrame = {
    val bucketed = embeddings
      .withColumn("bucket", lshBucket(col("embedding"), dims, nBits))
    val anchors = bucketed
      .filter(col("vec_id").isin(anchorIds: _*))
      .select(col("vec_id").as("anchor_id"),
        col("embedding").as("anchor_emb"), col("bucket"))
    val cands = bucketed.join(broadcast(anchors), Seq("bucket"))
      .filter(col("vec_id") =!= col("anchor_id"))
      .withColumn("cos_sim", round(cosine(col("embedding"), col("anchor_emb")), 6))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("vec_id"), col("cos_sim"), col("rank"))
      .orderBy(col("anchor_id"), col("rank"))
  }
}
