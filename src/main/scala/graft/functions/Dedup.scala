package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextFunctions._

/** Deduplication operators for the training-data pipeline: exact
  * (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket-join),
  * SimHash, and verified n-gram Jaccard.
  *
  * Scale design: the LSH path is the 100 TB route — candidate
  * generation is a single shuffle on (band, band_hash); the quadratic
  * verify step only runs inside buckets, and buckets are tiny unless
  * the corpus is pathological (a skew-salt on the band hash handles a
  * degenerate hot bucket). Nothing here collects to the driver.
  */
object Dedup {

  /** Exact-duplicate summary over a text column: group by md5. */
  def exactDupSummary(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val groups = docs
      .select(col(idCol).as("id"), md5(col(textCol)).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
    groups.agg(
      sum(col("n")).cast("long").as("n_docs"),
      count(lit(1)).as("n_distinct_texts"),
      count(when(col("n") > 1, 1)).as("n_dup_groups"),
      sum(when(col("n") > 1, col("n")).otherwise(lit(0))).cast("long").as("n_dup_docs"))
  }

  /** MinHash signature columns mh00..mh{k-1} from a shingle-set column.
    * Seed i uses the portable hash of "i|shingle"; min over the set.
    */
  def minhashCols(sh: Column, k: Int): Seq[Column] =
    (0 until k).map { i =>
      array_min(transform(sh, s => hash60(concat(lit(s"$i|"), s))))
        .as(f"mh$i%02d")
    }

  /** doc_id + k minhash signature columns for every document. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int, shingleN: Int): DataFrame =
    docs.select(
      col(idCol) +: minhashCols(shingleSet(col(textCol), shingleN), k): _*)

  /** MinHash-LSH near-duplicate pairs, verified with exact shingle-set
    * Jaccard. k signatures are split into `bands` bands of k/bands rows;
    * docs sharing any band hash are candidates; candidates are verified
    * with the true Jaccard and kept when >= threshold.
    *
    * Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, ordered.
    */
  def lshNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val rows = k / bands
    val base = docs.select(col(idCol).cast("long").as("id"),
      shingleSet(col(textCol), shingleN).as("sh"))
    val withSig = base.withColumn("sig",
      array(minhashCols(col("sh"), k).map(c => c): _*))

    // One row per (doc, band): band hash = md5 of the joined band slice.
    val banded = withSig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(concat_ws("|",
          transform(slice(col("sig"), b * lit(rows) + lit(1), lit(rows)),
            v => v.cast("string")))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")

    // Candidate pairs: same (band, band_hash), a < b. Distinct because a
    // pair can collide in several bands.
    val a = banded.alias("a")
    val b = banded.alias("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()

    // Verify with exact Jaccard over the shingle sets.
    val shA = base.select(col("id").as("doc_a"), col("sh").as("sh_a"))
    val shB = base.select(col("id").as("doc_b"), col("sh").as("sh_b"))
    cand.join(shA, "doc_a").join(shB, "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", round(col("inter") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 32-bit SimHash over the word multiset, computed entirely inside a
    * single whole-stage-codegen'd expression (no shuffle): bit j of the
    * signature is the sign of the sum of ±1 votes from every word's
    * 32-bit hash.
    */
  def simhash32(wordsCol: String): Column =
    expr(s"""
      aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, j) -> acc +
        CASE WHEN aggregate($wordsCol, CAST(0 AS BIGINT), (a2, t) -> a2 +
          CASE WHEN (shiftright(CAST(conv(substring(md5(t),1,8),16,10) AS BIGINT), j) & 1) = 1
               THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END) > 0
        THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)
    """)
}
