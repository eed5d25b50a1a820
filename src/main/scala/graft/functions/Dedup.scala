package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Universal-hash family for MinHash: mh_i(S) = min_{s∈S} ((a_i·h(s)
    * + b_i) mod P) with h the portable 32-bit md5-prefix hash and P a
    * prime > 2^32. ONE md5 per shingle (not one per seed) — the k
    * signatures are cheap affine transforms of the shared hash. a_i <
    * 2^30 keeps a_i·h < 2^62: no 64-bit overflow in either engine.
    *
    * 32 fixed pairs; a call site picks its k as a PREFIX of the
    * family (so the first 16 — every pre-r12 consumer — are stable),
    * and the DuckDB oracles inline the same constants by index.
    */
  val MinhashP: Long = 4294967311L
  val MinhashParams: Seq[(Long, Long)] = Seq(
    (745608819L, 248963417L), (324596023L, 903837683L),
    (526089559L, 30293999L), (661408273L, 713178101L),
    (78855127L, 563144563L), (952821319L, 68471339L),
    (411409657L, 868554217L), (130959239L, 304173617L),
    (241659371L, 373650473L), (852126029L, 497180263L),
    (667939513L, 646462531L), (96971063L, 789107293L),
    (569452027L, 104574559L), (781309283L, 42382297L),
    (315237619L, 925812733L), (438546857L, 591336419L),
    (194839021L, 651283847L), (873215467L, 217364089L),
    (502781633L, 934512277L), (68123909L, 485290361L),
    (736598227L, 150947821L), (291047563L, 827634419L),
    (948261707L, 362018533L), (157830449L, 709254611L),
    (624917351L, 93470287L), (380256179L, 556831703L),
    (815402957L, 274190869L), (46375121L, 882563947L),
    (593718311L, 419607257L), (262849573L, 748125631L),
    (907163849L, 185396701L), (451290703L, 630874217L),
  )

  /** doc_id + k minhash signature columns for every document. The
    * signature array is computed by the native MinHashSignature
    * expression (one md5 + k affine mins per shingle, single pass) and
    * materialized in its own projection before the per-column extract.
    */
  def minhashSignatures(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, k: Int, shingleN: Int): DataFrame =
    docs
      .select(col(idCol),
        graft.expressions.Sketches.minhashSigFromWords(spark,
          words(col(textCol)), shingleN, k).as("sig"))
      .select(col(idCol) +:
        (0 until k).map(i => element_at(col("sig"), i + 1).as(f"mh$i%02d")): _*)

  /** MinHash-LSH near-duplicate pairs, verified with exact shingle-set
    * Jaccard. k signatures are split into `bands` bands of k/bands rows;
    * docs sharing any band hash are candidates; candidates are verified
    * with the true Jaccard and kept when >= threshold.
    *
    * Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, ordered.
    */
  def lshNearDupPairs(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    require(k % bands == 0, s"bands=$bands must divide k=$k")
    require(k <= MinhashParams.length,
      s"k=$k exceeds the ${MinhashParams.length}-pair MinhashParams family")
    require(shingleN >= 1, s"shingleN=$shingleN must be positive")
    val rows = k / bands
    // Docs with fewer than shingleN words have an EMPTY shingle set:
    // their minhash signature is all-NULL, every band hash degenerates
    // to md5('') and all of them would collide pairwise, then verify at
    // jaccard = 0/0 = NaN (> any threshold under Spark NaN ordering).
    // They can never be near-duplicates, so drop them before banding.
    val base = docs.select(col(idCol).cast("long").as("id"),
      words(col(textCol)).as("w"))
      .filter(size(col("w")) >= shingleN)
    val withSig = base
      .withColumn("sig",
        graft.expressions.Sketches.minhashSigFromWords(spark, col("w"),
          shingleN, k))

    // One row per (doc, band): band hash = md5 of the joined band slice.
    val banded = withSig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(concat_ws("|",
          transform(slice(col("sig"), b * lit(rows) + lit(1), lit(rows)),
            v => v.cast("string")))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")

    // Candidate pairs: same (band, band_hash), a < b, distinct because
    // a pair can collide in several bands; a degenerate hot band hash
    // is bounded by the exact triangle salting (same pair set).
    // Materialized once (pair-count-sized — dup pairs are orders of
    // magnitude fewer than corpus rows): three consumers below (the
    // id set + both endpoint joins).
    // (Re-spread before the checkpoint — the r20 q53 lesson: AQE
    // coalesces a tiny frame's last exchange to ONE partition and the
    // checkpoint freezes that, serializing the per-pair exact-Jaccard
    // verify stage downstream. The added exchange moves id pairs only.)
    val cand = Similarity.bucketCandidatePairs(
        banded.select(col("id").as("vec_id"), col("band"),
          col("band_hash").as("bucket")), maxBucket = 4096)
      .select(col("vec_id_a").as("doc_a"), col("vec_id_b").as("doc_b"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_a"))
      .localCheckpoint(true)

    // Verify with exact Jaccard over the distinct shingle sets,
    // CANDIDATE-GATED (guide §8: decide with small rows, touch heavy
    // rows once): the former endpoint joins broadcast the FULL
    // corpus's word arrays twice (every doc's words built into two
    // hash relations so a few thousand candidates could probe them —
    // backwards at any scale, and two extra whole-corpus words passes
    // besides). Instead the tiny candidate id set semi-joins the
    // documents scan BEFORE the words projection, so the split runs
    // only for candidate endpoints, and the candidate-sized words
    // frame is what broadcasts into the pair join. Same w values
    // (same words + length filter over a subset that candidates are
    // drawn from), same pairs, same jaccard.
    val candIds = cand.select(col("doc_a").as("cid"))
      .unionByName(cand.select(col("doc_b").as("cid"))).distinct()
    // (No re-spread here: candWords only ever feeds BROADCAST builds,
    // which collect all partitions regardless of layout.)
    val candWords = docs
      .join(candIds, col(idCol).cast("long") === col("cid"), "left_semi")
      .select(col(idCol).cast("long").as("id"),
        words(col(textCol)).as("w"))
      .filter(size(col("w")) >= shingleN)
      .localCheckpoint(true)
    val shA = candWords.select(col("id").as("doc_a"), col("w").as("w_a"))
    val shB = candWords.select(col("id").as("doc_b"), col("w").as("w_b"))
    cand.join(shA, "doc_a").join(shB, "doc_b")
      .withColumn("jaccard", round(
        graft.expressions.Sketches.shingleJaccard(spark, col("w_a"), col("w_b"),
          shingleN), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Near-dup CLUSTERING — connected components over the pair graph,
    * the stage that turns pairwise matches into dedup groups (keep the
    * representative, drop the rest). Label = min id reachable,
    * computed by iterative min-label propagation: each round is one
    * shuffle on the node key and the round count is the graph
    * diameter, which for near-dup clusters (small, dense components)
    * is tiny. No driver-side graph, no cross join.
    */
  /** Pair-count gate below which [[dupClusters]] solves the components
    * on the driver instead of looping distributed shuffle rounds. A
    * round of min-label propagation is 3 pair-sized joins + an
    * aggregate — fixed scheduling cost that dwarfs the work when the
    * pair graph is small (the common case: dup PAIRS are orders of
    * magnitude fewer than corpus rows). At the limit the collect is
    * ~1M pairs × 16 B ≈ 16 MB of rows (≲100 MB as a driver map) —
    * the same bounded-driver budget as an allowed broadcast; above
    * it the distributed loop runs exactly as before, so the operator
    * stays scale-safe for adversarial pair graphs.
    */
  private[graft] val LocalEdgeLimit: Long = 1L << 20

  def dupClusters(pairs: DataFrame, aCol: String = "vec_id_a",
      bCol: String = "vec_id_b", maxIter: Int = 50,
      localEdgeLimit: Long = LocalEdgeLimit): DataFrame = {
    // Materialize the (expensive — LSH/SimHash candidate pipelines)
    // pair frame ONCE; both the size gate and either solver read the
    // checkpoint, never the upstream pipeline twice.
    val raw = pairs.select(col(aCol).cast("long").as("u"),
      col(bCol).cast("long").as("v")).localCheckpoint(true)
    // Gate probe and driver-path fetch in ONE job: limit(n+1).collect
    // on the checkpoint either returns every pair (≤ n — exactly the
    // rows union-find needs) or proves the graph is over-gate with a
    // bounded fetch. The former count-then-collect pair cost one whole
    // extra job per call — pure scheduling overhead at small pair
    // counts (the r20 q51 driver regression).
    val cap = math.min(localEdgeLimit + 1, Int.MaxValue.toLong).toInt
    val localPairs = raw.limit(cap).collect()
    if (localPairs.length <= localEdgeLimit) {
      // Driver union-find (union by min root + iterative path
      // compression): canonical = min id of the component — the same
      // fixpoint the propagation loop converges to, computed in one
      // pass over a BOUNDED pair set with zero shuffle rounds.
      val parent = new scala.collection.mutable.LongMap[Long]()
      def find(x0: Long): Long = {
        var x = x0
        while (parent.getOrElse(x, x) != x) x = parent.getOrElse(x, x)
        var c = x0 // compress the chased path
        while (parent.getOrElse(c, c) != c) {
          val nxt = parent.getOrElse(c, c); parent(c) = x; c = nxt
        }
        x
      }
      localPairs.foreach { r =>
        val (u, v) = (r.getLong(0), r.getLong(1))
        parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
      }
      val labels = parent.keys.toArray.sorted.map(k => (k, find(k)))
      val spark = pairs.sparkSession
      import spark.implicits._
      return labels.toSeq.toDF("vec_id", "cluster_id")
        .orderBy(col("vec_id"))
    }
    val edges = raw
      .unionByName(raw.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint(true)
    // raw's blocks are never read past this point (both the init and
    // the loop read `edges`) — release them instead of holding a
    // second pair-sized materialization in block-manager memory for
    // the whole propagation (r20 ADVICE). The checkpointed frame's
    // plan is a LogicalRDD leaf wrapping exactly the persisted RDD.
    raw.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ => ()
    }
    // Init FUSED with the first propagation round: every node's
    // round-1 label is min(self, min neighbour), which the symmetric
    // edge list yields in the same single shuffle the identity init
    // would have cost — one whole propagation round (a join + groupBy
    // over the pair graph) never runs.
    var labels = edges.groupBy(col("u"))
      .agg(min(col("v")).as("nv"))
      .select(col("u").as("node"), least(col("u"), col("nv")).as("lbl"))
      .localCheckpoint(true)
    var changed = true
    var iter = 0
    while (changed && iter < maxIter) {
      val nbrMin = edges
        .join(labels, col("v") === col("node"))
        .groupBy(col("u")).agg(min(col("lbl")).as("nlbl"))
      // Carry the previous label through the propagation round, then
      // materialize AND test convergence in a SINGLE job: the lazy
      // localCheckpoint is forced by the changed-count aggregate
      // (count scans every partition, so the checkpoint completes —
      // an isEmpty/limit action would not guarantee that), which
      // replaces the former eager-checkpoint-then-isEmpty pair. One
      // round of propagation = one Spark job, and the lineage is still
      // truncated each round so plan size stays O(1) in iterations.
      val next = labels
        .join(nbrMin, col("node") === col("u"), "left")
        .select(col("node"), col("lbl").as("prev"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      // POINTER JUMP (hash-min shortcutting): lbl(x) := min(lbl(x),
      // prev_lbl(lbl(x))) — labels chase their own label's label, so
      // a length-d chain converges in O(log d) rounds instead of
      // O(d). Without this a component whose diameter exceeded
      // maxIter came back SILENTLY under-merged (a 200-node duplicate
      // chain is entirely plausible in boilerplate-heavy corpora at
      // 100 TB); with it, 50 iterations cover diameters past 2^50.
      // The jump reads the PREVIOUS round's checkpointed table (not
      // `next` itself, which would plan the neighbor-min subtree
      // twice per round): stale-by-one reads keep every intermediate
      // label a real node id of the same component, so the fixpoint
      // (= per-component min id) is unchanged — only the round count
      // drops. One extra pair-sized join per round, same single-job
      // materialize + convergence test.
      val jumped = next
        .join(labels.select(col("node").as("jn"), col("lbl").as("jl")),
          next("lbl") === col("jn"), "left")
        .select(next("node"), col("prev"),
          least(next("lbl"), coalesce(col("jl"), next("lbl"))).as("lbl"))
        .localCheckpoint(eager = false)
      changed = jumped.filter(col("lbl") =!= col("prev")).count() > 0
      labels = jumped.select(col("node"), col("lbl"))
      iter += 1
    }
    labels.select(col("node").as("vec_id"), col("lbl").as("cluster_id"))
      .orderBy(col("vec_id"))
  }
}
