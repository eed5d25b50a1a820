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
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Native single-loop variant of [[dot]] (bit-identical left fold;
    * ~30× faster than the interpreted higher-order lambdas on the
    * pairwise hot paths). Needs the session to register the function.
    */
  private def ndot(s: org.apache.spark.sql.SparkSession)(x: Column, y: Column): Column =
    graft.expressions.Sketches.fdot(s, x, y)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force top-k neighbors for a small set of anchor vectors:
    * broadcast the anchors, one pass over the corpus, per-anchor window
    * rank. Output: (anchor_id, vec_id, cos_sim, rank).
    */
  def bruteTopK(embeddings: DataFrame, anchorIds: Seq[Long], k: Int): DataFrame = {
    val dot = ndot(embeddings.sparkSession) _
    // Norms are materialized once per row (and once per anchor) instead
    // of inside every pair's cosine — same doubles, 1/3 the dot products.
    val withNorm = embeddings
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("norm"))
    val anchors = withNorm
      .filter(col("vec_id").isin(anchorIds: _*))
      .select(col("vec_id").as("anchor_id"),
        col("embedding").as("anchor_emb"), col("norm").as("anchor_norm"))
    val scored = withNorm.crossJoin(broadcast(anchors))
      .filter(col("vec_id") =!= col("anchor_id"))
      .withColumn("cos_sim", round(
        dot(col("embedding"), col("anchor_emb")) /
          (col("norm") * col("anchor_norm")), 6))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("vec_id"), col("cos_sim"), col("rank"))
      .orderBy(col("anchor_id"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1),
    * derived from the md5-prefix hash of "hp{plane}_{dim}". Computed
    * once on the driver and shipped as literals — the per-row work is
    * a plain dot product, no hashing in the hot path.
    */
  private def planeComponent(plane: Int, dim: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hp${plane}_$dim".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L).toDouble / 1000.0
  }

  private def plane(planeIdx: Int, dims: Int): Array[Double] =
    Array.tabulate(dims)(i => planeComponent(planeIdx, i + 1))

  /** The hyperplane as a DuckDB list literal — the components are
    * k/1000 rationals whose shortest decimal repr round-trips exactly,
    * so the oracle twin sees bit-identical doubles.
    */
  private[graft] def planeSqlLiteral(planeIdx: Int, dims: Int): String =
    plane(planeIdx, dims).mkString("[", ", ", "]")

  /** nBits-bit LSH bucket signature of an embedding: bit j = sign of
    * the dot product with deterministic hyperplane `planeOffset + j`.
    * Map-only. Distinct `planeOffset`s give independent hash tables
    * (the OR-amplification bands of [[nearDupPairsLsh]]).
    *
    * Each plane dot runs through the native [[graft.expressions
    * .Sketches.FloatDot]] (codegen'd single loop) instead of the
    * interpreted aggregate/zip_with lambdas — the same strict left
    * fold, bit-identical doubles, ~nBits·dims fewer boxed lambda
    * evaluations per row on the q21/q24b/q28 bucketing path.
    */
  def lshBucket(emb: Column, dims: Int, nBits: Int,
      planeOffset: Int = 0): Column = {
    val s = SparkSession.active
    val bits = (0 until nBits).map { j =>
      val dot = graft.expressions.Sketches.fdot(s, emb,
        typedLit(plane(planeOffset + j, dims).toSeq))
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Embedding-cosine near-duplicate PAIRS (the dedup operator):
    * every (a, b) with a < b and rounded cosine ≥ threshold. Exact
    * all-pairs — the oracle-checkable SMALL-SCALE baseline, guarded by
    * `maxRows`: the O(n²) plan must never silently ride into a corpus-
    * sized input (an oversized input raises instead of launching a
    * quadratic job). At corpus scale use [[nearDupPairsLsh]] (bucketed
    * candidates, recall < 1).
    */
  def nearDupPairs(embeddings: DataFrame, threshold: Double,
      maxRows: Long = 65536L): DataFrame = {
    // Guard cost is bounded by the guard itself: scan at most
    // maxRows+1 rows instead of count()-ing the full input (which
    // doubled the source reads on every call). limit() takes an Int —
    // for a cap at or beyond Int.MaxValue fall back to the full count
    // rather than silently disabling the guard.
    val over =
      if (maxRows >= Int.MaxValue) embeddings.count() > maxRows
      else embeddings.limit(maxRows.toInt + 1).count() > maxRows
    require(!over,
      s"nearDupPairs is the exact all-pairs baseline: input has more than " +
        s"maxRows=$maxRows rows; use nearDupPairsLsh for corpus-scale inputs")
    val dot = ndot(embeddings.sparkSession) _
    val n = embeddings.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val a = n.select(col("vec_id").as("vec_id_a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("vec_id_b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, col("vec_id_a") < col("vec_id_b"))
      .withColumn("cos_sim",
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_id_a"), col("vec_id_b"), col("cos_sim"))
      .orderBy(col("vec_id_a"), col("vec_id_b"))
  }

  /** Candidate id pairs from equal-(band,bucket) groups, with
    * degenerate hot buckets bounded by EXACT triangle salting: a
    * bucket of m > maxBucket members shards s = ceil(m/maxBucket)
    * ways on the id; an element in shard r replicates as the LEFT of
    * shard-cells (r, r..s-1) and the RIGHT of cells (0..r, r), so
    * every intra-bucket pair meets in exactly one cell and the
    * largest join task is ~maxBucket² instead of m². No pair is
    * gained or lost — same output as the plain self-join.
    *
    * Fast path: one cheap sizing aggregate first; when NO bucket
    * exceeds `maxBucket` (the common case — skew is the exception),
    * the salting machinery (sizing join + explode replication) is
    * skipped entirely and the candidates come from the plain
    * self-equi-join. Skew safety is kept — the salted path engages
    * exactly when a hot bucket actually exists.
    */
  private[graft] def bucketCandidatePairs(keyed0: DataFrame,
      maxBucket: Int): DataFrame = {
    // Materialize the keyed input ONCE: it is the output of the
    // upstream signature computation (minhash / hyperplane sketches —
    // the most expensive map stage of the whole dedup), and it is read
    // by the sizing aggregate AND both sides of the candidate
    // self-join. Without the checkpoint the sizing action recomputes
    // every signature a second time. The materialized rows are
    // (vec_id, band, bucket) — a few dozen bytes × bands per doc,
    // O(corpus) but ~1000× narrower than the corpus itself; at 100 TB
    // that is a few hundred GB spread over the cluster vs re-running
    // the signature scan over the full corpus text.
    val keyed = keyed0.localCheckpoint(true)
    // One sizing aggregate over the checkpoint: one row per non-empty
    // bucket, bounded by the corpus, tiny in practice.
    // No checkpoint on sizes: the salted path's sizing join re-derives
    // it from the keyed checkpoint with one cheap aggregate; a second
    // materialization job per call would cost more than it saves.
    val sizes = keyed.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("m"))
    val mx = sizes.agg(max(col("m"))).collect()(0)
    val maxSize = if (mx.isNullAt(0)) 0L else mx.getLong(0)
    if (maxSize <= maxBucket) {
      keyed.select(col("band"), col("bucket"), col("vec_id").as("vec_id_a"))
        .join(keyed.select(col("band"), col("bucket"),
          col("vec_id").as("vec_id_b")), Seq("band", "bucket"))
        .filter(col("vec_id_a") < col("vec_id_b"))
        .select(col("vec_id_a"), col("vec_id_b"))
        .distinct()
    } else {
      val sized = keyed.join(
        sizes.select(col("band"), col("bucket"),
          ceil(col("m").cast("double") / maxBucket).cast("int").as("s")),
        Seq("band", "bucket"))
        .withColumn("r", pmod(col("vec_id"), col("s")).cast("int"))
      val lhs = sized
        .withColumn("cy", explode(sequence(col("r"), col("s") - 1)))
        .select(col("band"), col("bucket"), col("r").as("cx"), col("cy"),
          col("vec_id").as("vec_id_a"))
      val rhs = sized
        .withColumn("cx", explode(sequence(lit(0), col("r"))))
        .select(col("band"), col("bucket"), col("cx"), col("r").as("cy"),
          col("vec_id").as("vec_id_b"))
      // A pair meets in one cell with an arbitrary left/right
      // orientation (shard order, not id order) — normalize to
      // (min, max) rather than filtering on the orientation.
      lhs.join(rhs, Seq("band", "bucket", "cx", "cy"))
        .filter(col("vec_id_a") =!= col("vec_id_b"))
        .select(least(col("vec_id_a"), col("vec_id_b")).as("vec_id_a"),
          greatest(col("vec_id_a"), col("vec_id_b")).as("vec_id_b"))
        .distinct()
    }
  }

  /** Scale path for near-dup pairs: banded (OR-amplified) hyperplane
    * LSH — `nBands` independent hash tables of `rBits` sign-bits each;
    * a pair is a candidate if it collides in ANY band. Bucketing is
    * map-only, the candidate join is an equi-join on (band, bucket)
    * with hot buckets bounded by [[bucketCandidatePairs]]' exact
    * salting, and exact cosine confirms inside the (deduped) candidate
    * set — no cross join anywhere. Misses pairs colliding in no band —
    * recall < 1, the documented trade; recall tunes with
    * `1 - (1 - p^rBits)^nBands`, cost with `n²/2^rBits` per band.
    */
  def nearDupPairsLsh(embeddings: DataFrame, threshold: Double,
      dims: Int = 64, rBits: Int = 6, nBands: Int = 4,
      maxBucket: Int = 4096): DataFrame = {
    val dot = ndot(embeddings.sparkSession) _
    val bands = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        lshBucket(col("embedding"), dims, rBits, b * rBits).as("bucket"))
    }
    val keyed = embeddings
      .select(col("vec_id"), explode(array(bands: _*)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
    val cand = bucketCandidatePairs(keyed, maxBucket)
    val n = embeddings.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    cand
      .join(n.select(col("vec_id").as("vec_id_a"), col("embedding").as("ea"),
        col("nrm").as("na")), Seq("vec_id_a"))
      .join(n.select(col("vec_id").as("vec_id_b"), col("embedding").as("eb"),
        col("nrm").as("nb")), Seq("vec_id_b"))
      .withColumn("cos_sim",
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_id_a"), col("vec_id_b"), col("cos_sim"))
      .orderBy(col("vec_id_a"), col("vec_id_b"))
  }

  /** Coarse-quantizer centroids: deterministic k-means in the integer
    * micro-unit domain, trained on a bounded sample, collected once
    * to the driver and shipped as literals.
    *
    *   - Training sample: the `sampleSize` vectors FIRST IN
    *     md5("ivf:"||vec_id) ORDER — a deterministic uniform sample of
    *     the corpus, regardless of id layout. (The pre-r12 "first
    *     nCells by vec_id" init was id-correlated: ids track
    *     time/source, so on a real corpus most vectors crowded into
    *     few cells and the within-cell pairwise bound degraded toward
    *     m². At warehouse scale "order by hash, limit S" is a
    *     distributed top-k — ONE corpus pass, bounded collect.)
    *   - Init: the first `nCells` sample vectors (a prefix of the
    *     hash order). Refinement: `iters` fixed Lloyd rounds ON THE
    *     DRIVER over the sample (the FAISS train-on-sample pattern —
    *     a per-iteration pass over 100 TB would cost `iters` corpus
    *     scans for centroids a bounded sample estimates just as well;
    *     driver work is sampleSize·nCells·dims long ops, microseconds).
    *     Everything stays in exact integer micro-units (components
    *     quantized to round(v·1e6)): distances/sums are exact long
    *     arithmetic and the centroid mean is the truncating integer
    *     division that DuckDB's `//` computes identically — so the
    *     DuckDB oracles replay the SAME sample, rounds and tiebreaks
    *     bit-for-bit (unrolled CTEs, PipelineOracles.ivfCtes) instead
    *     of assuming float means agree across engines. An emptied
    *     cell keeps its previous centroid; ties assign the lower cell.
    *
    * Not full k-means|| (Bahmani et al. 2012): its cost-weighted
    * oversampling rounds cannot be replayed by a static SQL oracle;
    * the uniform hash sample + Lloyd rounds achieve the same goal
    * here (representative cells, bounded occupancy) with oracle-exact
    * arithmetic. Returns (cell, microCentroid) pairs.
    */
  private[graft] def kmeansCentroidsMicro(embeddings: DataFrame,
      nCells: Int, iters: Int = 2,
      sampleSize: Int = 512): Array[(Int, Array[Long])] = {
    val s = embeddings.sparkSession
    val sample: Array[Array[Long]] = embeddings
      .select(col("vec_id"),
        graft.expressions.Sketches.microQuantize(s, col("embedding")).as("xq"))
      .orderBy(md5(concat(lit("ivf:"), col("vec_id").cast("string"))),
        col("vec_id"))
      .limit(sampleSize)
      .select(col("xq")).collect()
      .map(_.getSeq[Double](0).map(_.toLong).toArray)
    var cents = sample.take(nCells).map(_.clone())
    var it = 0
    while (it < iters && cents.nonEmpty) {
      val k = cents.length
      val dims = cents(0).length
      val sums = Array.ofDim[Long](k, dims)
      val counts = new Array[Long](k)
      sample.foreach { x =>
        var best = 0
        var bestD = Long.MaxValue
        var c = 0
        while (c < k) {
          val cv = cents(c)
          var d = 0L
          var j = 0
          while (j < dims) { val t = x(j) - cv(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c } // strict <: tie keeps lower cell
          c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dims) { sums(best)(j) += x(j); j += 1 }
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c) // emptied cell keeps its centroid
        else Array.tabulate(dims)(j => sums(c)(j) / counts(c)))
      it += 1
    }
    cents.zipWithIndex.map(_.swap)
  }

  /** Product-quantization codebooks: the SAME deterministic
    * sample-trained micro-integer k-means as [[kmeansCentroidsMicro]]
    * (identical sample — the `sampleSize` vectors first in
    * md5("ivf:"||vec_id) order — identical strict-< tiebreak,
    * truncating integer means, emptied-cell carry), run INDEPENDENTLY
    * on each of `m` contiguous `dsub`-dim subspaces of the
    * micro-quantized embedding. One corpus pass collects the sample
    * once; the m Lloyd loops are driver work over 512 × dsub longs.
    * Returns codebooks(j)(cell) = the dsub-dim micro centroid — every
    * value exact long arithmetic, so the DuckDB oracle replays all m
    * codebooks bit-for-bit with the ivfCtes machinery per subspace.
    */
  private[graft] def pqCodebooksMicro(embeddings: DataFrame, m: Int = 8,
      dsub: Int = 8, k: Int = 16, iters: Int = 2,
      sampleSize: Int = 512): Array[Array[Array[Long]]] =
    pqLloyd(pqTrainSample(embeddings, sampleSize), m, dsub, k, iters)

  /** The deterministic PQ training sample: the `sampleSize` vectors
    * first in md5('ivf:'||vec_id) order, micro-quantized — shared by
    * raw-vector PQ (q81) and residual PQ (q82b).
    */
  private def pqTrainSample(embeddings: DataFrame,
      sampleSize: Int): Array[Array[Long]] = {
    val s = embeddings.sparkSession
    embeddings
      .select(col("vec_id"),
        graft.expressions.Sketches.microQuantize(s, col("embedding")).as("xq"))
      .orderBy(md5(concat(lit("ivf:"), col("vec_id").cast("string"))),
        col("vec_id"))
      .limit(sampleSize)
      .select(col("xq")).collect()
      .map(_.getSeq[Double](0).map(_.toLong).toArray)
  }

  /** RESIDUAL PQ codebooks (FAISS `by_residual=true`): the same
    * deterministic per-subspace Lloyd chain as [[pqCodebooksMicro]],
    * but trained on COARSE-QUANTIZER RESIDUALS — each sampled vector
    * is first assigned to its nearest coarse centroid (exact integer
    * distance, strict-< tie to the lower cell — identical to the
    * engine's `IvfCellRank` and the oracle's `asg`), and the codebook
    * input is xq − centroid. Residuals are much lower-energy than raw
    * vectors, so 8 bits/subspace buys visibly less quantization error
    * — the reason residual encoding is the FAISS default.
    */
  private[graft] def pqResidualCodebooksMicro(embeddings: DataFrame,
      cents: Array[Array[Long]], m: Int = 8, dsub: Int = 8, k: Int = 16,
      iters: Int = 2, sampleSize: Int = 512): Array[Array[Array[Long]]] = {
    val res = pqTrainSample(embeddings, sampleSize).map { xq =>
      var best = 0; var bestD = Long.MaxValue
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)
        val n = math.min(xq.length, cv.length)
        var d = 0L; var i = 0
        while (i < n) { val t = xq(i) - cv(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      Array.tabulate(xq.length)(i => xq(i) - cents(best)(i))
    }
    pqLloyd(res, m, dsub, k, iters)
  }

  /** Per-subspace deterministic micro-integer Lloyd chain over an
    * in-memory sample (init = first k sample slices, exact integer
    * distances, strict-< ties to the lower cell, truncating integer
    * means, emptied-cell carry) — the replayable k-means core shared
    * by the raw and residual PQ trainers.
    */
  private def pqLloyd(sample: Array[Array[Long]], m: Int,
      dsub: Int, k: Int, iters: Int): Array[Array[Array[Long]]] = {
    Array.tabulate(m) { j =>
      val sub = sample.map(_.slice(j * dsub, j * dsub + dsub))
      var cents = sub.take(k).map(_.clone())
      var it = 0
      while (it < iters && cents.nonEmpty) {
        val kk = cents.length
        val sums = Array.ofDim[Long](kk, dsub)
        val counts = new Array[Long](kk)
        sub.foreach { x =>
          var best = 0
          var bestD = Long.MaxValue
          var c = 0
          while (c < kk) {
            val cv = cents(c)
            var d = 0L
            var i = 0
            while (i < dsub) { val t = x(i) - cv(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c } // strict <: tie keeps lower
            c += 1
          }
          counts(best) += 1
          var i = 0
          while (i < dsub) { sums(best)(i) += x(i); i += 1 }
        }
        cents = Array.tabulate(kk)(c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(dsub)(i => sums(c)(i) / counts(c)))
        it += 1
      }
      cents
    }
  }

  /** Distance ranking per row: sorted (exact squared micro-distance,
    * cell) array from the native [[graft.expressions.Sketches.IvfCellRank]]
    * expression — one map-only projection, centroids inlined as
    * literals, element 0 is the nearest cell.
    */
  private def cellRankExpr(s: SparkSession,
      centroids: Array[(Int, Array[Long])])(emb: Column): Column =
    graft.expressions.Sketches.ivfCellRank(s, emb,
      centroids.sortBy(_._1).map(_._2))

  /** ANN via IVF (inverted-file) coarse quantization — the second
    * scale path besides LSH. Centroids come from the deterministic
    * micro-integer k-means ([[kmeansCentroidsMicro]]), collected once
    * and shipped as literals. Cell assignment is an argmin over nCells
    * exact integer distances — map-only; the probe joins anchors to
    * their `nProbe` nearest cells only, so the candidate join shuffles
    * on the short cell key instead of crossing the corpus. Recall < 1
    * by construction (documented trade).
    */
  def annTopKIvf(embeddings: DataFrame, anchorIds: Seq[Long], k: Int,
      nCells: Int = 16, nProbe: Int = 2): DataFrame = {
    val s = embeddings.sparkSession
    val dot = ndot(s) _
    val centroids = kmeansCentroidsMicro(embeddings, nCells)
    def cellRank(emb: Column): Column = cellRankExpr(s, centroids)(emb)
    // The ranking expression (nCells inline literal-array dot products
    // + sort) is built ONCE and shared by both branches — corpus rows
    // take element 0, anchors the first nProbe cells. One expression
    // tree means one codegen'd projection, not two near-identical
    // 2×nCells-dot-product giants compiled side by side.
    val ranked = embeddings.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("norm"),
      cellRank(col("embedding")).as("ranked"))
    val assigned = ranked.select(col("vec_id"), col("embedding"),
      col("norm"), col("ranked")(0).getField("cell").as("cell"))
    val anchors = ranked
      .filter(col("vec_id").isin(anchorIds: _*))
      .select(col("vec_id").as("anchor_id"),
        col("embedding").as("anchor_emb"),
        col("norm").as("anchor_norm"),
        slice(transform(col("ranked"),
          s => s.getField("cell")), 1, nProbe).as("probe_cells"))
      .withColumn("cell", explode(col("probe_cells")))
      .drop("probe_cells")
    val cands = assigned.join(broadcast(anchors), Seq("cell"))
      .filter(col("vec_id") =!= col("anchor_id"))
      .withColumn("cos_sim", round(
        dot(col("embedding"), col("anchor_emb")) /
          (col("norm") * col("anchor_norm")), 6))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("vec_id"), col("cos_sim"), col("rank"))
      .orderBy(col("anchor_id"), col("rank"))
  }

  /** SemDeDup-style SEMANTIC dedup (Abbas et al. 2023, arXiv
    * 2303.09540): cluster the embedding space coarsely, then dedup
    * ONLY within clusters — the cluster bound is what makes
    * embedding-level dedup tractable at corpus scale (pairwise work is
    * per-cell, never corpus²). Stages, all reusing the engine's
    * existing scale paths:
    *   1. cell assignment = the IVF coarse quantizer (argmin over
    *      nCells literal centroids, map-only);
    *   2. within-cell candidate pairs via [[bucketCandidatePairs]], so
    *      a degenerate hot cell triangle-salts to bounded tasks
    *      instead of an m² join;
    *   3. exact cosine ≥ `threshold` keeps an edge; connected
    *      components ([[Dedup.dupClusters]]) pick the min-id
    *      representative per duplicate group.
    * Output: one row per vector — (vec_id, cell, canon_id, keep);
    * `keep` is true for cluster representatives and singletons.
    * Duplicates of the same content that land in different cells are
    * missed — SemDeDup's documented recall trade (tunes with nCells).
    */
  def semanticDedup(embeddings: DataFrame, threshold: Double,
      nCells: Int = 16, maxBucket: Int = 4096): DataFrame = {
    val s = embeddings.sparkSession
    val dot = ndot(s) _
    val centroids = kmeansCentroidsMicro(embeddings, nCells)
    // Materialized once: the assignment projection (nCells dot
    // products per row) feeds four branches (candidate keys, both
    // pair-verify sides, the final per-vector report) — the q38
    // "write the derived table first" step. At warehouse scale this
    // is the cell-partitioned assignment table a real pipeline would
    // persist anyway (it IS the IVF index).
    val assigned = embeddings.select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("norm"),
        cellRankExpr(s, centroids)(col("embedding"))(0)
          .getField("cell").as("cell"))
      .localCheckpoint(true)
    val cand = bucketCandidatePairs(
      assigned.select(col("vec_id"), lit(0).as("band"),
        col("cell").as("bucket")), maxBucket)
    val edges = cand
      .join(assigned.select(col("vec_id").as("vec_id_a"),
        col("embedding").as("ea"), col("norm").as("na")), Seq("vec_id_a"))
      .join(assigned.select(col("vec_id").as("vec_id_b"),
        col("embedding").as("eb"), col("norm").as("nb")), Seq("vec_id_b"))
      .withColumn("cos_sim",
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_id_a"), col("vec_id_b"))
    val canon = Dedup.dupClusters(edges)
      .select(col("vec_id"), col("cluster_id").as("canon_id"))
    assigned.select(col("vec_id"), col("cell").cast("long").as("cell"))
      .join(canon, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("canon_id"), col("vec_id")).as("canon_id"))
      .withColumn("keep", col("canon_id") === col("vec_id"))
      .orderBy(col("vec_id"))
  }

  /** ANN via LSH buckets: anchors probe only their own bucket, then
    * exact cosine rank within the candidates. Output mirrors bruteTopK
    * (recall < 1 by construction; that is the documented trade).
    */
  def annTopK(embeddings: DataFrame, anchorIds: Seq[Long], k: Int,
      dims: Int = 64, nBits: Int = 8): DataFrame = {
    val dot = ndot(embeddings.sparkSession) _
    val bucketed = embeddings
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("norm"),
        lshBucket(col("embedding"), dims, nBits).as("bucket"))
    val anchors = bucketed
      .filter(col("vec_id").isin(anchorIds: _*))
      .select(col("vec_id").as("anchor_id"),
        col("embedding").as("anchor_emb"), col("norm").as("anchor_norm"),
        col("bucket"))
    val cands = bucketed.join(broadcast(anchors), Seq("bucket"))
      .filter(col("vec_id") =!= col("anchor_id"))
      .withColumn("cos_sim", round(
        dot(col("embedding"), col("anchor_emb")) /
          (col("norm") * col("anchor_norm")), 6))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("vec_id"), col("cos_sim"), col("rank"))
      .orderBy(col("anchor_id"), col("rank"))
  }
}
