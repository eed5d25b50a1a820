package graft.queries

import graft.functions.{Dedup, Similarity, TextFunctions => TF}

/** DuckDB twins of the pipeline queries. The portable-hash identity
  * (md5 prefix → BIGINT) makes even MinHash/SimHash/LSH exactly
  * reproducible in SQL: Spark `conv(substring(md5(x),1,15),16,10)` ==
  * DuckDB `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`.
  */
object PipelineOracles {

  /** Distinct 3-word shingle set from a words list `w` (DuckDB). */
  private val shingleSql =
    "list_distinct(list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' ')))"

  /** Affine minhash over the shared 32-bit hash array `hs` (one md5 per
    * shingle, mirroring Dedup.minhashColsFromHashes).
    */
  private def minhashExpr(seed: Int): String = {
    val (a, b) = Dedup.MinhashParams(seed)
    s"list_min(list_transform(hs, h -> ($a * h + $b) % ${Dedup.MinhashP}))"
  }

  private val hashedShinglesSql =
    s"list_transform($shingleSql, s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT))"

  private val docsWithWords =
    "SELECT doc_id, text, string_split(trim(text), ' ') AS w FROM documents"

  private def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  /** Sequential dot product of two 64-dim float lists (the DuckDB twin
    * of Sketches.fdot's left fold — q19 proves the parity).
    */
  private def vdot(x: String, y: String) =
    s"list_sum(list_transform(range(1, 65), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"

  /** Random-hyperplane LSH bucket of `embedding` from `rBits` sign
    * bits starting at plane `offset` — the plane components are inlined
    * from the same md5-seeded generator the Spark side ships as
    * literals (Similarity.planeSqlLiteral), so bucket membership is
    * bit-identical.
    */
  private def bandBucketSql(offset: Int, rBits: Int): String =
    (0 until rBits).map { j =>
      val pl = Similarity.planeSqlLiteral(offset + j, 64)
      s"""CASE WHEN list_sum(list_transform(range(1, 65),
         |    i -> CAST(embedding[i] AS DOUBLE) * CAST(($pl)[i] AS DOUBLE))) > 0
         |  THEN ${1L << j} ELSE 0 END""".stripMargin
    }.mkString("(", "\n + ", ")")

  private val bucketSql: String = bandBucketSql(0, 8)

  /** Squared euclidean distance of two integer-valued micro-unit
    * DOUBLE lists — every add is an exact integer op, so the
    * sequential list_sum equals the engine's long accumulation.
    */
  /** Force DuckDB to MATERIALIZE the named CTEs (`name AS (` →
    * `name AS MATERIALIZED (`). The unrolled quantizer chains
    * reference their shared roots many times and DuckDB v1.0 INLINES
    * every CTE reference — so a twin that composes two PQ chains
    * re-derives the whole coarse chain per subspace per chain:
    * measured 165 s (and an allocator OOM under the driver's
    * sequential compare) → 2.7 s on q55c, byte-identical rows. Only
    * the evaluation strategy changes, never results.
    */
  private def materialized(sql: String, names: Seq[String]): String =
    names.foldLeft(sql) { (acc, n) =>
      val out = acc.replaceAll(
        s"(?<![A-Za-z0-9_])${java.util.regex.Pattern.quote(n)} AS \\(",
        s"$n AS MATERIALIZED (")
      // A silent no-op here would quietly revert the twin to the
      // measured 165 s / allocator-OOM inlined evaluation — fail at
      // class-init instead (every spec run trips it) if the name list
      // drifts from the CTE generators.
      require(out != acc, s"materialized(): CTE '$n' not found in SQL")
      out
    }

  /** The multi-referenced CTE roots of a composed PQ/IVF replay under
    * prefix `pfx` (empty = the raw chain).
    */
  private def pqMatNames(pfx: String): Seq[String] =
    Seq(s"${pfx}psmp") ++
      (0 until 8).flatMap(j => Seq(s"${pfx}p${j}c2", s"${pfx}code$j"))

  private def sqDist(x: String, c: String): String =
    s"list_sum(list_transform(range(1, 65), i -> ($x[i]-$c[i])*($x[i]-$c[i])))"

  /** [[sqDist]] over the first `n` components (PQ subspace slices). */
  private def sqDistN(x: String, c: String, n: Int): String =
    s"list_sum(list_transform(range(1, ${n + 1}), i -> ($x[i]-$c[i])*($x[i]-$c[i])))"

  /** The PQ codebook family as unrolled CTEs — the DuckDB twin of
    * `Similarity.pqCodebooksMicro` + per-vector code assignment: the
    * SAME qe/smp as ivfCtes (same micro quantization, same
    * hash-ordered 512-sample), then per subspace j an independent
    * k-means chain over the slice xq[j·dsub+1 : (j+1)·dsub] (init =
    * first k sample slices, `iters` Lloyd rounds with exact integer
    * distances, strict-< ties to the lower cell, truncating `//`
    * means, emptied-cell carry) ending in `p{j}c{iters}` (the
    * codebook) and `code{j}` (each vector's nearest cell in that
    * subspace).
    */
  private def pqCtes(m: Int = 8, dsub: Int = 8, k: Int = 16,
      iters: Int = 2, sampleSize: Int = 512,
      withQe: Boolean = true, srcCte: String = "qe",
      srcCol: String = "xq", pfx: String = ""): String = {
    // srcCte/srcCol retarget the training input (q82b trains the SAME
    // chain on the residual CTE `re(vec_id, rq)` instead of qe.xq);
    // pfx renames every CTE so two PQ chains compose in one WITH
    // block (q55c replays the raw AND residual codebooks side by
    // side — the ivfCtes prefix convention).
    val hashOrd = "md5('ivf:' || CAST(vec_id AS VARCHAR)), vec_id"
    // The sample CTE is named psmp (not smp) so these CTEs compose
    // with ivfCtes in one WITH block (q82's IVFADC oracle needs both
    // quantizer families); withQe=false skips the shared `qe` CTE for
    // the same reason. PQ training samples the FULL corpus (q81's
    // contract), unlike ivfCtes' trainWhere-restricted smp.
    val qeCte =
      s"""qe AS (SELECT vec_id, embedding,
         |        list_transform(embedding, v -> round(CAST(v AS DOUBLE) * 1000000, 0)) AS xq,
         |        sqrt(${vdot("embedding", "embedding")}) AS norm
         |      FROM embeddings),
         |""".stripMargin
    val init =
      s"""${if (withQe) qeCte else ""}${pfx}psmp AS (SELECT row_number() OVER (ORDER BY $hashOrd) - 1 AS sidx, xq
         |       FROM (SELECT vec_id, $srcCol AS xq FROM $srcCte
         |             ORDER BY $hashOrd LIMIT $sampleSize))""".stripMargin
    val subs = (0 until m).map { j =>
      val a = j * dsub + 1; val b = (j + 1) * dsub
      val initJ =
        s"""${pfx}p${j}c0 AS (SELECT sidx AS cell, xq[$a:$b] AS cx
           |       FROM ${pfx}psmp WHERE sidx < $k)""".stripMargin
      val rounds = (1 to iters).map { r =>
        s"""${pfx}p${j}a$r AS (SELECT sidx, sxq, cell FROM (
           |    SELECT ${pfx}psmp.sidx, ${pfx}psmp.xq[$a:$b] AS sxq, c.cell,
           |      row_number() OVER (PARTITION BY ${pfx}psmp.sidx
           |        ORDER BY ${sqDistN(s"${pfx}psmp.xq[$a:$b]", "c.cx", dsub)}, c.cell) AS rn
           |    FROM ${pfx}psmp, ${pfx}p${j}c${r - 1} c) t WHERE rn = 1),
           |${pfx}p${j}m$r AS (SELECT cell, pos, CAST(sum(sxq[pos]) AS BIGINT) AS s, count(*) AS n
           |       FROM ${pfx}p${j}a$r CROSS JOIN range(1, ${dsub + 1}) t(pos) GROUP BY cell, pos),
           |${pfx}p${j}c$r AS (SELECT c.cell, coalesce(mm.cx, c.cx) AS cx
           |       FROM ${pfx}p${j}c${r - 1} c LEFT JOIN (
           |         SELECT cell, list(CAST(s // n AS DOUBLE) ORDER BY pos) AS cx
           |         FROM ${pfx}p${j}m$r GROUP BY cell) mm USING (cell))""".stripMargin
      }
      val codeJ =
        s"""${pfx}code$j AS (SELECT vec_id, cell FROM (
           |    SELECT src.vec_id, c.cell,
           |      row_number() OVER (PARTITION BY src.vec_id
           |        ORDER BY ${sqDistN(s"src.$srcCol[$a:$b]", "c.cx", dsub)}, c.cell) AS rn
           |    FROM $srcCte src, ${pfx}p${j}c$iters c) t WHERE rn = 1)""".stripMargin
      (Seq(initJ) ++ rounds :+ codeJ).mkString(",\n")
    }
    (Seq(init) ++ subs).mkString(",\n")
  }

  /** ADC scoring as CTEs over [[pqCtes]]'s outputs plus an `anch`
    * CTE (anchor_id, axq [, …]) the caller defines: `sc` — one row
    * per (anchor, vec, subspace) with the exact integer table dot
    * `sd` and reconstructed-norm term `nr` (the codebook-centroid
    * joins ARE the lookup tables); `tot` — the per-(anchor, vec)
    * BIGINT sums; `an2` — the anchor's exact squared norm. Shared by
    * q81 (flat PQ) and q82 (IVFADC).
    */
  private def adcScoreCtes(m: Int = 8, dsub: Int = 8,
      iters: Int = 2, pfx: String = ""): String = {
    val unions = (0 until m).map { j =>
      val off = j * dsub + 1
      s"""      SELECT a.anchor_id, k.vec_id,
         |        list_sum(list_transform(range(1, ${dsub + 1}), i -> a.axq[$off + i - 1] * c.cx[i])) AS sd,
         |        list_sum(list_transform(range(1, ${dsub + 1}), i -> c.cx[i] * c.cx[i])) AS nr
         |      FROM ${pfx}code$j k JOIN ${pfx}p${j}c$iters c USING (cell), anch a""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""${pfx}sc AS (
       |$unions),
       |${pfx}tot AS (SELECT anchor_id, vec_id, CAST(sum(sd) AS BIGINT) AS sdot,
       |          CAST(sum(nr) AS BIGINT) AS nrec
       |        FROM ${pfx}sc WHERE vec_id <> anchor_id GROUP BY anchor_id, vec_id),
       |${pfx}an2 AS (SELECT anchor_id,
       |          list_sum(list_transform(range(1, ${m * dsub + 1}), i -> axq[i] * axq[i])) AS anorm2
       |        FROM anch)""".stripMargin
  }

  /** ADC scoring with RESIDUAL reconstruction (q82b) — like
    * [[adcScoreCtes]] but each candidate's subspace reconstruction is
    * coarse-centroid-slice + residual codeword (cc.cx[off+i-1] +
    * c.cx[i]), so both the table dot and the reconstructed norm fold
    * the candidate's own cell in. Joins `asg` (the candidate's coarse
    * cell) and `c{iters}` (the coarse centroids) per subspace; all
    * arithmetic stays exact-integer-in-DOUBLE.
    */
  private def adcResidualScoreCtes(m: Int = 8, dsub: Int = 8,
      iters: Int = 2, pfx: String = ""): String = {
    val unions = (0 until m).map { j =>
      val off = j * dsub + 1
      s"""      SELECT a.anchor_id, k.vec_id,
         |        list_sum(list_transform(range(1, ${dsub + 1}), i -> a.axq[$off + i - 1] * (cc.cx[$off + i - 1] + c.cx[i]))) AS sd,
         |        list_sum(list_transform(range(1, ${dsub + 1}), i -> (cc.cx[$off + i - 1] + c.cx[i]) * (cc.cx[$off + i - 1] + c.cx[i]))) AS nr
         |      FROM ${pfx}code$j k JOIN ${pfx}p${j}c$iters c USING (cell)
         |        JOIN asg ag ON k.vec_id = ag.vec_id
         |        JOIN c$iters cc ON ag.cell = cc.cell, anch a""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""${pfx}sc AS (
       |$unions),
       |${pfx}tot AS (SELECT anchor_id, vec_id, CAST(sum(sd) AS BIGINT) AS sdot,
       |          CAST(sum(nr) AS BIGINT) AS nrec
       |        FROM ${pfx}sc WHERE vec_id <> anchor_id GROUP BY anchor_id, vec_id),
       |${pfx}an2 AS (SELECT anchor_id,
       |          list_sum(list_transform(range(1, ${m * dsub + 1}), i -> axq[i] * axq[i])) AS anorm2
       |        FROM anch)""".stripMargin
  }

  /** The deterministic sample-trained micro-integer k-means coarse
    * quantizer as an unrolled CTE chain — the DuckDB twin of
    * `Similarity.kmeansCentroidsMicro` + final assignment. Produces:
    *   qe  — corpus with xq (micro-quantized embedding) and norm;
    *   smp — the training sample: the `sampleSize` vectors first in
    *         md5('ivf:'||vec_id) order (uniform deterministic sample);
    *   c0  — init centroids: the first nCells sample vectors;
    *   aR/mR/cR per Lloyd round R over the SAMPLE — assignment
    *         (argmin exact integer distance, tiebreak by cell),
    *         per-(cell,dim) BIGINT sums, truncating-mean centroids
    *         (an emptied cell keeps its previous centroid via the
    *         whole-list coalesce);
    *   asg — final per-corpus-vector assignment against c{iters}.
    * All arithmetic is exact-integer-in-DOUBLE (sums ≪ 2^53) plus
    * BIGINT `//`, which truncates toward zero exactly like the
    * engine's Long division — bit-identical replay, no float-mean
    * agreement assumption.
    */
  private def ivfCtes(nCells: Int, iters: Int,
      sampleSize: Int = 512, trainWhere: String = "",
      prefix: String = "", withQe: Boolean = true): String = {
    // `prefix` renames every CTE except the shared `qe` so two
    // quantizer chains compose in one WITH block (q25c replays the
    // stale corpus-trained AND the retrained quantizer side by side);
    // withQe=false skips `qe` for the second chain.
    val p = prefix
    val hashOrd = "md5('ivf:' || CAST(vec_id AS VARCHAR)), vec_id"
    val qeCte =
      s"""qe AS (SELECT vec_id, embedding,
         |        list_transform(embedding, v -> round(CAST(v AS DOUBLE) * 1000000, 0)) AS xq,
         |        sqrt(${vdot("embedding", "embedding")}) AS norm
         |      FROM embeddings),
         |""".stripMargin
    val init =
      s"""${if (withQe) qeCte else ""}${p}smp AS (SELECT row_number() OVER (ORDER BY $hashOrd) - 1 AS sidx, xq
         |       FROM (SELECT vec_id, xq FROM qe $trainWhere
         |             ORDER BY $hashOrd LIMIT $sampleSize)),
         |${p}c0 AS (SELECT sidx AS cell, xq AS cx FROM ${p}smp WHERE sidx < $nCells)""".stripMargin
    val rounds = (1 to iters).map { r =>
      s"""${p}a$r AS (SELECT sidx, xq, cell FROM (
         |    SELECT ${p}smp.sidx, ${p}smp.xq, c.cell,
         |      row_number() OVER (PARTITION BY ${p}smp.sidx
         |        ORDER BY ${sqDist(s"${p}smp.xq", "c.cx")}, c.cell) AS rn
         |    FROM ${p}smp, ${p}c${r - 1} c) t WHERE rn = 1),
         |${p}m$r AS (SELECT cell, pos, CAST(sum(xq[pos]) AS BIGINT) AS s, count(*) AS n
         |       FROM ${p}a$r CROSS JOIN range(1, 65) t(pos) GROUP BY cell, pos),
         |${p}c$r AS (SELECT c.cell, coalesce(mm.cx, c.cx) AS cx
         |       FROM ${p}c${r - 1} c LEFT JOIN (
         |         SELECT cell, list(CAST(s // n AS DOUBLE) ORDER BY pos) AS cx
         |         FROM ${p}m$r GROUP BY cell) mm USING (cell))""".stripMargin
    }
    val fin =
      s"""${p}asg AS (SELECT vec_id, embedding, norm, cell FROM (
         |    SELECT qe.vec_id, qe.embedding, qe.norm, c.cell,
         |      row_number() OVER (PARTITION BY qe.vec_id
         |        ORDER BY ${sqDist("qe.xq", "c.cx")}, c.cell) AS rn
         |    FROM qe, ${p}c$iters c) t WHERE rn = 1)""".stripMargin
    (Seq(init) ++ rounds :+ fin).mkString(",\n")
  }

  /** q15's banded-LSH + exact-Jaccard pair pipeline as a CTE block —
    * the final CTE `v` holds (doc_a, doc_b, jaccard) candidates.
    * Shared by the q15 oracle and the q34 dedup-apply oracle.
    */
  /** The banded-LSH + exact-Jaccard pair pipeline as a CTE block, for
    * ANY (k, bands, shingleN) — the DuckDB twin of
    * `Dedup.lshNearDupPairs` at the same knobs (same affine family by
    * index, same band slicing, same exact verify). The final CTE `v`
    * holds (doc_a, doc_b, jaccard) candidates.
    */
  /** Full ANN recall@3 report at a given probe budget — q55 (nProbe=2)
    * and q55b (nProbe=1) differ only in the `rn <=` bound.
    */
  private def annRecallSql(nProbe: Int): String =
    s"""WITH ${ivfCtes(16, 2)},
       |probe AS (SELECT anchor_id, aemb, anorm, cell FROM (
       |    SELECT qe.vec_id AS anchor_id, qe.embedding AS aemb,
       |      qe.norm AS anorm, c.cell,
       |      row_number() OVER (PARTITION BY qe.vec_id
       |        ORDER BY ${sqDist("qe.xq", "c.cx")}, c.cell) AS rn
       |    FROM qe, c2 c WHERE qe.vec_id IN (0, 1, 2)) t WHERE rn <= $nProbe),
       |ann AS (SELECT anchor_id, vec_id FROM (
       |    SELECT anchor_id, s.vec_id,
       |      row_number() OVER (PARTITION BY anchor_id
       |        ORDER BY cos_sim DESC, s.vec_id) AS rank
       |    FROM (SELECT anchor_id, asg.vec_id AS vec_id,
       |            round(${vdot("asg.embedding", "aemb")} / (asg.norm * anorm), 6) AS cos_sim
       |          FROM asg JOIN probe USING (cell)
       |          WHERE asg.vec_id <> anchor_id) s) r
       |  WHERE rank <= 3),
       |anch AS (SELECT vec_id AS anchor_id, embedding AS aemb, norm AS anorm
       |         FROM qe WHERE vec_id IN (0, 1, 2)),
       |ex AS (SELECT anchor_id, vec_id FROM (
       |    SELECT anchor_id, s.vec_id,
       |      row_number() OVER (PARTITION BY anchor_id
       |        ORDER BY cos_sim DESC, s.vec_id) AS rank
       |    FROM (SELECT anchor_id, qe.vec_id AS vec_id,
       |            round(${vdot("qe.embedding", "aemb")} / (qe.norm * anorm), 6) AS cos_sim
       |          FROM qe, anch WHERE qe.vec_id <> anchor_id) s) r
       |  WHERE rank <= 3),
       |h AS (SELECT ex.anchor_id,
       |        CAST(count(*) AS BIGINT) AS n_exact,
       |        CAST(count(ann.vec_id) AS BIGINT) AS n_hits
       |      FROM ex LEFT JOIN ann USING (anchor_id, vec_id)
       |      GROUP BY ex.anchor_id)
       |SELECT anchor_id, n_exact, n_hits,
       |  CAST((n_hits * 20000 + n_exact) // (2 * n_exact) AS DOUBLE) / 10000.0 AS recall
       |FROM h ORDER BY anchor_id""".stripMargin

  private def pairCtes(k: Int, bands: Int, shingleN: Int): String = {
    require(k % bands == 0, s"bands=$bands must divide k=$k")
    require(shingleN >= 2, // n=1 would render "len(w)--1" below
      s"shingleN=$shingleN must be >= 2")
    val rows = k / bands
    val sigList = (0 until k).map(minhashExpr).mkString("[", ", ", "]")
    val shSql = s"list_distinct(list_transform(range(1, len(w)-${shingleN - 2}), " +
      s"i -> array_to_string(w[i:i+${shingleN - 1}], ' ')))"
    s"""d AS (SELECT doc_id, $shSql AS sh FROM ($docsWithWords) d0
       |           WHERE len(w) >= $shingleN),
       |h AS (SELECT doc_id, sh, list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS hs FROM d),
       |m AS (SELECT doc_id, sh, $sigList AS sig FROM h),
       |b AS (SELECT doc_id, j AS band,
       |        md5(array_to_string(sig[$rows*j+1:$rows*j+$rows], '|')) AS band_hash
       |      FROM m, UNNEST(range(0, $bands)) AS t(j)),
       |p AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |      FROM b x JOIN b y
       |        ON x.band = y.band AND x.band_hash = y.band_hash
       |       AND x.doc_id < y.doc_id),
       |v AS (SELECT doc_a, doc_b,
       |        round(CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE) /
       |          (len(da.sh) + len(db.sh) - CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)), 4) AS jaccard
       |      FROM p JOIN d da ON p.doc_a = da.doc_id
       |             JOIN d db ON p.doc_b = db.doc_id)""".stripMargin
  }

  private val q15PairCtes: String = pairCtes(16, 4, 3)

  /** q46's cascade as a reusable CTE block ending in
    * `fc(doc_id, n_tokens, too_short, high_punct, low_stopwords,
    * repetitive, keep, reject_reason)` — shared by q46 and the q53
    * recipe.
    */
  private val q46CascadeCtes: String =
    s"""sig AS (SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len(w) AS BIGINT) AS n_tokens,
       |    CAST(len(regexp_extract_all(lower(text), '[^a-z0-9 ]', 0)) AS BIGINT) AS n_punct,
       |    CAST(len(list_filter(w, t -> t IN (${inList(TF.StopwordsEn)}))) AS BIGINT) AS n_stop
       |  FROM ($docsWithWords) d0),
       |g AS (SELECT doc_id,
       |    list_transform(range(1, len(w)),
       |      i -> array_to_string(w[i:i+1], ' ')) AS g
       |  FROM ($docsWithWords) d1 WHERE len(w) >= 2),
       |rep AS (SELECT doc_id, CAST(len(g) AS BIGINT) AS n_bigrams,
       |    CAST(list_max(list_transform(list_distinct(g),
       |      u -> len(list_filter(g, x -> x = u)))) AS BIGINT) AS mx
       |  FROM g),
       |fc0 AS (SELECT s.doc_id, s.n_tokens,
       |    s.n_tokens < 20 AS too_short,
       |    s.n_punct * 5 > s.n_chars AS high_punct,
       |    s.n_stop * 50 < s.n_tokens AS low_stopwords,
       |    coalesce(r.mx * 10 > r.n_bigrams, FALSE) AS repetitive
       |  FROM sig s LEFT JOIN rep r ON s.doc_id = r.doc_id),
       |fc AS (SELECT doc_id, n_tokens, too_short, high_punct, low_stopwords, repetitive,
       |  NOT (too_short OR high_punct OR low_stopwords OR repetitive) AS keep,
       |  CASE WHEN too_short THEN 'too_short'
       |       WHEN high_punct THEN 'high_punct'
       |       WHEN low_stopwords THEN 'low_stopwords'
       |       WHEN repetitive THEN 'repetitive'
       |       ELSE '' END AS reject_reason
       |  FROM fc0)""".stripMargin

  private val q15PairsSql: String =
    s"""WITH $q15PairCtes
       |SELECT doc_a, doc_b, jaccard FROM v WHERE jaccard >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q79: span hashes replayed with the same md5-prefix (identical even
    * under a collision), one count per hash, per-doc fold, rdiv4 ratio.
    */
  private val q79SubstringSql: String =
    s"""WITH g AS (
       |  SELECT doc_id, CAST(len(w) - 15 AS BIGINT) AS n_spans,
       |    unnest(list_transform(range(1, len(w) - 14),
       |      i -> CAST('0x' || substr(md5(array_to_string(w[i:i+15], ' ')), 1, 15) AS BIGINT))) AS gh
       |  FROM ($docsWithWords) d WHERE len(w) >= 16),
       |c AS (SELECT gh, count(*) AS cnt FROM g GROUP BY gh),
       |r AS (SELECT g.doc_id, g.n_spans,
       |        CAST(sum(CASE WHEN c.cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
       |      FROM g JOIN c USING (gh) GROUP BY g.doc_id, g.n_spans)
       |SELECT doc_id, n_spans, n_dup_spans,
       |  CAST((n_dup_spans * 20000 + n_spans) // (2 * n_spans) AS DOUBLE) / 10000.0 AS dup_ratio
       |FROM r ORDER BY doc_id""".stripMargin

  /** q79c: the scrub replayed relationally — same span hashes, cnt>=2
    * dictionary, duplicated starts exploded to covered (doc, position)
    * rows, anti-join against positioned tokens, ordered string_agg
    * rebuild. Docs losing every token keep a row with ''.
    */
  private val q79cScrubSql: String =
    s"""WITH d AS (SELECT doc_id, w FROM ($docsWithWords) d0),
       |g AS (
       |  SELECT doc_id, u.start AS start, u.gh AS gh FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(w) - 14),
       |      i -> {'start': i,
       |            'gh': CAST('0x' || substr(md5(array_to_string(w[i:i+15], ' ')), 1, 15) AS BIGINT)})) AS u
       |    FROM d WHERE len(w) >= 16) t),
       |c AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
       |ds AS (SELECT g.doc_id, g.start FROM g JOIN c USING (gh)),
       |cov AS (SELECT DISTINCT doc_id, start + o AS p
       |        FROM ds, LATERAL (SELECT unnest(range(0, 16)) AS o) r2),
       |tok AS (
       |  SELECT doc_id, u.p AS p, u.tok AS tok FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(w) + 1),
       |      i -> {'p': i, 'tok': w[i]})) AS u
       |    FROM d) t),
       |kept AS (SELECT t.doc_id, t.p, t.tok FROM tok t
       |         ANTI JOIN cov ON t.doc_id = cov.doc_id AND t.p = cov.p),
       |r AS (SELECT doc_id, count(*) AS kept,
       |        string_agg(tok, ' ' ORDER BY p) AS cleaned
       |      FROM kept GROUP BY doc_id)
       |SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(r.kept, 0) AS BIGINT) AS n_tokens_kept,
       |  coalesce(r.cleaned, '') AS cleaned_text
       |FROM d LEFT JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin

  /** q76: the incremental path must equal the FULL recompute restricted
    * to pairs touching an arrival (doc_id % 10 = 0) — the staged-index
    * correctness contract.
    */
  private val q76IncrementalSql: String =
    s"""WITH $q15PairCtes
       |SELECT doc_a, doc_b, jaccard FROM v
       |WHERE jaccard >= 0.8 AND (doc_a % 10 = 0 OR doc_b % 10 = 0)
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q76b: the growing-index replay must equal the FULL recompute
    * restricted to pairs touching either arrival batch (doc_id % 10
    * in (0, 1)) — within-batch pairs via the self-band, cross-batch
    * and corpus pairs via the appended segments.
    */
  private val q76bGrowingSql: String =
    s"""WITH $q15PairCtes
       |SELECT doc_a, doc_b, jaccard FROM v
       |WHERE jaccard >= 0.8 AND (doc_a % 10 <= 1 OR doc_b % 10 <= 1)
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q17's integer-exact quality twin: every ratio is a half-up
    * integer division ((2a·10^4 + b) // 2b) widened to double at the
    * end — no round(DOUBLE) anywhere, so the 4th-decimal boundary
    * cannot split between engines (it did at sf0.1 before this).
    * A val because q60's quota ranking reuses it as a subquery.
    */
  private val q17Sql: String =
    s"""WITH q AS (SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS c,
       |    CAST(len(w) AS BIGINT) AS t,
       |    CAST(len(regexp_extract_all(lower(text), '[^a-z0-9 ]', 0)) AS BIGINT) AS p,
       |    CAST(len(list_filter(w, x -> x IN (${inList(TF.StopwordsEn)}))) AS BIGINT) AS st
       |  FROM ($docsWithWords) d0),
       |m AS (SELECT doc_id, c, t, p, st,
       |    least(100, t) * 10000 AS t1,
       |    ((c - p) * 2000000 + c) // (2 * c) AS t2,
       |    (st * 2000000 + t) // (2 * t) AS t3,
       |    (least(8 * t, c) * 2000000 + 8 * t) // (16 * t) AS t4
       |  FROM q)
       |SELECT doc_id, c AS n_chars, t AS n_tokens,
       |  CAST((c * 20000 + t) // (2 * t) AS DOUBLE) / 10000.0 AS mean_tok_len,
       |  CAST((p * 20000 + c) // (2 * c) AS DOUBLE) / 10000.0 AS punct_ratio,
       |  CAST((st * 20000 + t) // (2 * t) AS DOUBLE) / 10000.0 AS stop_ratio,
       |  CAST(((t1 + t2 + t3 + t4) * 2 + 400) // 800 AS DOUBLE) / 10000.0 AS quality_score
       |FROM m ORDER BY doc_id""".stripMargin

  val sql: Map[String, String] = Map(
    "q11_token_stats" ->
      s"""SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS BIGINT) AS n_bpe_tokens,
         |  CAST(length(text) AS BIGINT) AS n_chars_computed
         |FROM ($docsWithWords) ORDER BY doc_id""".stripMargin,

    "q12_dedup_exact" ->
      """SELECT CAST(sum(n) AS BIGINT) AS n_docs,
        |  count(*) AS n_distinct_texts,
        |  count(*) FILTER (WHERE n > 1) AS n_dup_groups,
        |  CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_docs
        |FROM (SELECT md5(text) AS h, count(*) AS n FROM documents GROUP BY 1) t""".stripMargin,

    "q13_fingerprint_dups" ->
      """SELECT fp, count(*) AS n_docs, min(doc_id) AS min_doc_id
        |FROM (SELECT doc_id,
        |        md5(array_to_string(list_sort(list_distinct(string_split(trim(text), ' '))), ' ')) AS fp
        |      FROM documents) t
        |GROUP BY fp HAVING count(*) > 1 ORDER BY min_doc_id""".stripMargin,

    "q14_minhash_sig" -> {
      val cols = (0 until 16).map(i => f"  ${minhashExpr(i)} AS mh$i%02d")
      s"""SELECT doc_id,
         |${cols.mkString(",\n")}
         |FROM (SELECT doc_id, $hashedShinglesSql AS hs FROM ($docsWithWords) d0)
         |ORDER BY doc_id""".stripMargin
    },

    "q15_lsh_near_dups" -> q15PairsSql,
    "q76_incremental_dedup" -> q76IncrementalSql,
    "q76b_growing_index_dedup" -> q76bGrowingSql,
    // q76c shares q76b's oracle verbatim — compaction must reproduce
    // the incremental pair set row-identically (the q79/q79b
    // convention).
    "q76c_compacted_index_dedup" -> q76bGrowingSql,
    // q80: the ingest-gate stream-static probe — q15 pairs with
    // exactly one arrival endpoint (arrival x corpus only; the
    // within-arrival family is q76's self-band, not probed here).
    "q80_stream_corpus_probe" ->
      s"""WITH $q15PairCtes
         |SELECT doc_a, doc_b, jaccard FROM v
         |WHERE jaccard >= 0.8 AND ((doc_a % 10 = 0) <> (doc_b % 10 = 0))
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q79_substring_dedup" -> q79SubstringSql,
    // q79b shares q79's oracle verbatim — the two-phase plan must be
    // row-identical to the window baseline.
    "q79b_substring_dedup_2ph" -> q79SubstringSql,
    "q79c_substring_scrub" -> q79cScrubSql,

    // q54: the q15 pipeline at a second (k, bands, n, threshold)
    // operating point — same CTE generator, different knobs; proves
    // the banded-LSH family is tunable end-to-end on both engines.
    "q54_lsh_tuned" ->
      s"""WITH ${pairCtes(32, 8, 2)}
         |SELECT doc_a, doc_b, jaccard FROM v WHERE jaccard >= 0.7
         |ORDER BY doc_a, doc_b""".stripMargin,

    // q56: the corpus-as-bigram-LM fluency score — per-DISTINCT-bigram
    // integer micro-unit −log10 P(w2|w1) (continuation counts), per-doc
    // occurrence sum, q40's exact average formula.
    "q56_bigram_lm" ->
      s"""WITH g AS (SELECT doc_id,
         |    list_transform(range(1, len(w)), i -> [w[i], w[i+1]]) AS bs
         |  FROM ($docsWithWords) d0 WHERE len(w) >= 2),
         |b AS (SELECT doc_id, unnest(bs) AS bg FROM g),
         |bc AS (SELECT bg, count(*) AS cb FROM b GROUP BY bg),
         |uc AS (SELECT bg[1] AS w1, sum(cb) AS cu FROM bc GROUP BY bg[1]),
         |sm AS (SELECT bg, CAST(round(log10(CAST(cu AS DOUBLE) / cb) * 1e6)
         |         AS BIGINT) AS sm
         |       FROM bc JOIN uc ON bc.bg[1] = uc.w1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(sm) AS BIGINT) AS surprisal_micro,
         |  CAST((CAST(sum(sm) AS BIGINT) * 20000 + count(*) * 1000000)
         |    // (2 * count(*) * 1000000) AS DOUBLE) / 10000.0 AS avg_bigram_surprisal
         |FROM b JOIN sm USING (bg)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q56b: the pruned operating point — top-8 continuations per w1
    // (count-desc, w2 asc tiebreak; both engines compare ASCII words
    // byte-wise), full-cu surprisal on the survivors, fixed 6e6-micro
    // OOV surprisal on everything else.
    "q56b_bigram_lm_pruned" ->
      s"""WITH g AS (SELECT doc_id,
         |    list_transform(range(1, len(w)), i -> [w[i], w[i+1]]) AS bs
         |  FROM ($docsWithWords) d0 WHERE len(w) >= 2),
         |b AS (SELECT doc_id, unnest(bs) AS bg FROM g),
         |bc AS (SELECT bg, count(*) AS cb FROM b GROUP BY bg),
         |uc AS (SELECT bg[1] AS w1, sum(cb) AS cu FROM bc GROUP BY bg[1]),
         |tk AS (SELECT bg, cb, row_number() OVER (PARTITION BY bg[1]
         |         ORDER BY cb DESC, bg[2]) AS rk FROM bc),
         |sm AS (SELECT bg, CAST(round(log10(CAST(cu AS DOUBLE) / cb) * 1e6)
         |         AS BIGINT) AS sm
         |       FROM tk JOIN uc ON tk.bg[1] = uc.w1 WHERE rk <= 8)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(count(*) - count(sm.sm) AS BIGINT) AS n_oov,
         |  CAST(sum(coalesce(sm.sm, 6000000)) AS BIGINT) AS surprisal_micro,
         |  CAST((CAST(sum(coalesce(sm.sm, 6000000)) AS BIGINT) * 20000
         |      + count(*) * 1000000)
         |    // (2 * count(*) * 1000000) AS DOUBLE) / 10000.0
         |    AS avg_bigram_surprisal
         |FROM b LEFT JOIN sm USING (bg)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q55: recall@3 of the IVF ANN (q25's quantizer CTEs + 2-cell
    // probe) against the exact per-anchor top-3; the recall ratio is
    // the same exact half-up integer division as the engine's rdiv4.
    "q55_ann_recall" -> annRecallSql(nProbe = 2),
    // q55b: the same report at a 1-cell probe budget (rn <= 1) — the
    // second point on the ANN cost/recall curve.
    "q55b_ann_recall_probe1" -> annRecallSql(nProbe = 1),

    "q16_simhash" ->
      s"""SELECT doc_id, CAST(
         |  list_sum(list_transform(range(0, 32), j ->
         |    CASE WHEN list_sum(list_transform(hw, h ->
         |           CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |         THEN 1 << j ELSE 0 END)) AS BIGINT) AS simhash32
         |FROM (SELECT doc_id,
         |        list_transform(w, t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)) AS hw
         |      FROM ($docsWithWords) d0)
         |ORDER BY doc_id""".stripMargin,

    "q30_simhash_dups" ->
      s"""WITH sh AS (
         |  SELECT doc_id, CAST(
         |    list_sum(list_transform(range(0, 32), j ->
         |      CASE WHEN list_sum(list_transform(hw, h ->
         |             CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |           THEN 1 << j ELSE 0 END)) AS BIGINT) AS h
         |  FROM (SELECT doc_id,
         |          list_transform(w, t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)) AS hw
         |        FROM ($docsWithWords) d0)),
         |k AS (SELECT doc_id, j AS band, (h >> (8*j)) & 255 AS bucket
         |      FROM sh, UNNEST(range(0, 4)) AS t(j)),
         |p AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |      FROM k x JOIN k y ON x.band = y.band AND x.bucket = y.bucket
         |       AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(bit_count(xor(sa.h, sb.h)) AS BIGINT) AS hamming
         |FROM p JOIN sh sa ON doc_a = sa.doc_id
         |       JOIN sh sb ON doc_b = sb.doc_id
         |WHERE bit_count(xor(sa.h, sb.h)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q17_quality" -> q17Sql,

    // q60: the curation SELECTION step — exactly N docs per source,
    // ranked by q17's engine-exact quality score (DESC, doc_id ASC
    // tiebreak). Reuses the q17 oracle verbatim as the scoring
    // subquery, so the two entries can never drift apart.
    "q60_stratified_quota" ->
      s"""WITH sc AS (SELECT doc_id, quality_score FROM ($q17Sql) q17),
         |r AS (SELECT d.doc_id, d.source, sc.quality_score,
         |        row_number() OVER (PARTITION BY d.source
         |          ORDER BY sc.quality_score DESC, d.doc_id) AS rank
         |      FROM documents d JOIN sc ON d.doc_id = sc.doc_id)
         |SELECT doc_id, source, quality_score, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 25 ORDER BY source, rank""".stripMargin,

    "q18_lang_id" -> {
      val scoreCols = TF.LangMarkers.map { case (lang, ms) =>
        s"  len(list_filter(w, t -> t IN (${inList(ms)}))) AS n_$lang"
      }
      val caseArms = TF.LangMarkers.map { case (lang, _) =>
        s"WHEN n_$lang = mx THEN '$lang'"
      }
      s"""SELECT doc_id, CASE WHEN mx = 0 THEN 'und' ${caseArms.mkString(" ")} ELSE 'und' END AS lang_pred
         |FROM (SELECT doc_id, n_en, n_de, n_es, n_fr, n_zh,
         |        greatest(n_en, n_de, n_es, n_fr, n_zh) AS mx
         |      FROM (SELECT doc_id,
         |${scoreCols.mkString(",\n")}
         |            FROM ($docsWithWords) d0) s) t
         |ORDER BY doc_id""".stripMargin
    },

    "q19_knn_brute" -> {
      def dot(x: String, y: String) =
        s"list_sum(list_transform(range(1, 65), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
      s"""WITH a AS (SELECT vec_id AS anchor_id, embedding AS aemb
         |           FROM embeddings WHERE vec_id IN (0, 1, 2)),
         |s AS (SELECT anchor_id, vec_id,
         |        round(${dot("embedding", "aemb")} /
         |          (sqrt(${dot("embedding", "embedding")}) * sqrt(${dot("aemb", "aemb")})), 6) AS cos_sim
         |      FROM embeddings, a WHERE vec_id <> anchor_id)
         |SELECT anchor_id, vec_id, cos_sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY anchor_id
         |    ORDER BY cos_sim DESC, vec_id) AS rank FROM s) r
         |WHERE rank <= 5 ORDER BY anchor_id, rank""".stripMargin
    },

    "q24_embedding_dups" -> {
      def dot(x: String, y: String) =
        s"list_sum(list_transform(range(1, 65), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
      s"""WITH n AS (SELECT vec_id, embedding,
         |             sqrt(${dot("embedding", "embedding")}) AS nrm
         |           FROM embeddings)
         |SELECT vec_id_a, vec_id_b, cos_sim FROM (
         |  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         |    round(${dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cos_sim
         |  FROM n a JOIN n b ON a.vec_id < b.vec_id) p
         |WHERE cos_sim >= 0.45 ORDER BY vec_id_a, vec_id_b""".stripMargin
    },

    "q20_emb_label_stats" ->
      """SELECT label, count(*) AS n_vecs,
        |  CAST(sum(CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS sum_c1_micro,
        |  CAST(sum(CAST(round(CAST(embedding[2] AS DOUBLE) * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS sum_c2_micro
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

    "q22_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_hash,
        |  CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
        |  CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |  CAST(octet_length(encode(text)) % 480 AS INTEGER) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q23_stream_hourly" ->
      """SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS hour_us,
        |  event_type, count(*) AS n_events
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Append-mode twin of q23: an hour bucket is emitted only once the
    // final watermark (ms-floored max event time minus 1 h — the same
    // boundary q37b's oracle models) has passed its END, so the oracle
    // is the batch hourly aggregate filtered to closed hours.
    "q23b_stream_hourly_append" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |wm AS (SELECT ((max(us) // 1000) - 3600000) * 1000 AS wm_us FROM e)
        |SELECT us - (us % 3600000000) AS hour_us,
        |  event_type, count(*) AS n_events
        |FROM e
        |GROUP BY 1, 2
        |HAVING hour_us + 3600000000 <= (SELECT wm_us FROM wm)
        |ORDER BY 1, 2""".stripMargin,

    "q21_ann_lsh" ->
      s"""WITH b AS (SELECT vec_id, embedding,
         |             sqrt(${vdot("embedding", "embedding")}) AS norm,
         |             $bucketSql AS bucket
         |           FROM embeddings),
         |a AS (SELECT vec_id AS anchor_id, embedding AS aemb,
         |        norm AS anorm, bucket
         |      FROM b WHERE vec_id IN (0, 1, 2)),
         |s AS (SELECT anchor_id, b.vec_id AS vec_id,
         |        round(${vdot("b.embedding", "aemb")} / (b.norm * anorm), 6) AS cos_sim
         |      FROM b JOIN a USING (bucket) WHERE b.vec_id <> anchor_id)
         |SELECT anchor_id, vec_id, cos_sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY anchor_id
         |    ORDER BY cos_sim DESC, vec_id) AS rank FROM s) r
         |WHERE rank <= 3 ORDER BY anchor_id, rank""".stripMargin,

    // q81: the PQ/ADC twin — 8 subspace codebooks replayed with the
    // pqCtes machinery, per-vector codes, anchor-side table dots, the
    // reconstructed-norm cosine, top-8 by PQ score, exact re-rank.
    "q81_ann_pq" ->
      s"""WITH ${pqCtes()},
         |anch AS (SELECT vec_id AS anchor_id, xq AS axq,
         |         embedding AS aemb, norm AS anorm
         |         FROM qe WHERE vec_id IN (0, 1, 2)),
         |${adcScoreCtes()},
         |pqs AS (SELECT t.anchor_id, t.vec_id,
         |          round(CAST(t.sdot AS DOUBLE) /
         |            (sqrt(CAST(an2.anorm2 AS DOUBLE)) * sqrt(CAST(t.nrec AS DOUBLE))), 6) AS cos_pq
         |        FROM tot t JOIN an2 USING (anchor_id)),
         |top AS (SELECT anchor_id, vec_id, cos_pq FROM (
         |        SELECT *, row_number() OVER (PARTITION BY anchor_id
         |          ORDER BY cos_pq DESC, vec_id) AS qrank FROM pqs) t
         |        WHERE qrank <= 8),
         |rr AS (SELECT top.anchor_id, top.vec_id, top.cos_pq,
         |        round(${vdot("qe.embedding", "a.aemb")} / (qe.norm * a.anorm), 6) AS cos_sim
         |      FROM top JOIN qe ON top.vec_id = qe.vec_id
         |        JOIN anch a ON top.anchor_id = a.anchor_id)
         |SELECT anchor_id, rank, vec_id, cos_pq, cos_sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY anchor_id
         |    ORDER BY cos_sim DESC, vec_id) AS rank FROM rr) r
         |WHERE rank <= 3 ORDER BY anchor_id, rank""".stripMargin,

    // q25c: IVF re-train + compact — BOTH quantizer generations
    // replayed in one WITH block (stale corpus-trained chain under
    // default names, retrained full-table chain under prefix "r"),
    // exact top-3 per anchor, and the q55 recall arithmetic applied
    // to each generation's probe.
    "q25c_ann_ivf_retrain" ->
      s"""WITH ${ivfCtes(16, 2, 512, "WHERE vec_id % 10 <> 0")},
         |${ivfCtes(16, 2, 512, "", prefix = "r", withQe = false)},
         |anch AS (SELECT vec_id AS anchor_id, embedding AS aemb,
         |           norm AS anorm, xq AS axq
         |         FROM qe WHERE vec_id IN (0, 1, 2)),
         |ex AS (SELECT anchor_id, vec_id FROM (
         |    SELECT anchor_id, s.vec_id,
         |      row_number() OVER (PARTITION BY anchor_id
         |        ORDER BY cos_sim DESC, s.vec_id) AS rank
         |    FROM (SELECT anchor_id, qe.vec_id AS vec_id,
         |            round(${vdot("qe.embedding", "aemb")} / (qe.norm * anorm), 6) AS cos_sim
         |          FROM qe, anch WHERE qe.vec_id <> anchor_id) s) r
         |  WHERE rank <= 3),
         |probeb AS (SELECT anchor_id, aemb, anorm, cell FROM (
         |    SELECT a.anchor_id, a.aemb, a.anorm, c.cell,
         |      row_number() OVER (PARTITION BY a.anchor_id
         |        ORDER BY ${sqDist("a.axq", "c.cx")}, c.cell) AS rn
         |    FROM anch a, c2 c) t WHERE rn <= 2),
         |annb AS (SELECT anchor_id, vec_id FROM (
         |    SELECT anchor_id, s.vec_id,
         |      row_number() OVER (PARTITION BY anchor_id
         |        ORDER BY cos_sim DESC, s.vec_id) AS rank
         |    FROM (SELECT anchor_id, asg.vec_id AS vec_id,
         |            round(${vdot("asg.embedding", "aemb")} / (asg.norm * anorm), 6) AS cos_sim
         |          FROM asg JOIN probeb USING (cell)
         |          WHERE asg.vec_id <> anchor_id) s) r
         |  WHERE rank <= 3),
         |probea AS (SELECT anchor_id, aemb, anorm, cell FROM (
         |    SELECT a.anchor_id, a.aemb, a.anorm, c.cell,
         |      row_number() OVER (PARTITION BY a.anchor_id
         |        ORDER BY ${sqDist("a.axq", "c.cx")}, c.cell) AS rn
         |    FROM anch a, rc2 c) t WHERE rn <= 2),
         |anna AS (SELECT anchor_id, vec_id FROM (
         |    SELECT anchor_id, s.vec_id,
         |      row_number() OVER (PARTITION BY anchor_id
         |        ORDER BY cos_sim DESC, s.vec_id) AS rank
         |    FROM (SELECT anchor_id, rasg.vec_id AS vec_id,
         |            round(${vdot("rasg.embedding", "aemb")} / (rasg.norm * anorm), 6) AS cos_sim
         |          FROM rasg JOIN probea USING (cell)
         |          WHERE rasg.vec_id <> anchor_id) s) r
         |  WHERE rank <= 3),
         |h AS (SELECT ex.anchor_id,
         |        CAST(count(*) AS BIGINT) AS n_exact,
         |        CAST(count(annb.vec_id) AS BIGINT) AS n_hits_before,
         |        CAST(count(anna.vec_id) AS BIGINT) AS n_hits_after
         |      FROM ex LEFT JOIN annb USING (anchor_id, vec_id)
         |              LEFT JOIN anna USING (anchor_id, vec_id)
         |      GROUP BY ex.anchor_id)
         |SELECT anchor_id, n_exact, n_hits_before, n_hits_after,
         |  CAST((n_hits_before * 20000 + n_exact) // (2 * n_exact) AS DOUBLE) / 10000.0 AS recall_before,
         |  CAST((n_hits_after * 20000 + n_exact) // (2 * n_exact) AS DOUBLE) / 10000.0 AS recall_after
         |FROM h ORDER BY anchor_id""".stripMargin,

    // q82: IVFADC — the corpus-trained coarse quantizer (ivfCtes,
    // q25b's) picks each anchor's 2 probe cells and assigns every
    // vector (asg), the PQ chain (pqCtes, q81's) re-derives all 8
    // codebooks and codes, and the ADC scores are ranked WITHIN the
    // probed cells only. Both quantizers replayed bit-for-bit in one
    // WITH block.
    "q82_ann_ivfpq" ->
      s"""WITH ${ivfCtes(16, 2, 512, "WHERE vec_id % 10 <> 0")},
         |${pqCtes(withQe = false)},
         |anch AS (SELECT vec_id AS anchor_id, xq AS axq
         |         FROM qe WHERE vec_id IN (0, 1, 2)),
         |probe AS (SELECT anchor_id, cell FROM (
         |    SELECT qe.vec_id AS anchor_id, c.cell,
         |      row_number() OVER (PARTITION BY qe.vec_id
         |        ORDER BY ${sqDist("qe.xq", "c.cx")}, c.cell) AS rn
         |    FROM qe, c2 c WHERE qe.vec_id IN (0, 1, 2)) t WHERE rn <= 2),
         |cand AS (SELECT p.anchor_id, asg.vec_id
         |         FROM asg JOIN probe p USING (cell)
         |         WHERE asg.vec_id <> p.anchor_id),
         |${adcScoreCtes()},
         |pqs AS (SELECT t.anchor_id, t.vec_id,
         |          round(CAST(t.sdot AS DOUBLE) /
         |            (sqrt(CAST(an2.anorm2 AS DOUBLE)) * sqrt(CAST(t.nrec AS DOUBLE))), 6) AS cos_pq
         |        FROM tot t JOIN an2 USING (anchor_id)
         |          JOIN cand USING (anchor_id, vec_id))
         |SELECT anchor_id, rank, vec_id, cos_pq FROM (
         |  SELECT *, row_number() OVER (PARTITION BY anchor_id
         |    ORDER BY cos_pq DESC, vec_id) AS rank FROM pqs) r
         |WHERE rank <= 3 ORDER BY anchor_id, rank""".stripMargin,

    // q82b: IVFADC with RESIDUAL encoding (FAISS by_residual=true) —
    // same coarse chain and probe as q82, but the PQ chain trains on
    // the residual CTE `re` (xq − assigned coarse centroid) and ADC
    // reconstructs centroid + residual codeword per subspace.
    "q82b_ann_ivfpq_residual" -> materialized(
      s"""WITH ${ivfCtes(16, 2, 512, "WHERE vec_id % 10 <> 0")},
         |re AS (SELECT qe.vec_id,
         |         list_transform(range(1, 65), i -> qe.xq[i] - cc.cx[i]) AS rq
         |       FROM qe JOIN asg USING (vec_id)
         |         JOIN c2 cc ON asg.cell = cc.cell),
         |${pqCtes(withQe = false, srcCte = "re", srcCol = "rq")},
         |anch AS (SELECT vec_id AS anchor_id, xq AS axq
         |         FROM qe WHERE vec_id IN (0, 1, 2)),
         |probe AS (SELECT anchor_id, cell FROM (
         |    SELECT qe.vec_id AS anchor_id, c.cell,
         |      row_number() OVER (PARTITION BY qe.vec_id
         |        ORDER BY ${sqDist("qe.xq", "c.cx")}, c.cell) AS rn
         |    FROM qe, c2 c WHERE qe.vec_id IN (0, 1, 2)) t WHERE rn <= 2),
         |cand AS (SELECT p.anchor_id, asg.vec_id
         |         FROM asg JOIN probe p USING (cell)
         |         WHERE asg.vec_id <> p.anchor_id),
         |${adcResidualScoreCtes()},
         |pqs AS (SELECT t.anchor_id, t.vec_id,
         |          round(CAST(t.sdot AS DOUBLE) /
         |            (sqrt(CAST(an2.anorm2 AS DOUBLE)) * sqrt(CAST(t.nrec AS DOUBLE))), 6) AS cos_pq
         |        FROM tot t JOIN an2 USING (anchor_id)
         |          JOIN cand USING (anchor_id, vec_id))
         |SELECT anchor_id, rank, vec_id, cos_pq FROM (
         |  SELECT *, row_number() OVER (PARTITION BY anchor_id
         |    ORDER BY cos_pq DESC, vec_id) AS rank FROM pqs) r
         |WHERE rank <= 3 ORDER BY anchor_id, rank""".stripMargin,
      Seq("qe", "asg", "re", "cand", "anch") ++ pqMatNames("")),

    // q89: the incremental refresh must equal the FULL recompute —
    // the oracle never sees the staged base, it re-derives everything,
    // so a drifted merge law or stale stage fails the hash.
    "q89_incremental_source_stats" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // q88: per-cell IVF index balance — populations from the replayed
    // coarse assignment split on the corpus/arrival rule, full 0..15
    // cell domain, load factor via the exact rdiv4 formula.
    "q88_ivf_cell_balance" ->
      s"""WITH ${ivfCtes(16, 2, 512, "WHERE vec_id % 10 <> 0")},
         |cnt AS (SELECT cell,
         |    sum(CASE WHEN vec_id % 10 <> 0 THEN 1 ELSE 0 END) AS nc,
         |    sum(CASE WHEN vec_id % 10 = 0 THEN 1 ELSE 0 END) AS na
         |  FROM asg GROUP BY cell),
         |dom AS (SELECT CAST(unnest(range(16)) AS INTEGER) AS cell),
         |tot AS (SELECT sum(nc + na) AS n FROM cnt)
         |SELECT dom.cell,
         |  CAST(coalesce(nc, 0) AS BIGINT) AS n_corpus,
         |  CAST(coalesce(na, 0) AS BIGINT) AS n_arrivals,
         |  CAST(coalesce(nc, 0) + coalesce(na, 0) AS BIGINT) AS n_total,
         |  CAST(((coalesce(nc, 0) + coalesce(na, 0)) * 16 * 20000 + n)
         |    // (2 * n) AS DOUBLE) / 10000.0 AS load
         |FROM dom LEFT JOIN cnt USING (cell), tot
         |ORDER BY dom.cell""".stripMargin,

    // q55c: recall@3 of raw-PQ vs residual-PQ IVFADC against the
    // exact brute top-3 — both PQ chains replay side by side (the
    // residual chain under the "r" prefix), exact/ann/hit CTEs follow
    // the q55 harness, recall is the exact half-up rdiv4 formula.
    "q55c_pq_recall" -> materialized(
      s"""WITH ${ivfCtes(16, 2, 512, "WHERE vec_id % 10 <> 0")},
         |${pqCtes(withQe = false)},
         |re AS (SELECT qe.vec_id,
         |         list_transform(range(1, 65), i -> qe.xq[i] - cc.cx[i]) AS rq
         |       FROM qe JOIN asg USING (vec_id)
         |         JOIN c2 cc ON asg.cell = cc.cell),
         |${pqCtes(withQe = false, srcCte = "re", srcCol = "rq", pfx = "r")},
         |anch AS (SELECT vec_id AS anchor_id, xq AS axq
         |         FROM qe WHERE vec_id IN (0, 1, 2)),
         |probe AS (SELECT anchor_id, cell FROM (
         |    SELECT qe.vec_id AS anchor_id, c.cell,
         |      row_number() OVER (PARTITION BY qe.vec_id
         |        ORDER BY ${sqDist("qe.xq", "c.cx")}, c.cell) AS rn
         |    FROM qe, c2 c WHERE qe.vec_id IN (0, 1, 2)) t WHERE rn <= 2),
         |cand AS (SELECT p.anchor_id, asg.vec_id
         |         FROM asg JOIN probe p USING (cell)
         |         WHERE asg.vec_id <> p.anchor_id),
         |${adcScoreCtes()},
         |${adcResidualScoreCtes(pfx = "r")},
         |rawtop AS (SELECT anchor_id, vec_id FROM (
         |    SELECT pp.anchor_id, pp.vec_id,
         |      row_number() OVER (PARTITION BY pp.anchor_id
         |        ORDER BY pp.cos_pq DESC, pp.vec_id) AS rank
         |    FROM (SELECT t.anchor_id, t.vec_id,
         |            round(CAST(t.sdot AS DOUBLE) /
         |              (sqrt(CAST(an2.anorm2 AS DOUBLE)) * sqrt(CAST(t.nrec AS DOUBLE))), 6) AS cos_pq
         |          FROM tot t JOIN an2 USING (anchor_id)
         |            JOIN cand USING (anchor_id, vec_id)) pp) z
         |  WHERE rank <= 3),
         |restop AS (SELECT anchor_id, vec_id FROM (
         |    SELECT pp.anchor_id, pp.vec_id,
         |      row_number() OVER (PARTITION BY pp.anchor_id
         |        ORDER BY pp.cos_pq DESC, pp.vec_id) AS rank
         |    FROM (SELECT t.anchor_id, t.vec_id,
         |            round(CAST(t.sdot AS DOUBLE) /
         |              (sqrt(CAST(ran2.anorm2 AS DOUBLE)) * sqrt(CAST(t.nrec AS DOUBLE))), 6) AS cos_pq
         |          FROM rtot t JOIN ran2 USING (anchor_id)
         |            JOIN cand USING (anchor_id, vec_id)) pp) z
         |  WHERE rank <= 3),
         |anchx AS (SELECT vec_id AS anchor_id, embedding AS aemb, norm AS anorm
         |          FROM qe WHERE vec_id IN (0, 1, 2)),
         |ex AS (SELECT anchor_id, vec_id FROM (
         |    SELECT anchor_id, s.vec_id,
         |      row_number() OVER (PARTITION BY anchor_id
         |        ORDER BY cos_sim DESC, s.vec_id) AS rank
         |    FROM (SELECT anchor_id, qe.vec_id AS vec_id,
         |            round(${vdot("qe.embedding", "aemb")} / (qe.norm * anorm), 6) AS cos_sim
         |          FROM qe, anchx WHERE qe.vec_id <> anchor_id) s) r
         |  WHERE rank <= 3),
         |b AS (SELECT anchor_id, CAST(count(*) AS BIGINT) AS n_exact
         |      FROM ex GROUP BY anchor_id),
         |hr AS (SELECT anchor_id, CAST(count(*) AS BIGINT) AS hr
         |       FROM ex JOIN rawtop USING (anchor_id, vec_id)
         |       GROUP BY anchor_id),
         |hres AS (SELECT anchor_id, CAST(count(*) AS BIGINT) AS hres
         |         FROM ex JOIN restop USING (anchor_id, vec_id)
         |         GROUP BY anchor_id)
         |SELECT b.anchor_id, n_exact,
         |  coalesce(hr, 0) AS hits_raw,
         |  coalesce(hres, 0) AS hits_residual,
         |  CAST((coalesce(hr, 0) * 20000 + n_exact) // (2 * n_exact) AS DOUBLE) / 10000.0 AS recall_raw,
         |  CAST((coalesce(hres, 0) * 20000 + n_exact) // (2 * n_exact) AS DOUBLE) / 10000.0 AS recall_residual
         |FROM b LEFT JOIN hr USING (anchor_id) LEFT JOIN hres USING (anchor_id)
         |ORDER BY anchor_id""".stripMargin,
      Seq("qe", "asg", "re", "cand", "anch") ++
        pqMatNames("") ++ pqMatNames("r")),

    // q83: the streaming ANN ingest gate — every arrival is an
    // anchor: coarse-probe its 2 cells (corpus-trained quantizer),
    // ADC-score the corpus codes inside them, keep pairs at or above
    // the gate threshold on the rounded PQ cosine.
    "q83_stream_ann_gate" ->
      s"""WITH ${ivfCtes(16, 2, 512, "WHERE vec_id % 10 <> 0")},
         |${pqCtes(withQe = false)},
         |anch AS (SELECT vec_id AS anchor_id, xq AS axq
         |         FROM qe WHERE vec_id % 10 = 0),
         |probe AS (SELECT anchor_id, cell FROM (
         |    SELECT a.anchor_id, c.cell,
         |      row_number() OVER (PARTITION BY a.anchor_id
         |        ORDER BY ${sqDist("a.axq", "c.cx")}, c.cell) AS rn
         |    FROM anch a, c2 c) t WHERE rn <= 2),
         |cand AS (SELECT p.anchor_id, asg.vec_id
         |         FROM asg JOIN probe p USING (cell)
         |         WHERE asg.vec_id % 10 <> 0),
         |${adcScoreCtes()},
         |pqs AS (SELECT t.anchor_id, t.vec_id,
         |          round(CAST(t.sdot AS DOUBLE) /
         |            (sqrt(CAST(an2.anorm2 AS DOUBLE)) * sqrt(CAST(t.nrec AS DOUBLE))), 6) AS cos_pq
         |        FROM tot t JOIN an2 USING (anchor_id)
         |          JOIN cand USING (anchor_id, vec_id))
         |SELECT anchor_id AS arr_id, vec_id, cos_pq FROM pqs
         |WHERE cos_pq >= 0.35 ORDER BY arr_id, vec_id""".stripMargin,

    // q25b: q25's probe/top-k SQL with the quantizer TRAINED ONLY on
    // the standing corpus (vec_id % 10 <> 0) — the frozen-centroid
    // contract; asg still assigns every vector (base + appended
    // arrival segment on the engine side).
    "q25b_ann_ivf_append" ->
      s"""WITH ${ivfCtes(16, 2, 512, "WHERE vec_id % 10 <> 0")},
         |probe AS (SELECT anchor_id, aemb, anorm, cell FROM (
         |    SELECT qe.vec_id AS anchor_id, qe.embedding AS aemb,
         |      qe.norm AS anorm, c.cell,
         |      row_number() OVER (PARTITION BY qe.vec_id
         |        ORDER BY ${sqDist("qe.xq", "c.cx")}, c.cell) AS rn
         |    FROM qe, c2 c WHERE qe.vec_id IN (0, 1, 2)) t WHERE rn <= 2),
         |s AS (SELECT anchor_id, asg.vec_id AS vec_id,
         |        round(${vdot("asg.embedding", "aemb")} / (asg.norm * anorm), 6) AS cos_sim
         |      FROM asg JOIN probe USING (cell) WHERE asg.vec_id <> anchor_id)
         |SELECT anchor_id, vec_id, cos_sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY anchor_id
         |    ORDER BY cos_sim DESC, vec_id) AS rank FROM s) r
         |WHERE rank <= 3 ORDER BY anchor_id, rank""".stripMargin,

    // Twin of annTopKIvf: the micro-integer k-means quantizer CTEs
    // (ivfCtes — same init order, same Lloyd rounds, same truncating
    // means), anchors probe their 2 nearest cells, exact cosine ranks
    // within the probed candidates.
    "q25_ann_ivf" ->
      s"""WITH ${ivfCtes(16, 2)},
         |probe AS (SELECT anchor_id, aemb, anorm, cell FROM (
         |    SELECT qe.vec_id AS anchor_id, qe.embedding AS aemb,
         |      qe.norm AS anorm, c.cell,
         |      row_number() OVER (PARTITION BY qe.vec_id
         |        ORDER BY ${sqDist("qe.xq", "c.cx")}, c.cell) AS rn
         |    FROM qe, c2 c WHERE qe.vec_id IN (0, 1, 2)) t WHERE rn <= 2),
         |s AS (SELECT anchor_id, asg.vec_id AS vec_id,
         |        round(${vdot("asg.embedding", "aemb")} / (asg.norm * anorm), 6) AS cos_sim
         |      FROM asg JOIN probe USING (cell) WHERE asg.vec_id <> anchor_id)
         |SELECT anchor_id, vec_id, cos_sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY anchor_id
         |    ORDER BY cos_sim DESC, vec_id) AS rank FROM s) r
         |WHERE rank <= 3 ORDER BY anchor_id, rank""".stripMargin,

    "q29_quantize_int8" ->
      // Twin of q29: max-abs is order-insensitive, x·127/max divides
      // identical doubles, and round-half matches the q20 precedent.
      """SELECT vec_id, mx,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  md5(array_to_string(q, ',')) AS q_checksum
        |FROM (
        |  SELECT vec_id, mx,
        |    CASE WHEN mx = 0 THEN list_transform(embedding, v -> CAST(0 AS BIGINT))
        |    ELSE list_transform(embedding,
        |      v -> CAST(round(CAST(v AS DOUBLE) * 127.0 / mx, 0) AS BIGINT)) END AS q
        |  FROM (SELECT vec_id, embedding,
        |          list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS mx
        |        FROM embeddings) t0) t1
        |ORDER BY vec_id""".stripMargin,

    "q77_ann_int8_rerank" ->
      // Twin of q77: q29's integer codes (round-half precedent), an
      // integer-exact quantized dot (scales cancel in the cosine),
      // approximate top-8, full-precision re-rank of only those.
      s"""WITH qe AS (SELECT vec_id, embedding,
         |    sqrt(${vdot("embedding", "embedding")}) AS norm,
         |    list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS mx
         |  FROM embeddings),
         |qq AS (SELECT vec_id, embedding, norm,
         |    CASE WHEN mx = 0 THEN list_transform(embedding, v -> CAST(0 AS BIGINT))
         |    ELSE list_transform(embedding,
         |      v -> CAST(round(CAST(v AS DOUBLE) * 127.0 / mx, 0) AS BIGINT)) END AS q
         |  FROM qe),
         |qn AS (SELECT vec_id, embedding, norm, q,
         |    CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT) AS nq
         |  FROM qq),
         |a AS (SELECT vec_id AS anchor_id, q AS qa, nq AS nqa,
         |        embedding AS aemb, norm AS anorm
         |      FROM qn WHERE vec_id IN (0, 1, 2)),
         |sc AS (SELECT a.anchor_id, x.vec_id,
         |    round(CAST(list_sum(list_transform(range(1, 65),
         |        i -> x.q[i] * a.qa[i])) AS DOUBLE)
         |      / sqrt(CAST(x.nq * a.nqa AS DOUBLE)), 6) AS cos_q,
         |    x.embedding, x.norm, a.aemb, a.anorm
         |  FROM qn x, a WHERE x.vec_id <> a.anchor_id),
         |topm AS (SELECT * FROM (
         |    SELECT sc.*, row_number() OVER (PARTITION BY anchor_id
         |      ORDER BY cos_q DESC, vec_id) AS qrank FROM sc) t
         |  WHERE qrank <= 8),
         |rr AS (SELECT anchor_id, vec_id, cos_q,
         |    round(${vdot("embedding", "aemb")} / (norm * anorm), 6) AS cos_sim
         |  FROM topm)
         |SELECT anchor_id, rank, vec_id, cos_q, cos_sim FROM (
         |  SELECT rr.*, row_number() OVER (PARTITION BY anchor_id
         |    ORDER BY cos_sim DESC, vec_id) AS rank FROM rr) t
         |WHERE rank <= 3 ORDER BY anchor_id, rank""".stripMargin,

    "q28_dup_clusters" -> {
      // Same pair set as q24b (banded LSH), then the component
      // representative (min reachable id) via a recursive closure.
      val bandSelects = (0 until 4).map { b =>
        s"SELECT vec_id, $b AS band, ${bandBucketSql(b * 6, 6)} AS bucket FROM embeddings"
      }.mkString("\n  UNION ALL\n")
      s"""WITH RECURSIVE k AS (
         |$bandSelects),
         |cand AS (SELECT DISTINCT x.vec_id AS vec_id_a, y.vec_id AS vec_id_b
         |      FROM k x JOIN k y ON x.band = y.band AND x.bucket = y.bucket
         |       AND x.vec_id < y.vec_id),
         |nn AS (SELECT vec_id, embedding,
         |        sqrt(${vdot("embedding", "embedding")}) AS nrm
         |      FROM embeddings),
         |p AS (
         |  SELECT vec_id_a, vec_id_b FROM (
         |    SELECT vec_id_a, vec_id_b,
         |      round(${vdot("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cos_sim
         |    FROM cand JOIN nn a ON cand.vec_id_a = a.vec_id
         |              JOIN nn b ON cand.vec_id_b = b.vec_id) s
         |  WHERE cos_sim >= 0.45),
         |e AS (SELECT vec_id_a AS u, vec_id_b AS v FROM p
         |      UNION SELECT vec_id_b, vec_id_a FROM p),
         |reach(u, v) AS (
         |  SELECT u, v FROM e
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u)
         |SELECT u AS vec_id, least(u, min(v)) AS cluster_id
         |FROM reach GROUP BY u ORDER BY vec_id""".stripMargin
    },

    "q27_winnow_fingerprint" ->
      s"""WITH d AS ($docsWithWords),
         |h AS (SELECT doc_id,
         |        CASE WHEN len(w) < 3 THEN CAST([] AS BIGINT[])
         |        ELSE list_transform(range(1, len(w)-1),
         |          i -> CAST('0x' || substr(md5(array_to_string(w[i:i+2], ' ')), 1, 8) AS BIGINT))
         |        END AS hs
         |      FROM d),
         |wn AS (SELECT doc_id, len(hs) AS n_shingles,
         |         CASE WHEN len(hs) < 4 THEN CAST([] AS BIGINT[])
         |         ELSE list_transform(range(1, len(hs)-2), j -> list_min(hs[j:j+3]))
         |         END AS wins
         |       FROM h)
         |SELECT doc_id,
         |  CAST(n_shingles AS BIGINT) AS n_shingles,
         |  CAST(len(list_distinct(wins)) AS BIGINT) AS n_fingerprints,
         |  md5(coalesce(array_to_string(list_sort(list_distinct(wins)), ','), '')) AS fingerprint
         |FROM wn ORDER BY doc_id""".stripMargin,

    "q26_multimodal_features" -> {
      // Twin of Multimodal.featureStub: md5("<payload>_<j>") prefix /
      // 2^32 — division by a power of two is exact, so no rounding is
      // needed for hash stability.
      val cols = (0 until 8).map(j =>
        f"  CAST('0x' || substr(md5(text || '_' || $j), 1, 8) AS BIGINT) / 4294967296.0 AS f$j%02d")
      s"""SELECT doc_id,
         |${cols.mkString(",\n")}
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q24b_embedding_dups_lsh" -> {
      val bandSelects = (0 until 4).map { b =>
        s"SELECT vec_id, $b AS band, ${bandBucketSql(b * 6, 6)} AS bucket FROM embeddings"
      }.mkString("\n  UNION ALL\n")
      s"""WITH k AS (
         |$bandSelects),
         |p AS (SELECT DISTINCT x.vec_id AS vec_id_a, y.vec_id AS vec_id_b
         |      FROM k x JOIN k y ON x.band = y.band AND x.bucket = y.bucket
         |       AND x.vec_id < y.vec_id),
         |n AS (SELECT vec_id, embedding,
         |        sqrt(${vdot("embedding", "embedding")}) AS nrm
         |      FROM embeddings)
         |SELECT vec_id_a, vec_id_b, cos_sim FROM (
         |  SELECT vec_id_a, vec_id_b,
         |    round(${vdot("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cos_sim
         |  FROM p JOIN n a ON p.vec_id_a = a.vec_id
         |         JOIN n b ON p.vec_id_b = b.vec_id) s
         |WHERE cos_sim >= 0.45 ORDER BY vec_id_a, vec_id_b""".stripMargin
    },

    "q31_text_chunks" ->
      s"""WITH n AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n,
         |             CASE WHEN len(w) <= 32 THEN 1
         |                  ELSE (len(w) - 32 + 23) // 24 + 1 END AS n_chunks
         |           FROM ($docsWithWords) d0),
         |e AS (SELECT doc_id, w, n, i AS chunk_idx
         |      FROM n, UNNEST(range(n_chunks)) AS t(i))
         |SELECT doc_id,
         |  CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |  CAST(chunk_idx * 24 AS BIGINT) AS chunk_start,
         |  CAST(len(w[chunk_idx*24 + 1 : least(chunk_idx*24 + 32, n)]) AS BIGINT) AS n_chunk_tokens,
         |  md5(array_to_string(w[chunk_idx*24 + 1 : least(chunk_idx*24 + 32, n)], ' ')) AS chunk_md5
         |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,

    "q32_tfidf_terms" ->
      s"""WITH t AS (SELECT doc_id, unnest(w) AS term FROM ($docsWithWords) d0),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |       FROM t GROUP BY doc_id, term),
         |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
         |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents),
         |sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |         CAST(round(ln((nd.n_docs + 1.0) / (df.df + 1.0)) * 1000000.0, 0) AS BIGINT) AS idf_micro
         |       FROM tf JOIN df USING (term) CROSS JOIN nd),
         |r AS (SELECT doc_id, term, tf, df, tf * idf_micro AS tfidf_micro,
         |        row_number() OVER (PARTITION BY doc_id
         |          ORDER BY tf * idf_micro DESC, term ASC) AS rn
         |      FROM sc)
         |SELECT doc_id, CAST(rn AS BIGINT) AS rn, term, tf, df, tfidf_micro
         |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,

    "q33_train_split" ->
      """SELECT doc_id,
        |  CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS bucket,
        |  CASE WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 90 THEN 'train'
        |       WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 95 THEN 'validation'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q34_dedup_apply" ->
      // q15's pair pipeline as a CTE block, then connected components
      // via a recursive reachability closure (min reachable id =
      // canonical survivor).
      s"""WITH RECURSIVE $q15PairCtes,
         |pr AS (SELECT doc_a, doc_b FROM v WHERE jaccard >= 0.8),
         |edges AS (SELECT doc_a AS u, doc_b AS vtx FROM pr
         |          UNION SELECT doc_b, doc_a FROM pr),
         |reach(u, vtx) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) n0
         |  UNION
         |  SELECT r.u, e.vtx FROM reach r JOIN edges e ON r.vtx = e.u),
         |lbl AS (SELECT u AS doc_id, min(vtx) AS cluster_id FROM reach GROUP BY u)
         |SELECT CAST(docs.doc_id AS BIGINT) AS doc_id,
         |  CAST(coalesce(lbl.cluster_id, docs.doc_id) AS BIGINT) AS canonical_id,
         |  coalesce(lbl.cluster_id, docs.doc_id) = docs.doc_id AS is_kept
         |FROM documents docs LEFT JOIN lbl ON docs.doc_id = lbl.doc_id
         |ORDER BY doc_id""".stripMargin,

    "q36_contamination" ->
      s"""WITH d AS (SELECT doc_id,
         |    list_distinct(list_transform(range(1, len(w)-3),
         |      i -> array_to_string(w[i:i+4], ' '))) AS sh,
         |    CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS bucket
         |  FROM ($docsWithWords) d0),
         |tr AS (SELECT DISTINCT unnest(sh) AS s FROM d WHERE bucket < 90),
         |te AS (SELECT doc_id, unnest(sh) AS s FROM d WHERE bucket >= 95),
         |cont AS (SELECT te.doc_id, CAST(count(tr.s) AS BIGINT) AS n_cont
         |         FROM te LEFT JOIN tr USING (s) GROUP BY te.doc_id)
         |SELECT d.doc_id,
         |  CAST(len(d.sh) AS BIGINT) AS n_shingles,
         |  CAST(coalesce(c.n_cont, 0) AS BIGINT) AS n_contaminated,
         |  CAST((CAST(coalesce(c.n_cont, 0) AS BIGINT) * 20000 + greatest(len(d.sh), 1))
         |    // (2 * greatest(len(d.sh), 1)) AS DOUBLE) / 10000.0 AS contamination_ratio
         |FROM d LEFT JOIN cont c ON d.doc_id = c.doc_id
         |WHERE d.bucket >= 95 ORDER BY d.doc_id""".stripMargin,

    "q35_stream_dedup_users" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Single-batch fixture: every duplicate falls inside the watermark
    // window, so the bounded variant's oracle equals the unbounded one.
    "q35b_stream_dedup_windowed" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Gaps-and-islands twin of Spark's session_window(ev_ts, 30 min):
    // a session breaks when the gap to the previous event (per user)
    // exceeds the 30-minute gap; session end = last event + gap.
    "q37_stream_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |o AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |         OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM o)
        |SELECT user_id, min(us) AS session_start_us,
        |  max(us) + 1800000000 AS session_end_us,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin,

    // Append-mode twin of q37: Spark emits a session only once the
    // watermark (final batch max event time, ms-floored, minus 1 h)
    // has passed its END — so the oracle is the same gaps-and-islands
    // construction filtered to sessions with end <= watermark.
    "q37b_stream_sessions_append" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |wm AS (SELECT ((max(us) // 1000) - 3600000) * 1000 AS wm_us FROM e),
        |o AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |         OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM o)
        |SELECT user_id, min(us) AS session_start_us,
        |  max(us) + 1800000000 AS session_end_us,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, sid
        |HAVING max(us) + 1800000000 <= (SELECT wm_us FROM wm)
        |ORDER BY user_id, session_start_us""".stripMargin,

    // Exact 4-gram Jaccard: candidates from the df-pruned inverted
    // index, verified with the TRUE intersection of the full shingle
    // sets (the prune bounds candidate generation only). The index is
    // keyed on the SAME md5-prefix hash60 the engine shuffles on
    // (engine: PipelineQueries q38 `shh`), so a cross-shingle hash
    // collision moves the df prune identically on both sides and
    // cancels — the prune is hash-exact by construction, not by a
    // collision-freeness assumption.
    "q38_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id,
         |    list_distinct(list_transform(range(1, len(w)-2),
         |      i -> array_to_string(w[i:i+3], ' '))) AS sh
         |  FROM ($docsWithWords) d0 WHERE len(w) >= 4),
         |inv AS (SELECT DISTINCT doc_id,
         |    CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h
         |  FROM (SELECT doc_id, unnest(sh) AS s FROM d)),
         |rare AS (SELECT h FROM inv GROUP BY h HAVING count(*) <= 64),
         |ix AS (SELECT inv.* FROM inv JOIN rare USING (h)),
         |p AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |      FROM ix x JOIN ix y ON x.h = y.h AND x.doc_id < y.doc_id),
         |j AS (SELECT doc_a, doc_b,
         |        CAST(len(list_intersect(da.sh, db.sh)) AS BIGINT) AS n_shared,
         |        len(da.sh) AS sz_a, len(db.sh) AS sz_b
         |      FROM p JOIN d da ON p.doc_a = da.doc_id
         |             JOIN d db ON p.doc_b = db.doc_id)
         |SELECT doc_a, doc_b, n_shared,
         |  round(CAST(n_shared AS DOUBLE) / (sz_a + sz_b - n_shared), 4) AS jaccard
         |FROM j
         |WHERE round(CAST(n_shared AS DOUBLE) / (sz_a + sz_b - n_shared), 4) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    // Fuzzy train/eval decontamination: the q15 LSH pair pipeline
    // restricted to train-test cross pairs, then the best match per
    // test doc (window: jaccard DESC, train id DESC) left-joined onto
    // the full eval split.
    "q42_cross_split_contamination" ->
      s"""WITH $q15PairCtes,
         |sp AS (SELECT doc_id,
         |    CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
         |      AS BIGINT) % 100 AS b FROM documents),
         |x AS (SELECT
         |    CASE WHEN ba.b >= 95 THEN v.doc_a ELSE v.doc_b END AS test_doc,
         |    CASE WHEN ba.b >= 95 THEN v.doc_b ELSE v.doc_a END AS train_doc,
         |    v.jaccard
         |  FROM v JOIN sp ba ON v.doc_a = ba.doc_id
         |         JOIN sp bb ON v.doc_b = bb.doc_id
         |  WHERE v.jaccard >= 0.8
         |    AND ((ba.b >= 95 AND bb.b < 90) OR (ba.b < 90 AND bb.b >= 95))),
         |best AS (SELECT test_doc, train_doc AS best_train_doc,
         |    jaccard AS best_jaccard
         |  FROM (SELECT *, row_number() OVER (PARTITION BY test_doc
         |          ORDER BY jaccard DESC, train_doc DESC) AS rn FROM x)
         |  WHERE rn = 1)
         |SELECT sp.doc_id,
         |  best.test_doc IS NOT NULL AS is_contaminated,
         |  best.best_train_doc, best.best_jaccard
         |FROM sp LEFT JOIN best ON sp.doc_id = best.test_doc
         |WHERE sp.b >= 95 ORDER BY sp.doc_id""".stripMargin,

    // Concat-and-chunk sequence packing within md5 hash buckets; the
    // running-token window mirrors Spark's per-bucket cumsum exactly
    // (integer arithmetic end to end).
    "q41_sequence_packing" ->
      s"""WITH sized AS (SELECT doc_id,
         |    CAST(len(w) AS BIGINT) AS n_tokens,
         |    CAST('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8)
         |      AS BIGINT)
         |      % (SELECT greatest(16, count(*) // 1000000) FROM documents)
         |      AS pack_bucket
         |  FROM ($docsWithWords) d0),
         |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY pack_bucket
         |        ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_end
         |      FROM sized)
         |SELECT doc_id, pack_bucket, n_tokens,
         |  CAST((cum_end - n_tokens) // 512 AS BIGINT) AS bin_in_bucket,
         |  CAST((cum_end - n_tokens) % 512 AS BIGINT) AS offset_in_bin
         |FROM c ORDER BY doc_id""".stripMargin,

    // Unigram surprisal: one log10 per DISTINCT token, rounded to
    // integer micro-units before the per-doc integer sum (the q32
    // integer-exactness trick), one terminal rounded division.
    "q40_unigram_surprisal" ->
      s"""WITH tok AS (SELECT doc_id, unnest(w) AS t FROM ($docsWithWords) d0),
         |f AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
         |n AS (SELECT count(*) AS nc FROM tok),
         |sc AS (SELECT t, CAST(round(log10(CAST(nc AS DOUBLE) / c) * 1e6)
         |         AS BIGINT) AS sm FROM f, n)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(sm) AS BIGINT) AS surprisal_micro_total,
         |  CAST((CAST(sum(sm) AS BIGINT) * 20000 + count(*) * 1000000)
         |    // (2 * count(*) * 1000000) AS DOUBLE) / 10000.0 AS avg_surprisal
         |FROM tok JOIN sc USING (t)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Bigram repetition signals; list_filter/list_sum mirror the HOF
    // counting, coalesce(., 0) mirrors Spark's 0-initial aggregate.
    "q39_repetition" ->
      s"""WITH g AS (SELECT doc_id,
         |    list_transform(range(1, len(w)),
         |      i -> array_to_string(w[i:i+1], ' ')) AS g
         |  FROM ($docsWithWords) d0 WHERE len(w) >= 2),
         |c AS (SELECT doc_id, len(g) AS n_bigrams,
         |    list_transform(list_distinct(g),
         |      u -> len(list_filter(g, x -> x = u))) AS cnts
         |  FROM g)
         |SELECT doc_id,
         |  CAST(n_bigrams AS BIGINT) AS n_bigrams,
         |  CAST(list_max(cnts) AS BIGINT) AS max_bigram_count,
         |  CAST(coalesce(list_sum(list_filter(cnts, x -> x > 1)), 0) AS BIGINT)
         |    AS n_repeated_bigrams,
         |  CAST((CAST(list_max(cnts) AS BIGINT) * 20000 + n_bigrams)
         |    // (2 * n_bigrams) AS DOUBLE) / 10000.0 AS top_bigram_frac,
         |  CAST((CAST(coalesce(list_sum(list_filter(cnts, x -> x > 1)), 0) AS BIGINT) * 20000
         |    + n_bigrams) // (2 * n_bigrams) AS DOUBLE) / 10000.0 AS repeated_frac
         |FROM c ORDER BY doc_id""".stripMargin,

    // Mixture downsampler: hash-derived per-source rate, salted doc
    // hash under an integer boundary — both sides pure integer math.
    "q45_source_mix" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST('0x' || substr(md5('rate:' || source), 1, 8) AS BIGINT) % 4 AS k,
        |    CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS u
        |  FROM documents)
        |SELECT doc_id, source, CAST(k + 1 AS DOUBLE) / 4.0 AS keep_rate
        |FROM t WHERE u < (k + 1) * 1073741824
        |ORDER BY doc_id""".stripMargin,

    // Streaming custom-state near-dup: identical 16-minhash signature
    // => dup of the minimum doc_id sharing it (the single-batch drain
    // makes min-so-far == global min).
    "q48_stream_near_dup" -> {
      val cols = (0 until 16).map(i => f"${minhashExpr(i)} AS mh$i%02d")
      s"""WITH sig AS (SELECT doc_id, ${cols.mkString(", ")}
         |  FROM (SELECT doc_id, $hashedShinglesSql AS hs
         |        FROM ($docsWithWords) d0 WHERE len(w) >= 3) h0),
         |m AS (SELECT doc_id, min(doc_id) OVER (
         |    PARTITION BY mh00, mh01, mh02, mh03, mh04, mh05, mh06, mh07,
         |                 mh08, mh09, mh10, mh11, mh12, mh13, mh14, mh15) AS dup_of
         |  FROM sig)
         |SELECT doc_id, dup_of FROM m WHERE doc_id > dup_of ORDER BY doc_id""".stripMargin
    },

    // TTL-bounded q48 twin: on the single-batch fixture drain no
    // event-time timeout fires before the output is final, so the
    // bounded operator's result is exactly q48's — the oracle is the
    // same signature-grouped min construction (the bounded/unbounded
    // split mirrors q35b/q35).
    "q48b_stream_near_dup_ttl" -> {
      val cols = (0 until 16).map(i => f"${minhashExpr(i)} AS mh$i%02d")
      s"""WITH sig AS (SELECT doc_id, ${cols.mkString(", ")}
         |  FROM (SELECT doc_id, $hashedShinglesSql AS hs
         |        FROM ($docsWithWords) d0 WHERE len(w) >= 3) h0),
         |m AS (SELECT doc_id, min(doc_id) OVER (
         |    PARTITION BY mh00, mh01, mh02, mh03, mh04, mh05, mh06, mh07,
         |                 mh08, mh09, mh10, mh11, mh12, mh13, mh14, mh15) AS dup_of
         |  FROM sig)
         |SELECT doc_id, dup_of FROM m WHERE doc_id > dup_of ORDER BY doc_id""".stripMargin
    },

    // Boilerplate windows: md5-keyed non-overlapping 8-token windows,
    // hot = shared by >= 3 distinct docs, per-doc instance fraction.
    "q47_boilerplate" ->
      s"""WITH d AS (SELECT doc_id, w FROM ($docsWithWords) d0 WHERE len(w) >= 8),
         |c AS (SELECT doc_id, md5(array_to_string(w[i*8+1:i*8+8], ' ')) AS h
         |      FROM d, unnest(generate_series(0, (len(w) // 8) - 1)) AS t(i)),
         |hot AS (SELECT h FROM (
         |    SELECT h, count(DISTINCT doc_id) AS nd FROM c GROUP BY h) WHERE nd >= 3),
         |f AS (SELECT c.doc_id, count(*) AS n_chunks,
         |        sum(CASE WHEN hot.h IS NOT NULL THEN 1 ELSE 0 END) AS n_bp
         |      FROM c LEFT JOIN hot ON c.h = hot.h GROUP BY c.doc_id)
         |SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
         |  CAST(n_bp AS BIGINT) AS n_boilerplate,
         |  CAST((CAST(n_bp AS BIGINT) * 20000 + n_chunks) // (2 * n_chunks)
         |    AS DOUBLE) / 10000.0 AS boilerplate_frac
         |FROM f ORDER BY doc_id""".stripMargin,

    // Filter cascade: q17's signal fragments + q39's bigram counting,
    // thresholds as integer cross-multiplications, first-failing-rule
    // reason in fixed priority order.
    "q46_filter_cascade" ->
      s"""WITH $q46CascadeCtes
         |SELECT doc_id, n_tokens, too_short, high_punct, low_stopwords,
         |  repetitive, keep, reject_reason
         |FROM fc ORDER BY doc_id""".stripMargin,

    // Real-image-decode twins (q43/q44): the engine decodes the fixture
    // PNGs with the JDK codec; the oracle recomputes the generator's
    // pixel formula (MediaFixture.rgb) in SQL from img_id alone. Any
    // decode defect — wrong dimensions, channel order, pixel values,
    // resample offsets — breaks the value hash.
    "q43_image_meta" ->
      s"""WITH imgs AS (
         |  SELECT img_id, 4 + img_id % 13 AS w, 3 + img_id % 11 AS h
         |  FROM read_parquet('${graft.functions.MediaFixture.fixtureDir}/images/*.parquet')),
         |xs AS (SELECT img_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM imgs),
         |px AS (SELECT img_id, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM xs)
         |SELECT img_id,
         |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         |  CAST(sum((17*x + 29*y + 31*img_id) % 256) AS BIGINT) AS sum_r,
         |  CAST(sum((3*x + 7*y + 11*img_id) % 256) AS BIGINT) AS sum_g,
         |  CAST(sum((13*x + 5*y + 19*img_id) % 256) AS BIGINT) AS sum_b
         |FROM px GROUP BY img_id, w, h ORDER BY img_id""".stripMargin,

    "q44_image_resize" ->
      s"""WITH imgs AS (
         |  SELECT img_id, 4 + img_id % 13 AS w, 3 + img_id % 11 AS h
         |  FROM read_parquet('${graft.functions.MediaFixture.fixtureDir}/images/*.parquet')),
         |ks AS (SELECT img_id, w, h, unnest(generate_series(0, 15)) AS k FROM imgs),
         |rp AS (SELECT img_id, k,
         |         ((k % 4) * w) // 4 AS x, ((k // 4) * h) // 4 AS y FROM ks)
         |SELECT img_id,
         |  string_agg(
         |    format('{:02x}', (17*x + 29*y + 31*img_id) % 256) ||
         |    format('{:02x}', (3*x + 7*y + 11*img_id) % 256) ||
         |    format('{:02x}', (13*x + 5*y + 19*img_id) % 256),
         |    '' ORDER BY k) AS rgb_hex
         |FROM rp GROUP BY img_id ORDER BY img_id""".stripMargin,

    // q57: dHash perceptual fingerprint — the oracle replays the
    // engine's full decode→9×8 nearest resample→integer luma→gradient
    // chain from the fixture's pixel formula (all `//` math); the two
    // 32-bit halves avoid the 64th bit's signed-BIGINT edge.
    "q57_image_dhash" ->
      s"""WITH imgs AS (
         |  SELECT img_id, 4 + img_id % 13 AS w, 3 + img_id % 11 AS h
         |  FROM read_parquet('${graft.functions.MediaFixture.fixtureDir}/images/*.parquet')),
         |ks AS (SELECT img_id, w, h, unnest(generate_series(0, 71)) AS k FROM imgs),
         |g AS (SELECT img_id, w, h, k % 9 AS gi, k // 9 AS gj,
         |        (299*((17*(((k % 9) * w) // 9) + 29*(((k // 9) * h) // 8) + 31*img_id) % 256)
         |       + 587*(( 3*(((k % 9) * w) // 9) +  7*(((k // 9) * h) // 8) + 11*img_id) % 256)
         |       + 114*((13*(((k % 9) * w) // 9) +  5*(((k // 9) * h) // 8) + 19*img_id) % 256)) // 1000 AS gray
         |      FROM ks),
         |bits AS (SELECT a.img_id, a.gj * 8 + a.gi AS k,
         |           CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
         |         FROM g a JOIN g b ON a.img_id = b.img_id AND a.gj = b.gj
         |            AND b.gi = a.gi + 1
         |         WHERE a.gi < 8),
         |halves AS (SELECT img_id,
         |    CAST(sum(CASE WHEN k >= 32 THEN bit * (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END) AS BIGINT) AS hi,
         |    CAST(sum(CASE WHEN k < 32 THEN bit * (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS lo
         |  FROM bits GROUP BY img_id)
         |SELECT imgs.img_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         |  format('{:08x}', hi) || format('{:08x}', lo) AS dhash_hex
         |FROM imgs JOIN halves ON imgs.img_id = halves.img_id
         |ORDER BY imgs.img_id""".stripMargin,

    // q58: the engine genuinely parses RIFF/PCM16 bytes; the oracle
    // regenerates the fixture's sample formula and aggregates the
    // same exact integer statistics.
    "q58_audio_meta" ->
      s"""WITH clips AS (
         |  SELECT clip_id, 800 + clip_id % 7 * 160 AS n
         |  FROM read_parquet('${graft.functions.MediaFixture.fixtureDir}/audio/*.parquet')),
         |sm AS (SELECT clip_id, n,
         |         ((31 * unnest(generate_series(0, n - 1)) + 17 * clip_id) % 8192) - 4096 AS v
         |       FROM clips)
         |SELECT clip_id,
         |  CAST(${graft.functions.MediaFixture.clipRate} AS INTEGER) AS sample_rate,
         |  CAST(n AS BIGINT) AS n_samples,
         |  CAST(n * 1000000 // ${graft.functions.MediaFixture.clipRate} AS BIGINT) AS duration_us,
         |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
         |  CAST(sum(v * v) AS BIGINT) AS sum_sq,
         |  CAST(max(abs(v)) AS INTEGER) AS peak
         |FROM sm GROUP BY clip_id, n ORDER BY clip_id""".stripMargin,

    // q59: every 3rd frame of each GVID container — the oracle
    // recomputes the sampled frames' channel sums from the fixture
    // formula (seed = id*31 + f*7), so both the engine's container
    // walk and its per-frame decode are load-bearing.
    "q59_video_frames" ->
      s"""WITH vids AS (
         |  SELECT video_id, 6 + video_id % 8 AS n,
         |         4 + video_id % 13 AS w, 3 + video_id % 11 AS h
         |  FROM read_parquet('${graft.functions.MediaFixture.fixtureDir}/videos/*.parquet')),
         |fs AS (SELECT video_id, w, h, unnest(generate_series(0, n - 1, 3)) AS f FROM vids),
         |xs AS (SELECT video_id, f, w, h, unnest(generate_series(0, w - 1)) AS x FROM fs),
         |px AS (SELECT video_id, f, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM xs)
         |SELECT video_id, CAST(f AS INTEGER) AS frame_idx,
         |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         |  CAST(sum((17*x + 29*y + 31*(video_id*31 + f*7)) % 256) AS BIGINT) AS sum_r,
         |  CAST(sum(( 3*x +  7*y + 11*(video_id*31 + f*7)) % 256) AS BIGINT) AS sum_g,
         |  CAST(sum((13*x +  5*y + 19*(video_id*31 + f*7)) % 256) AS BIGINT) AS sum_b
         |FROM px GROUP BY video_id, f, w, h ORDER BY video_id, f""".stripMargin,

    // q61: dHash over the sampled video frames (q57's chain with the
    // frame seed video_id*31 + f*7), then the frame-level near-dup
    // verdict — the oracle brute-forces Hamming ≤ 3 over all frame
    // pairs (fixture-scale affordable), which the engine's exact
    // 4×16-bit banding equals by pigeonhole.
    "q61_video_frame_near_dup" ->
      s"""WITH vids AS (
         |  SELECT video_id, 6 + video_id % 8 AS n,
         |         4 + video_id % 13 AS w, 3 + video_id % 11 AS h
         |  FROM read_parquet('${graft.functions.MediaFixture.fixtureDir}/videos/*.parquet')),
         |fs AS (SELECT video_id, w, h, unnest(generate_series(0, n - 1, 3)) AS f FROM vids),
         |ks AS (SELECT video_id, f, video_id * 31 + f * 7 AS sd, w, h,
         |         unnest(generate_series(0, 71)) AS k FROM fs),
         |g AS (SELECT video_id, f, k % 9 AS gi, k // 9 AS gj,
         |        (299*((17*(((k % 9) * w) // 9) + 29*(((k // 9) * h) // 8) + 31*sd) % 256)
         |       + 587*(( 3*(((k % 9) * w) // 9) +  7*(((k // 9) * h) // 8) + 11*sd) % 256)
         |       + 114*((13*(((k % 9) * w) // 9) +  5*(((k // 9) * h) // 8) + 19*sd) % 256)) // 1000 AS gray
         |      FROM ks),
         |bits AS (SELECT a.video_id, a.f, a.gj * 8 + a.gi AS k,
         |           CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
         |         FROM g a JOIN g b ON a.video_id = b.video_id AND a.f = b.f
         |            AND a.gj = b.gj AND b.gi = a.gi + 1
         |         WHERE a.gi < 8),
         |halves AS (SELECT video_id, f,
         |    CAST(sum(CASE WHEN k >= 32 THEN bit * (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END) AS BIGINT) AS hi,
         |    CAST(sum(CASE WHEN k < 32 THEN bit * (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS lo
         |  FROM bits GROUP BY video_id, f),
         |fr AS (SELECT video_id, f, hi, lo,
         |         video_id * 1000000 + f AS fk,
         |         format('{:08x}', hi) || format('{:08x}', lo) AS dhash_hex
         |       FROM halves),
         |dup AS (SELECT b.fk, min(a.fk) AS dup_fk
         |        FROM fr a JOIN fr b ON a.fk < b.fk
         |          AND bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
         |        GROUP BY b.fk)
         |SELECT fr.video_id, CAST(fr.f AS INTEGER) AS frame_idx, fr.dhash_hex,
         |  coalesce(dup.dup_fk, fr.fk) // 1000000 AS dup_video_id,
         |  CAST(coalesce(dup.dup_fk, fr.fk) % 1000000 AS INTEGER) AS dup_frame_idx,
         |  (coalesce(dup.dup_fk, fr.fk) != fr.fk) AS is_dup
         |FROM fr LEFT JOIN dup ON fr.fk = dup.fk
         |ORDER BY fr.video_id, fr.f""".stripMargin,

    // q67: interval self-join, phrased naively — DuckDB handles the
    // inequality join directly at oracle scale; the engine's binned
    // equi-join produces the identical pair set.
    "q67_event_range_join" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t
        |           FROM events)
        |SELECT a.user_id, a.t AS ts_a_us, b.t AS ts_b_us,
        |  a.event_type AS type_a, b.event_type AS type_b,
        |  b.t - a.t AS gap_us
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |  AND b.t > a.t AND b.t - a.t <= 600000000
        |ORDER BY 1, 2, 3, 4, 5""".stripMargin,

    // q68: lag + conditional cumulative sum sessionizer — identical
    // two-window phrasing; tie-safe (gap-0 events share a session
    // under any tie order), so the aggregates match exactly.
    "q68_sessionize" -> q68SessionizeSql,

    // q68b: the skew-safe two-phase engine plan produces the SAME
    // session partition as q68's single-window fold (phase-2's
    // boundary merge is exactly the cuts the chunking introduced), so
    // the oracle IS q68's — the twins differ only in plan shape.
    "q68b_sessionize_skew" -> q68SessionizeSql,

    // q70: deterministic HyperLogLog replay — same md5 hash, same
    // base-2-string rank, exact integer registers and scaled harmonic
    // sum, one IEEE-identical double divide at the end.
    "q70_hll_distinct" ->
      """WITH h AS (SELECT event_type, user_id,
        |    CAST('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM events),
        |r AS (SELECT event_type, h // 2251799813685248 AS bucket,
        |        CASE WHEN h % 2251799813685248 = 0 THEN 52
        |             ELSE 52 - length(format('{:b}', h % 2251799813685248))
        |        END AS rank
        |      FROM h),
        |regs AS (SELECT event_type, bucket, max(rank) AS mj
        |         FROM r GROUP BY event_type, bucket),
        |sk AS (SELECT event_type,
        |        sum(CAST(1 AS BIGINT) << CAST(52 - mj AS INTEGER))
        |          + (512 - count(*)) * (CAST(1 AS BIGINT) << 52) AS s_scaled,
        |        CAST(512 - count(*) AS BIGINT) AS v_zero
        |       FROM regs GROUP BY event_type),
        |ex AS (SELECT event_type,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
        |       FROM events GROUP BY event_type),
        |est AS (SELECT event_type, s_scaled, v_zero,
        |  CAST(round((0.7213 / (1 + 1.079 / 512)) * 512 * 512
        |    * 4503599627370496.0 / s_scaled) AS BIGINT) AS hll_est
        |  FROM sk)
        |SELECT est.event_type, est.hll_est,
        |  CASE WHEN v_zero > 0 AND hll_est < 1280
        |       THEN CAST(round(512 * ln(CAST(512 AS DOUBLE) / v_zero)) AS BIGINT)
        |       ELSE hll_est END AS est_corrected,
        |  ex.n_exact, est.v_zero
        |FROM est JOIN ex ON est.event_type = ex.event_type
        |ORDER BY est.event_type""".stripMargin,

    // q70b: the merge proof — per-part registers (event_id % 4 row
    // split), register-wise max merge, then q70's exact estimator over
    // both the merged and the directly-built registers.
    "q70b_hll_merge" ->
      """WITH h AS (SELECT event_type, event_id % 4 AS part,
        |    CAST('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM events),
        |r AS (SELECT event_type, part, h // 2251799813685248 AS bucket,
        |        CASE WHEN h % 2251799813685248 = 0 THEN 52
        |             ELSE 52 - length(format('{:b}', h % 2251799813685248))
        |        END AS rank
        |      FROM h),
        |pregs AS (SELECT event_type, part, bucket, max(rank) AS mj
        |          FROM r GROUP BY event_type, part, bucket),
        |mregs AS (SELECT event_type, bucket, max(mj) AS mj
        |          FROM pregs GROUP BY event_type, bucket),
        |dregs AS (SELECT event_type, bucket, max(rank) AS mj
        |          FROM r GROUP BY event_type, bucket),
        |skm AS (SELECT event_type,
        |         sum(CAST(1 AS BIGINT) << CAST(52 - mj AS INTEGER))
        |           + (512 - count(*)) * (CAST(1 AS BIGINT) << 52) AS s_scaled
        |        FROM mregs GROUP BY event_type),
        |skd AS (SELECT event_type,
        |         sum(CAST(1 AS BIGINT) << CAST(52 - mj AS INTEGER))
        |           + (512 - count(*)) * (CAST(1 AS BIGINT) << 52) AS s_scaled
        |        FROM dregs GROUP BY event_type),
        |em AS (SELECT event_type,
        |         CAST(round((0.7213 / (1 + 1.079 / 512)) * 512 * 512
        |           * 4503599627370496.0 / s_scaled) AS BIGINT) AS hll_est_merged
        |       FROM skm),
        |ed AS (SELECT event_type,
        |         CAST(round((0.7213 / (1 + 1.079 / 512)) * 512 * 512
        |           * 4503599627370496.0 / s_scaled) AS BIGINT) AS hll_est_direct
        |       FROM skd),
        |np AS (SELECT event_type, CAST(count(DISTINCT part) AS BIGINT) AS n_parts
        |       FROM pregs GROUP BY event_type)
        |SELECT em.event_type, np.n_parts, em.hll_est_merged, ed.hll_est_direct,
        |  (em.hll_est_merged = ed.hll_est_direct) AS merge_ok
        |FROM em JOIN ed ON em.event_type = ed.event_type
        |JOIN np ON em.event_type = np.event_type
        |ORDER BY em.event_type""".stripMargin,

    // q73: count-min replay — same md5 cell hashes, every counter
    // recomputed exactly, min-over-rows estimate for the exact top-20.
    "q73_heavy_hitters" ->
      s"""WITH tk AS (SELECT unnest(w) AS tok FROM ($docsWithWords) d),
         |ex AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_exact
         |       FROM tk GROUP BY tok),
         |top AS (SELECT tok, n_exact FROM ex
         |        ORDER BY n_exact DESC, tok LIMIT 20),
         |ds AS (SELECT unnest(range(0, 4)) AS d),
         |cnt AS (SELECT ds.d,
         |         CAST('0x' || substr(md5('cm' || CAST(ds.d AS VARCHAR) || ':' || tk.tok), 1, 15) AS BIGINT) % 1024 AS cell,
         |         CAST(count(*) AS BIGINT) AS c
         |        FROM tk CROSS JOIN ds GROUP BY 1, 2),
         |tc AS (SELECT top.tok, top.n_exact, ds.d,
         |         CAST('0x' || substr(md5('cm' || CAST(ds.d AS VARCHAR) || ':' || top.tok), 1, 15) AS BIGINT) % 1024 AS cell
         |       FROM top CROSS JOIN ds),
         |est AS (SELECT tc.tok, tc.n_exact, min(cnt.c) AS n_est
         |        FROM tc JOIN cnt ON cnt.d = tc.d AND cnt.cell = tc.cell
         |        GROUP BY tc.tok, tc.n_exact)
         |SELECT tok AS token, n_exact, n_est FROM est
         |ORDER BY n_exact DESC, token""".stripMargin,

    // q75: the LEFT OUTER funnel — q72's matches plus one −1-sentinel
    // abandonment row per unmatched view the engine's watermark has
    // PROVEN unmatchable (view_ts + gap behind the global watermark =
    // min over both sides of ms-floored max event time − 1 h); views
    // still inside the horizon at stream end are withheld on both
    // sides of the compare.
    "q75_stream_funnel_outer" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t
        |           FROM events),
        |v AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'view'),
        |b AS (SELECT event_id, user_id, t FROM e
        |      WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(t) // 1000 FROM v),
        |                    (SELECT max(t) // 1000 FROM b)) * 1000
        |         - 3600000000 AS w),
        |m AS (SELECT v.user_id, v.t AS t_view_us, b.t AS t_buy_us,
        |        v.event_id AS view_id, b.event_id AS purchase_id,
        |        b.t - v.t AS gap_us
        |      FROM v JOIN b ON v.user_id = b.user_id
        |        AND b.t > v.t AND b.t - v.t <= 600000000),
        |u AS (SELECT v.user_id, v.t AS t_view_us,
        |        CAST(-1 AS BIGINT) AS t_buy_us, v.event_id AS view_id,
        |        CAST(-1 AS BIGINT) AS purchase_id,
        |        CAST(-1 AS BIGINT) AS gap_us
        |      FROM v, wm
        |      WHERE v.t + 600000000 < wm.w
        |        AND NOT EXISTS (SELECT 1 FROM b
        |          WHERE b.user_id = v.user_id AND b.t > v.t
        |            AND b.t - v.t <= 600000000))
        |SELECT * FROM m UNION ALL SELECT * FROM u
        |ORDER BY user_id, t_view_us, t_buy_us, view_id, purchase_id"""
        .stripMargin,

    // q75b: the FULL OUTER funnel — q75's three arms plus the
    // attribution-less purchase: a buy with no in-gap preceding view
    // and b.t strictly behind the global watermark (the buy-side
    // eviction point: a future view has event time >= wm and a
    // matching buy must be strictly later). In-horizon buys are
    // withheld on both sides of the compare, like views.
    "q75b_stream_funnel_full" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t
        |           FROM events),
        |v AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'view'),
        |b AS (SELECT event_id, user_id, t FROM e
        |      WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(t) // 1000 FROM v),
        |                    (SELECT max(t) // 1000 FROM b)) * 1000
        |         - 3600000000 AS w),
        |m AS (SELECT v.user_id, v.t AS t_view_us, b.t AS t_buy_us,
        |        v.event_id AS view_id, b.event_id AS purchase_id,
        |        b.t - v.t AS gap_us
        |      FROM v JOIN b ON v.user_id = b.user_id
        |        AND b.t > v.t AND b.t - v.t <= 600000000),
        |u AS (SELECT v.user_id, v.t AS t_view_us,
        |        CAST(-1 AS BIGINT) AS t_buy_us, v.event_id AS view_id,
        |        CAST(-1 AS BIGINT) AS purchase_id,
        |        CAST(-1 AS BIGINT) AS gap_us
        |      FROM v, wm
        |      WHERE v.t + 600000000 < wm.w
        |        AND NOT EXISTS (SELECT 1 FROM b
        |          WHERE b.user_id = v.user_id AND b.t > v.t
        |            AND b.t - v.t <= 600000000)),
        |u2 AS (SELECT b.user_id, CAST(-1 AS BIGINT) AS t_view_us,
        |        b.t AS t_buy_us, CAST(-1 AS BIGINT) AS view_id,
        |        b.event_id AS purchase_id, CAST(-1 AS BIGINT) AS gap_us
        |      FROM b, wm
        |      WHERE b.t < wm.w
        |        AND NOT EXISTS (SELECT 1 FROM v
        |          WHERE v.user_id = b.user_id AND b.t > v.t
        |            AND b.t - v.t <= 600000000))
        |SELECT * FROM m UNION ALL SELECT * FROM u UNION ALL
        |SELECT * FROM u2
        |ORDER BY user_id, t_view_us, t_buy_us, view_id, purchase_id"""
        .stripMargin,

    // q72: the stream-stream interval join's batch twin — the plain
    // inequality join restricted to the (view, purchase) type pair;
    // on the single-batch fixture drain the streaming join emits
    // exactly these matches.
    "q72_stream_funnel_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t
        |           FROM events)
        |SELECT a.user_id, a.t AS t_view_us, b.t AS t_buy_us,
        |  a.event_id AS view_id, b.event_id AS purchase_id,
        |  b.t - a.t AS gap_us
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |  AND a.event_type = 'view' AND b.event_type = 'purchase'
        |  AND b.t > a.t AND b.t - a.t <= 600000000
        |ORDER BY a.user_id, a.t, b.t, a.event_id, b.event_id""".stripMargin,

    // q71: histogram-quantile sketch — exact percentiles by the same
    // integer rank formula at a per-source row_number, estimates from
    // the identical 8-wide/256-bin cumulative histogram.
    "q71_quantile_sketch" ->
      s"""WITH tok AS (SELECT source,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS nt
        |  FROM documents),
        |n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |      FROM tok GROUP BY source),
        |r AS (SELECT source, n_docs,
        |        (50 * n_docs + 99) // 100 AS r50,
        |        (95 * n_docs + 99) // 100 AS r95,
        |        (99 * n_docs + 99) // 100 AS r99
        |      FROM n),
        |rk AS (SELECT source, nt,
        |         row_number() OVER (PARTITION BY source ORDER BY nt) AS rn
        |       FROM tok),
        |ex AS (SELECT rk.source,
        |         max(CASE WHEN rn = r50 THEN nt END) AS p50_exact,
        |         max(CASE WHEN rn = r95 THEN nt END) AS p95_exact,
        |         max(CASE WHEN rn = r99 THEN nt END) AS p99_exact
        |       FROM rk JOIN r USING (source) GROUP BY rk.source),
        |hb AS (SELECT source, least(nt // 8, 255) AS bin,
        |         CAST(count(*) AS BIGINT) AS c
        |       FROM tok GROUP BY source, least(nt // 8, 255)),
        |hc AS (SELECT source, bin,
        |         sum(c) OVER (PARTITION BY source ORDER BY bin
        |           ROWS UNBOUNDED PRECEDING) AS cum
        |       FROM hb),
        |es AS (SELECT hc.source,
        |         CAST(min(CASE WHEN cum >= r50 THEN (bin + 1) * 8 END) AS BIGINT) AS p50_est,
        |         CAST(min(CASE WHEN cum >= r95 THEN (bin + 1) * 8 END) AS BIGINT) AS p95_est,
        |         CAST(min(CASE WHEN cum >= r99 THEN (bin + 1) * 8 END) AS BIGINT) AS p99_est
        |       FROM hc JOIN r USING (source) GROUP BY hc.source)
        |SELECT r.source, r.n_docs,
        |  ex.p50_exact, ex.p95_exact, ex.p99_exact,
        |  es.p50_est, es.p95_est, es.p99_est
        |FROM r JOIN ex ON r.source = ex.source
        |JOIN es ON r.source = es.source
        |ORDER BY r.source""".stripMargin,

    // q71b: the sketch-only twin — q71's histogram arm verbatim, no
    // exact/row_number arm (the engine side has no per-group sort; the
    // estimates must still hash-equal the shared formula).
    "q71b_quantile_sketch_only" ->
      s"""WITH tok AS (SELECT source,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS nt
        |  FROM documents),
        |n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |      FROM tok GROUP BY source),
        |r AS (SELECT source, n_docs,
        |        (50 * n_docs + 99) // 100 AS r50,
        |        (95 * n_docs + 99) // 100 AS r95,
        |        (99 * n_docs + 99) // 100 AS r99
        |      FROM n),
        |hb AS (SELECT source, least(nt // 8, 255) AS bin,
        |         CAST(count(*) AS BIGINT) AS c
        |       FROM tok GROUP BY source, least(nt // 8, 255)),
        |hc AS (SELECT source, bin,
        |         sum(c) OVER (PARTITION BY source ORDER BY bin
        |           ROWS UNBOUNDED PRECEDING) AS cum
        |       FROM hb),
        |es AS (SELECT hc.source,
        |         CAST(min(CASE WHEN cum >= r50 THEN (bin + 1) * 8 END) AS BIGINT) AS p50_est,
        |         CAST(min(CASE WHEN cum >= r95 THEN (bin + 1) * 8 END) AS BIGINT) AS p95_est,
        |         CAST(min(CASE WHEN cum >= r99 THEN (bin + 1) * 8 END) AS BIGINT) AS p99_est
        |       FROM hc JOIN r USING (source) GROUP BY hc.source)
        |SELECT r.source, r.n_docs, es.p50_est, es.p95_est, es.p99_est
        |FROM r JOIN es ON r.source = es.source
        |ORDER BY r.source""".stripMargin,

    // q73b: the sketch-only candidate path must land on the SAME
    // report as the exact arm — the oracle is q73's SQL verbatim
    // (exact top-20 + count-min replay); a candidate-recall hole on
    // the fixture fails the hash.
    "q73b_heavy_hitters_sketch" ->
      s"""WITH tk AS (SELECT unnest(w) AS tok FROM ($docsWithWords) d),
         |ex AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_exact
         |       FROM tk GROUP BY tok),
         |top AS (SELECT tok, n_exact FROM ex
         |        ORDER BY n_exact DESC, tok LIMIT 20),
         |ds AS (SELECT unnest(range(0, 4)) AS d),
         |cnt AS (SELECT ds.d,
         |         CAST('0x' || substr(md5('cm' || CAST(ds.d AS VARCHAR) || ':' || tk.tok), 1, 15) AS BIGINT) % 1024 AS cell,
         |         CAST(count(*) AS BIGINT) AS c
         |        FROM tk CROSS JOIN ds GROUP BY 1, 2),
         |tc AS (SELECT top.tok, top.n_exact, ds.d,
         |         CAST('0x' || substr(md5('cm' || CAST(ds.d AS VARCHAR) || ':' || top.tok), 1, 15) AS BIGINT) % 1024 AS cell
         |       FROM top CROSS JOIN ds),
         |est AS (SELECT tc.tok, tc.n_exact, min(cnt.c) AS n_est
         |        FROM tc JOIN cnt ON cnt.d = tc.d AND cnt.cell = tc.cell
         |        GROUP BY tc.tok, tc.n_exact)
         |SELECT tok AS token, n_exact, n_est FROM est
         |ORDER BY n_exact DESC, token""".stripMargin,

    // q69: the conversion matrix over q67's naive-join twin; the
    // |types|² spine keeps zero-conversion cells present, and the
    // rate is the engine-exact rdiv4 integer division.
    "q69_funnel_matrix" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
        |ty AS (SELECT DISTINCT event_type FROM e),
        |tot AS (SELECT event_type AS type_a, CAST(count(*) AS BIGINT) AS n_a
        |        FROM e GROUP BY event_type),
        |pr AS (SELECT DISTINCT a.user_id, a.t AS ta,
        |         a.event_type AS type_a, b.event_type AS type_b
        |       FROM e a JOIN e b ON a.user_id = b.user_id
        |         AND b.t > a.t AND b.t - a.t <= 600000000),
        |cv AS (SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_conv
        |       FROM pr GROUP BY type_a, type_b)
        |SELECT ta.event_type AS type_a, tb.event_type AS type_b, tot.n_a,
        |  coalesce(cv.n_conv, 0) AS n_converted,
        |  CAST((coalesce(cv.n_conv, 0) * 20000 + tot.n_a)
        |    // (2 * tot.n_a) AS DOUBLE) / 10000.0 AS conv_rate
        |FROM ty ta CROSS JOIN ty tb
        |JOIN tot ON tot.type_a = ta.event_type
        |LEFT JOIN cv ON cv.type_a = ta.event_type
        |            AND cv.type_b = tb.event_type
        |ORDER BY type_a, type_b""".stripMargin,

    // q66: the streaming quality-gate ledger — batch twin of the
    // running (source × disposition) docs/tokens aggregate over the
    // q46 cascade.
    "q66_stream_quality_yield" ->
      s"""WITH $q46CascadeCtes,
         |src AS (SELECT doc_id, source FROM documents)
         |SELECT src.source,
         |  CASE WHEN fc.keep THEN 'kept'
         |       ELSE 'rule:' || fc.reject_reason END AS disposition,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(fc.n_tokens) AS BIGINT) AS n_tokens
         |FROM fc JOIN src USING (doc_id)
         |GROUP BY src.source, disposition
         |ORDER BY source, disposition""".stripMargin,

    // q65: dedup-method agreement — exact md5 pairs, q15's verified
    // LSH pairs, and SimHash Hamming ≤ 3 pairs (brute-forced here;
    // the engine's 4×8-bit banding equals it by pigeonhole), merged
    // with per-method flags.
    "q65_dedup_agreement" ->
      s"""WITH $q15PairCtes,
         |shh AS (
         |  SELECT doc_id, CAST(
         |    list_sum(list_transform(range(0, 32), j ->
         |      CASE WHEN list_sum(list_transform(hw, h ->
         |             CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |           THEN 1 << j ELSE 0 END)) AS BIGINT) AS h
         |  FROM (SELECT doc_id,
         |          list_transform(w, t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)) AS hw
         |        FROM ($docsWithWords) d0)),
         |ex AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |       FROM documents a JOIN documents b
         |         ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id),
         |lshp AS (SELECT doc_a, doc_b FROM v WHERE jaccard >= 0.8),
         |smp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |        FROM shh a JOIN shh b ON a.doc_id < b.doc_id
         |          AND bit_count(xor(a.h, b.h)) <= 3),
         |u AS (SELECT doc_a, doc_b, max(e) AS e, max(l) AS l, max(sm) AS sm
         |      FROM (SELECT doc_a, doc_b, 1 AS e, 0 AS l, 0 AS sm FROM ex
         |            UNION ALL SELECT doc_a, doc_b, 0, 1, 0 FROM lshp
         |            UNION ALL SELECT doc_a, doc_b, 0, 0, 1 FROM smp)
         |      GROUP BY doc_a, doc_b)
         |SELECT doc_a, doc_b, (e = 1) AS by_exact, (l = 1) AS by_lsh,
         |  (sm = 1) AS by_simhash, CAST(e + l + sm AS BIGINT) AS n_methods
         |FROM u ORDER BY doc_a, doc_b""".stripMargin,

    // q65b: the star-shaped agreement — per-doc membership against
    // each method's canonical. Exact canon via min-per-md5-group (hash
    // identity is transitive), LSH/SimHash canons via the recursive
    // min-reachable closure over their pair relations (the engine's
    // connected-component labeling), canons coalesced to self for
    // non-members so every column stays non-null.
    "q65b_dedup_agreement_star" ->
      s"""WITH RECURSIVE $q15PairCtes,
         |shh AS (
         |  SELECT doc_id, CAST(
         |    list_sum(list_transform(range(0, 32), j ->
         |      CASE WHEN list_sum(list_transform(hw, h ->
         |             CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |           THEN 1 << j ELSE 0 END)) AS BIGINT) AS h
         |  FROM (SELECT doc_id,
         |          list_transform(w, t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)) AS hw
         |        FROM ($docsWithWords) d0)),
         |eth AS (SELECT doc_id, md5(text) AS th FROM documents),
         |eg AS (SELECT th, min(doc_id) AS canon, count(*) AS n
         |       FROM eth GROUP BY th),
         |exd AS (SELECT eth.doc_id, eg.canon FROM eth JOIN eg USING (th)
         |        WHERE eg.n > 1),
         |lshp AS (SELECT doc_a, doc_b FROM v WHERE jaccard >= 0.8),
         |le AS (SELECT doc_a AS u, doc_b AS vtx FROM lshp
         |       UNION SELECT doc_b, doc_a FROM lshp),
         |lreach(u, vtx) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM le) l0
         |  UNION
         |  SELECT r.u, e.vtx FROM lreach r JOIN le e ON r.vtx = e.u),
         |lcl AS (SELECT u AS doc_id, min(vtx) AS canon
         |        FROM lreach GROUP BY u),
         |smp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |        FROM shh a JOIN shh b ON a.doc_id < b.doc_id
         |          AND bit_count(xor(a.h, b.h)) <= 3),
         |se AS (SELECT doc_a AS u, doc_b AS vtx FROM smp
         |       UNION SELECT doc_b, doc_a FROM smp),
         |sreach(u, vtx) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM se) s0
         |  UNION
         |  SELECT r.u, e.vtx FROM sreach r JOIN se e ON r.vtx = e.u),
         |scl AS (SELECT u AS doc_id, min(vtx) AS canon
         |        FROM sreach GROUP BY u),
         |uni AS (SELECT DISTINCT doc_id FROM (
         |          SELECT doc_id FROM exd UNION ALL SELECT doc_id FROM lcl
         |          UNION ALL SELECT doc_id FROM scl) z)
         |SELECT uni.doc_id,
         |  (exd.doc_id IS NOT NULL) AS by_exact,
         |  (lcl.doc_id IS NOT NULL) AS by_lsh,
         |  (scl.doc_id IS NOT NULL) AS by_simhash,
         |  coalesce(exd.canon, uni.doc_id) AS exact_canon,
         |  coalesce(lcl.canon, uni.doc_id) AS lsh_canon,
         |  coalesce(scl.canon, uni.doc_id) AS sim_canon,
         |  CAST(CAST(exd.doc_id IS NOT NULL AS INTEGER)
         |    + CAST(lcl.doc_id IS NOT NULL AS INTEGER)
         |    + CAST(scl.doc_id IS NOT NULL AS INTEGER) AS BIGINT) AS n_methods
         |FROM uni
         |LEFT JOIN exd ON uni.doc_id = exd.doc_id
         |LEFT JOIN lcl ON uni.doc_id = lcl.doc_id
         |LEFT JOIN scl ON uni.doc_id = scl.doc_id
         |ORDER BY uni.doc_id""".stripMargin,

    // q63: streaming image dedup — q57's formula-replayed dHash, then
    // min-per-hash (equals the engine's first-seen canonical on the
    // single-batch fixture drain); every image gets a verdict row.
    "q63_stream_image_dedup" -> q63ImageDedupSql,

    // q63b: the TTL-bounded twin — on the single-batch fixture drain
    // no event-time timeout fires before the output is final, so the
    // oracle is q63's verbatim (identical result, bounded state; the
    // eviction semantics are pinned by the multi-batch spec).
    "q63b_stream_image_dedup_ttl" -> q63ImageDedupSql,

    // q62: the audio envelope fingerprint (65 equal windows by
    // t*65//n, integer |sample| energy, 64 adjacent-delta bits) and
    // the clip-level near-dup verdict, brute-forced over Hamming ≤ 3
    // — the engine's banding equals it by pigeonhole.
    "q62_audio_near_dup" ->
      s"""WITH clips AS (
         |  SELECT clip_id, 800 + clip_id % 7 * 160 AS n
         |  FROM read_parquet('${graft.functions.MediaFixture.fixtureDir}/audio/*.parquet')),
         |sm AS (SELECT clip_id, n, unnest(generate_series(0, n - 1)) AS t FROM clips),
         |e AS (SELECT clip_id, (t * 65) // n AS wi,
         |        sum(abs(((31 * t + 17 * clip_id) % 8192) - 4096)) AS en
         |      FROM sm GROUP BY clip_id, (t * 65) // n),
         |bits AS (SELECT a.clip_id, a.wi AS k,
         |           CASE WHEN b.en > a.en THEN 1 ELSE 0 END AS bit
         |         FROM e a JOIN e b ON a.clip_id = b.clip_id AND b.wi = a.wi + 1
         |         WHERE a.wi < 64),
         |halves AS (SELECT clip_id,
         |    CAST(sum(CASE WHEN k >= 32 THEN bit * (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END) AS BIGINT) AS hi,
         |    CAST(sum(CASE WHEN k < 32 THEN bit * (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS lo
         |  FROM bits GROUP BY clip_id),
         |fr AS (SELECT clip_id, hi, lo,
         |         format('{:08x}', hi) || format('{:08x}', lo) AS ahash_hex
         |       FROM halves),
         |dup AS (SELECT b.clip_id, min(a.clip_id) AS dup_clip_id
         |        FROM fr a JOIN fr b ON a.clip_id < b.clip_id
         |          AND bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
         |        GROUP BY b.clip_id)
         |SELECT fr.clip_id, fr.ahash_hex,
         |  coalesce(dup.dup_clip_id, fr.clip_id) AS dup_clip_id,
         |  (coalesce(dup.dup_clip_id, fr.clip_id) != fr.clip_id) AS is_dup
         |FROM fr LEFT JOIN dup ON fr.clip_id = dup.clip_id
         |ORDER BY fr.clip_id""".stripMargin,

    // PII scrub: same deterministic injection from doc_id, same
    // Java∩RE2 regexes; DuckDB regexp_replace needs the 'g' flag to
    // match Spark's replace-all default.
    "q49_pii_scrub" ->
      """WITH aug AS (SELECT doc_id, text
        |  || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END
        |  || CASE WHEN doc_id % 4 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
        |  || CASE WHEN doc_id % 5 = 0 THEN ' ssn ' || CAST(100 + doc_id % 900 AS VARCHAR) || '-' || CAST(10 + doc_id % 90 AS VARCHAR) || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END AS t
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ids,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g') AS clean_text
        |  FROM aug)
        |SELECT doc_id, n_emails, n_ips, n_ids, clean_text,
        |  n_emails + n_ips + n_ids AS pii_total
        |FROM c ORDER BY doc_id""".stripMargin,

    // Domain blocklist gate: same injected URL, same extraction regex,
    // blocklist reconstructed with generate_series.
    "q50_domain_filter" ->
      """WITH u AS (SELECT doc_id,
        |    'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example.org/p' || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |d AS (SELECT doc_id,
        |    regexp_extract(url, '^https?://([^/]+)/', 1) AS domain FROM u),
        |b AS (SELECT 'site' || CAST(i AS VARCHAR) || '.example.org' AS domain
        |      FROM generate_series(0, 19) t(i) WHERE i % 3 = 0)
        |SELECT d.doc_id, d.domain, (b.domain IS NOT NULL) AS is_blocked
        |FROM d LEFT JOIN b ON d.domain = b.domain
        |ORDER BY d.doc_id""".stripMargin,

    "q51_semantic_dedup" ->
      // Twin of Similarity.semanticDedup: the micro-integer k-means
      // quantizer assignment (ivfCtes — same init order, same Lloyd
      // rounds, same nd/cell tiebreak), within-cell pairs at cosine
      // >= 0.45 (same round-6 compare as q24/q28), then q28's
      // recursive min-id closure; singletons keep themselves.
      s"""WITH RECURSIVE ${ivfCtes(16, 2)},
         |p AS (SELECT a.vec_id AS u, b.vec_id AS v
         |      FROM asg a JOIN asg b
         |        ON a.cell = b.cell AND a.vec_id < b.vec_id
         |      WHERE round(${vdot("a.embedding", "b.embedding")} / (a.norm * b.norm), 6) >= 0.45),
         |e AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
         |reach(u, v) AS (
         |  SELECT u, v FROM e
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u),
         |canon AS (SELECT u AS vec_id, least(u, min(v)) AS canon_id
         |          FROM reach GROUP BY u)
         |SELECT asg.vec_id, CAST(asg.cell AS BIGINT) AS cell,
         |  coalesce(canon.canon_id, asg.vec_id) AS canon_id,
         |  (coalesce(canon.canon_id, asg.vec_id) = asg.vec_id) AS keep
         |FROM asg LEFT JOIN canon USING (vec_id)
         |ORDER BY asg.vec_id""".stripMargin,

    "q52_classifier_filter" ->
      // Twin of q52: same 60-bit token hash, same integer micro-unit
      // weights (order-insensitive exact sum), same zero-logit gate.
      s"""SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(list_sum(list_transform(w,
         |    t -> CAST('0x' || substr(md5('clf:' || t), 1, 15) AS BIGINT) % 2001 - 1000))
         |    AS BIGINT) AS logit_micro,
         |  (CAST(list_sum(list_transform(w,
         |    t -> CAST('0x' || substr(md5('clf:' || t), 1, 15) AS BIGINT) % 2001 - 1000))
         |    AS BIGINT) > 0) AS keep
         |FROM ($docsWithWords) d
         |ORDER BY doc_id""".stripMargin,

    "q53_corpus_recipe" ->
      // Twin of the staged recipe: q46's cascade (fc), exact dedup
      // among rule-survivors, q15's LSH pairs restricted to remaining
      // survivors + q34's recursive closure, then the q36-style 5-gram
      // decontamination of train-split survivors against the test
      // split. First failing stage names the disposition. The CTE
      // chain is shared with q64's yield accounting.
      s"""WITH RECURSIVE $corpusRecipeCtes
         |SELECT doc_id, split, disposition, keep FROM recipe
         |ORDER BY doc_id""".stripMargin,

    // q64: the recipe's yield ledger — docs/tokens per (source,
    // disposition) over the SAME recipe CTEs as q53.
    "q64_recipe_yield" -> q64YieldSql,

    // q64b: the STAGED path (engine writes q53's disposition table to
    // parquet once, the ledger reads it back) against the same
    // recompute SQL — the gate proves write → read → aggregate equals
    // recompute → aggregate, i.e. the staging contract holds.
    "q64b_recipe_yield_staged" -> q64YieldSql,

    // q84: DSIR hashed-bigram importance weights — bucket histograms
    // (target = src1-3 vs raw), add-1 smoothing over D=64, per-bucket
    // micro log10-ratio (q56's one-log-of-exact-integer-ratio
    // convention), per-doc exact integer sum.
    "q84_dsir_weights" ->
      s"""WITH g0 AS (SELECT doc_id,
         |    source IN ('src1', 'src2', 'src3') AS is_target,
         |    list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS gs
         |  FROM (SELECT doc_id, source, string_split(trim(text), ' ') AS w
         |        FROM documents) d0
         |  WHERE len(w) >= 2),
         |g AS (SELECT doc_id, is_target,
         |        CAST('0x' || substr(md5('dsir:' || unnest(gs)), 1, 8)
         |          AS BIGINT) % 64 AS b
         |      FROM g0),
         |raw AS (SELECT b, count(*) AS cr,
         |          sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct
         |        FROM g GROUP BY b),
         |tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM raw),
         |lr AS (SELECT b,
         |         CAST(round(log10(CAST((ct + 1) * (tr + 64) AS DOUBLE) /
         |           CAST((cr + 1) * (tt + 64) AS DOUBLE)) * 1e6)
         |           AS BIGINT) AS lr_micro
         |       FROM raw, tot)
         |SELECT doc_id, is_target, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(lr_micro) AS BIGINT) AS w_micro,
         |  CAST(sum(lr_micro) AS DOUBLE) / 1000000.0 AS logweight
         |FROM g JOIN lr USING (b)
         |GROUP BY doc_id, is_target ORDER BY doc_id""".stripMargin,

    // q85: deterministic epoch-shard shuffle — the permutation key is
    // md5('shuf:'||epoch||':'||doc_id); shard = key's 32-bit prefix
    // mod 8; position = dense rank within (epoch, shard) by full key.
    "q85_epoch_shard_shuffle" ->
      """WITH e AS (SELECT CAST(unnest(range(2)) AS INTEGER) AS epoch),
        |k AS (SELECT doc_id, epoch,
        |        md5('shuf:' || CAST(epoch AS VARCHAR) || ':'
        |            || CAST(doc_id AS VARCHAR)) AS skey
        |      FROM documents, e),
        |s AS (SELECT *,
        |        CAST(CAST('0x' || substr(skey, 1, 8) AS BIGINT) % 8
        |          AS INTEGER) AS shard
        |      FROM k)
        |SELECT epoch, shard,
        |  CAST(row_number() OVER (PARTITION BY epoch, shard
        |    ORDER BY skey, doc_id) AS INTEGER) AS pos,
        |  doc_id
        |FROM s ORDER BY epoch, shard, pos""".stripMargin,

    // q87: streaming DSIR gate — model replayed from the STANDING
    // corpus only (doc_id % 10 <> 0) over the FULL 0..63 bucket
    // domain, arrivals (doc_id % 10 = 0) scored and gated at
    // w_micro >= 0.
    "q87_stream_dsir_gate" ->
      s"""WITH w0 AS (SELECT doc_id,
         |    source IN ('src1', 'src2', 'src3') AS is_target,
         |    string_split(trim(text), ' ') AS w FROM documents),
         |c0 AS (SELECT is_target,
         |    list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS gs
         |  FROM w0 WHERE doc_id % 10 <> 0 AND len(w) >= 2),
         |cg AS (SELECT is_target,
         |        CAST('0x' || substr(md5('dsir:' || unnest(gs)), 1, 8)
         |          AS BIGINT) % 64 AS b
         |      FROM c0),
         |cnt AS (SELECT b, count(*) AS cr,
         |          sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct
         |        FROM cg GROUP BY b),
         |dom AS (SELECT CAST(unnest(range(64)) AS BIGINT) AS b),
         |raw AS (SELECT dom.b, coalesce(cr, 0) AS cr, coalesce(ct, 0) AS ct
         |        FROM dom LEFT JOIN cnt ON dom.b = cnt.b),
         |tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM raw),
         |lr AS (SELECT b,
         |         CAST(round(log10(CAST((ct + 1) * (tr + 64) AS DOUBLE) /
         |           CAST((cr + 1) * (tt + 64) AS DOUBLE)) * 1e6)
         |           AS BIGINT) AS lr_micro
         |       FROM raw, tot),
         |a0 AS (SELECT doc_id,
         |    list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS gs
         |  FROM w0 WHERE doc_id % 10 = 0 AND len(w) >= 2),
         |ag AS (SELECT doc_id,
         |        CAST('0x' || substr(md5('dsir:' || unnest(gs)), 1, 8)
         |          AS BIGINT) % 64 AS b
         |      FROM a0)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(lr_micro) AS BIGINT) AS w_micro,
         |  (CAST(sum(lr_micro) AS BIGINT) >= 0) AS keep
         |FROM ag JOIN lr USING (b)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q86: contrastive pair mining — per anchor, top-3 same-label
    // (positives) and top-3 different-label (hard negatives) by exact
    // cosine (q19's dot), plus the FaceNet semi-hard flag (negative
    // below the anchor's max positive cos).
    "q86_hard_negatives" -> {
      def dot(x: String, y: String) =
        s"list_sum(list_transform(range(1, 65), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
      s"""WITH a AS (SELECT vec_id AS anchor_id, label AS anchor_label,
         |             embedding AS aemb
         |           FROM embeddings WHERE vec_id IN (0, 1, 2)),
         |s AS (SELECT anchor_id, vec_id, label,
         |        round(${dot("embedding", "aemb")} /
         |          (sqrt(${dot("embedding", "embedding")}) *
         |           sqrt(${dot("aemb", "aemb")})), 6) AS cos_sim,
         |        CASE WHEN label = anchor_label THEN 'pos' ELSE 'neg'
         |          END AS kind
         |      FROM embeddings, a WHERE vec_id <> anchor_id),
         |m AS (SELECT *, row_number() OVER (PARTITION BY anchor_id, kind
         |        ORDER BY cos_sim DESC, vec_id) AS rank FROM s),
         |mk AS (SELECT * FROM m WHERE rank <= 3),
         |hp AS (SELECT anchor_id, max(cos_sim) AS max_pos FROM mk
         |       WHERE kind = 'pos' GROUP BY anchor_id)
         |SELECT anchor_id, kind, CAST(rank AS INTEGER) AS rank, vec_id,
         |  label, cos_sim,
         |  (kind = 'neg' AND cos_sim < max_pos) AS semi_hard
         |FROM mk LEFT JOIN hp USING (anchor_id)
         |ORDER BY anchor_id, kind, rank""".stripMargin
    },

    // q92: BM25 more-like-this — query terms replay q32's exact
    // top-3 TF-IDF ranking restricted to the anchors (its own ln
    // micro-snap, named idf32 to keep it distinct from the BM25 idf);
    // scoring replays the integer rearrangement of BM25(1.2, 0.75):
    // num/den BIGINTs, half-up integer rounding per term, integer sum.
    "q92_bm25_more_like_this" ->
      s"""WITH t AS (SELECT doc_id, unnest(w) AS term FROM ($docsWithWords) d0),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |       FROM t GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
         |       FROM tf GROUP BY doc_id),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |          CAST(sum(dl) AS BIGINT) AS total FROM dl),
         |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
         |        FROM tf GROUP BY term),
         |idf AS (SELECT term,
         |          CAST(round(ln((tot.n_docs - df + 0.5) / (df + 0.5) + 1.0)
         |            * 1000000.0, 0) AS BIGINT) AS idf_micro
         |        FROM dfq CROSS JOIN tot),
         |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |       FROM documents),
         |sc AS (SELECT tf.doc_id, tf.term, tf.tf,
         |         CAST(round(ln((nd.n_docs + 1.0) / (dfq.df + 1.0))
         |           * 1000000.0, 0) AS BIGINT) AS idf32
         |       FROM tf JOIN dfq USING (term) CROSS JOIN nd
         |       WHERE tf.doc_id IN (0, 1, 2)),
         |qt AS (SELECT doc_id AS query_id, term FROM (
         |    SELECT doc_id, term, row_number() OVER (PARTITION BY doc_id
         |      ORDER BY tf * idf32 DESC, term ASC) AS rn FROM sc) z
         |  WHERE rn <= 3),
         |cand AS (SELECT qt.query_id, tf.doc_id, tf.tf, idf.idf_micro,
         |           dl.dl, tot.n_docs, tot.total
         |         FROM tf JOIN qt USING (term) JOIN idf USING (term)
         |           JOIN dl USING (doc_id) CROSS JOIN tot
         |         WHERE tf.doc_id <> qt.query_id),
         |ts AS (SELECT query_id, doc_id,
         |         (2 * (idf_micro * 22 * tf * total) +
         |          (10 * tf * total + 3 * total + 9 * dl * n_docs))
         |         // (2 * (10 * tf * total + 3 * total + 9 * dl * n_docs))
         |           AS term_micro
         |       FROM cand),
         |agg AS (SELECT query_id, doc_id,
         |          CAST(count(*) AS BIGINT) AS n_terms_hit,
         |          CAST(sum(term_micro) AS BIGINT) AS score_micro
         |        FROM ts GROUP BY query_id, doc_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY score_micro DESC, doc_id) AS rank FROM agg)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id,
         |  n_terms_hit, score_micro
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // q86b: q86's mining tail over the IVF index's candidates — the
    // oracle replays the coarse quantizer (ivfCtes: sample-trained
    // micro-integer k-means + per-vector assignment), probes each
    // anchor's 2 nearest cells, exact-cosine scores the probed cells'
    // populations, and runs q86's rank/semi-hard tail (LEFT join —
    // an anchor can mine no positives inside its probed cells).
    "q86b_hard_negatives_ann" ->
      s"""WITH ${ivfCtes(16, 2, 512, "WHERE vec_id % 10 <> 0")},
         |probe AS (SELECT anchor_id, anchor_label, aemb, anorm, cell FROM (
         |    SELECT qe.vec_id AS anchor_id, e.label AS anchor_label,
         |      qe.embedding AS aemb, qe.norm AS anorm, c.cell,
         |      row_number() OVER (PARTITION BY qe.vec_id
         |        ORDER BY ${sqDist("qe.xq", "c.cx")}, c.cell) AS rn
         |    FROM qe JOIN embeddings e USING (vec_id), c2 c
         |    WHERE qe.vec_id IN (0, 1, 2)) t WHERE rn <= 2),
         |s AS (SELECT anchor_id, asg.vec_id, e.label,
         |        round(${vdot("asg.embedding", "aemb")} / (asg.norm * anorm), 6)
         |          AS cos_sim,
         |        CASE WHEN e.label = anchor_label THEN 'pos' ELSE 'neg'
         |          END AS kind
         |      FROM asg JOIN probe USING (cell)
         |        JOIN embeddings e ON e.vec_id = asg.vec_id
         |      WHERE asg.vec_id <> anchor_id),
         |m AS (SELECT *, row_number() OVER (PARTITION BY anchor_id, kind
         |        ORDER BY cos_sim DESC, vec_id) AS rank FROM s),
         |mk AS (SELECT * FROM m WHERE rank <= 3),
         |hp AS (SELECT anchor_id, max(cos_sim) AS max_pos FROM mk
         |       WHERE kind = 'pos' GROUP BY anchor_id)
         |SELECT anchor_id, kind, CAST(rank AS INTEGER) AS rank, vec_id,
         |  label, cos_sim,
         |  (kind = 'neg' AND cos_sim < max_pos) AS semi_hard
         |FROM mk LEFT JOIN hp USING (anchor_id)
         |ORDER BY anchor_id, kind, rank""".stripMargin,

    // q91: streaming tokenizer-fertility gate — per-arrival token
    // accounting from the shared q90 recursion; a doc with no
    // tokenizable words gates through at 0/0.
    "q91_stream_token_gate" ->
      s"""WITH RECURSIVE $subwordTokCtes,
         |acc AS (SELECT dw.doc_id, CAST(count(*) AS BIGINT) AS nw,
         |          CAST(sum(len(ids)) AS BIGINT) AS nt,
         |          CAST(sum(len(list_filter(ids, x -> x = 0))) AS BIGINT) AS nu
         |        FROM dw JOIN tokend USING (word) GROUP BY dw.doc_id),
         |arrv AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 0)
         |SELECT a.doc_id,
         |  CAST(COALESCE(nw, 0) AS BIGINT) AS n_words,
         |  CAST(COALESCE(nt, 0) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(nu, 0) AS BIGINT) AS n_unk,
         |  (COALESCE(nt, 0) * 2 <= COALESCE(nw, 0) * 3) AS keep
         |FROM arrv a LEFT JOIN acc USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // q90: subword tokenizer apply — the oracle re-trains the vocab
    // from the raw table (hash-ordered 128-doc sample, 1..4-codepoint
    // gram counts, (cnt, len, gram) rank) and replays the greedy
    // longest-match per DISTINCT word as a recursive CTE (one step per
    // emitted token; the four LEFT JOINs are the longest-first probes,
    // COALESCE order = greedy order), then joins back to the
    // positioned word stream. Engine drift in either half — training
    // tiebreaks or the scan's advance rule — fails the hash.
    "q90_subword_tokenize" ->
      s"""WITH RECURSIVE $subwordTokCtes,
         |fl0 AS (SELECT doc_id, wi, unnest(list_transform(ids,
         |          (x, k) -> struct_pack(j := k, id := x, t := ts[k]))) AS u
         |        FROM dw JOIN tokend USING (word)),
         |flat AS (SELECT doc_id, wi, u.j AS j, u.id AS token_id,
         |           u.t AS token FROM fl0)
         |SELECT doc_id,
         |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY wi, j)
         |    AS BIGINT) AS pos,
         |  token_id, token
         |FROM flat ORDER BY doc_id, pos""".stripMargin,

    // q90b: q41's packing formula fed with the q90 token counts —
    // docs with no tokenizable words pack as n_tokens 0.
    "q90b_token_packing" ->
      s"""WITH RECURSIVE $subwordTokCtes,
         |ntok AS (SELECT dw.doc_id, CAST(sum(len(ids)) AS BIGINT) AS nt
         |         FROM dw JOIN tokend USING (word) GROUP BY dw.doc_id),
         |sized AS (SELECT d.doc_id,
         |    CAST(COALESCE(nt, 0) AS BIGINT) AS n_tokens,
         |    CAST('0x' || substr(md5('pack:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
         |      AS BIGINT)
         |      % (SELECT greatest(16, count(*) // 1000000) FROM documents)
         |      AS pack_bucket
         |  FROM documents d LEFT JOIN ntok ON ntok.doc_id = d.doc_id),
         |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY pack_bucket
         |        ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_end
         |      FROM sized)
         |SELECT doc_id, pack_bucket, n_tokens,
         |  CAST((cum_end - n_tokens) // 512 AS BIGINT) AS bin_in_bucket,
         |  CAST((cum_end - n_tokens) % 512 AS BIGINT) AS offset_in_bin
         |FROM c ORDER BY doc_id""".stripMargin,

    // q96: token-budget quality selection — q17's micro-grid scores
    // bucket into ≤10001 rows, a descending cumulative sum finds the
    // budget (sum div 4) cutoff, full buckets select wholesale, the
    // one boundary bucket refines in doc_id order until the remaining
    // budget is spent. Mirrors the engine's no-global-sort shape.
    "q96_token_budget_select" ->
      s"""WITH sc AS (SELECT doc_id, quality_score FROM ($q17Sql) q17),
         |tt AS (SELECT doc_id,
         |    CAST(COALESCE(len(string_split(trim(text), ' ')), 0) AS BIGINT)
         |      AS n_tokens
         |  FROM documents),
         |dd AS (SELECT sc.doc_id, quality_score, n_tokens,
         |    CAST(round(quality_score * 10000, 0) AS BIGINT) AS s4
         |  FROM sc JOIN tt ON sc.doc_id = tt.doc_id),
         |bgt AS (SELECT sum(n_tokens) // 4 AS budget FROM tt),
         |cm AS (SELECT s4, sum(n_tokens) AS bt,
         |    sum(sum(n_tokens)) OVER (ORDER BY s4 DESC
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM dd GROUP BY s4),
         |fullb AS (SELECT s4 FROM cm, bgt WHERE cum <= budget),
         |bnd AS (SELECT s4, budget - (cum - bt) AS rem
         |        FROM cm, bgt WHERE cum > budget
         |        ORDER BY s4 DESC LIMIT 1),
         |above AS (SELECT doc_id, quality_score, n_tokens,
         |    'above_cutoff' AS tier
         |  FROM dd JOIN fullb USING (s4)),
         |brun AS (SELECT dd.doc_id, quality_score, n_tokens, rem,
         |    sum(n_tokens) OVER (ORDER BY dd.doc_id
         |      ROWS UNBOUNDED PRECEDING) AS run
         |  FROM dd JOIN bnd USING (s4)),
         |bsel AS (SELECT doc_id, quality_score, n_tokens,
         |    'boundary' AS tier
         |  FROM brun WHERE run <= rem)
         |SELECT * FROM above UNION ALL SELECT * FROM bsel
         |ORDER BY doc_id""".stripMargin,

    // q95: the end-to-end corpus build — the oracle RECOMPUTES every
    // stage from raw documents (the engine reads the staged q53
    // verdict; recomputing is the point of the gate): recipe CTEs →
    // kept train docs → temperature sampling over the KEPT pool's
    // source counts → recursive tokenizer replay → hash-bucketed
    // packing → 8-row shard ledger. One hash pins the whole chain.
    "q95_corpus_build" -> q95LedgerSql,

    // q95b: the INCREMENTAL corpus build — the engine merges a staged
    // base metadata frame with an arrivals-only delta; the oracle is
    // q95's FULL-RECOMPUTE SQL verbatim, so the gate IS the
    // incremental-equals-rebuild equivalence (the q25b pattern).
    "q95b_corpus_build_incr" -> q95LedgerSql,

    // q94: temperature-based multinomial source sampling (α = 0.5) —
    // per-source keep rate round(1e6·sqrt(n_min)/sqrt(n_s)) (IEEE
    // sqrt/div/mul are correctly rounded, so both engines compute the
    // identical micro-rate), salted doc hash mod 1e6 under the rate.
    "q94_temperature_sample" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |           FROM documents GROUP BY source),
        |m AS (SELECT min(n_docs) AS n_min FROM c),
        |r AS (SELECT source,
        |    CAST(round(1000000.0 * (sqrt(CAST(n_min AS DOUBLE)) /
        |      sqrt(CAST(n_docs AS DOUBLE))), 0) AS BIGINT) AS rate_micro
        |  FROM c, m),
        |t AS (SELECT doc_id, source,
        |    CAST('0x' || substr(md5('tsamp:' || CAST(doc_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) % 1000000 AS u6
        |  FROM documents)
        |SELECT doc_id, t.source, rate_micro
        |FROM t JOIN r ON t.source = r.source
        |WHERE u6 < rate_micro
        |ORDER BY doc_id""".stripMargin,

    // q93: balanced shard export — q90b's packing replayed, the
    // map-only shard id ((pack_bucket + bin_in_bucket) % 8), and the
    // per-shard ledger (docs, bins, exact token sums, max bin size).
    "q93_shard_export" -> q93LedgerSql,

    // q97: the STREAMING shard ledger — arriving packed bins folded
    // additively into the per-shard report; the oracle is q93's
    // ledger SQL verbatim, so the gate pins batch-equals-streamed.
    "q97_stream_shard_ledger" -> q93LedgerSql,

    // q90c: BPE tokenizer apply — the oracle RE-TRAINS the merge-rank
    // table (BpeMergeCount unrolled pair-count/argmax/merge stages
    // over the sample's word-frequency dict) and replays the
    // subword-nmt encode loop per distinct corpus word (recursive
    // CTE: lowest-rank matching merge until none applies), then
    // reassembles per-doc positions exactly like q90's oracle.
    "q90c_bpe_tokenize" ->
      s"""WITH RECURSIVE $bpeCtes,
         |bfl0 AS (SELECT doc_id, wi, unnest(list_transform(ts,
         |           (x, k) -> struct_pack(j := k, t := x))) AS u
         |         FROM bdw JOIN btoks USING (word)),
         |bflat AS (SELECT doc_id, wi, u.j AS j, u.t AS token FROM bfl0)
         |SELECT doc_id,
         |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY wi, j)
         |    AS BIGINT) AS pos,
         |  CAST(COALESCE(bmid.token_id, 0) AS BIGINT) AS token_id,
         |  bflat.token AS token
         |FROM bflat LEFT JOIN bmid ON bmid.token = bflat.token
         |ORDER BY doc_id, pos""".stripMargin,
  )

  /** The q93/q97 shared ledger oracle: q90b's packing replayed,
    * the map-only shard id, and the per-shard ledger. q93 (batch
    * export) and q97 (streaming additive fold over the staged bins)
    * must both hash-match it.
    */
  private lazy val q93LedgerSql: String =
      s"""WITH RECURSIVE $subwordTokCtes,
         |ntok AS (SELECT dw.doc_id, CAST(sum(len(ids)) AS BIGINT) AS nt
         |         FROM dw JOIN tokend USING (word) GROUP BY dw.doc_id),
         |sized AS (SELECT d.doc_id,
         |    CAST(COALESCE(nt, 0) AS BIGINT) AS n_tokens,
         |    CAST('0x' || substr(md5('pack:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
         |      AS BIGINT)
         |      % (SELECT greatest(16, count(*) // 1000000) FROM documents)
         |      AS pack_bucket
         |  FROM documents d LEFT JOIN ntok ON ntok.doc_id = d.doc_id),
         |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY pack_bucket
         |        ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_end
         |      FROM sized),
         |asg AS (SELECT doc_id, pack_bucket, n_tokens,
         |    CAST((cum_end - n_tokens) // 512 AS BIGINT) AS bin_in_bucket
         |  FROM c),
         |sh AS (SELECT *, (pack_bucket + bin_in_bucket) % 8 AS shard_id
         |       FROM asg),
         |b AS (SELECT shard_id, pack_bucket, bin_in_bucket,
         |        CAST(count(*) AS BIGINT) AS bin_docs,
         |        CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
         |      FROM sh GROUP BY 1, 2, 3)
         |SELECT shard_id,
         |  CAST(sum(bin_docs) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_bins,
         |  CAST(sum(bin_tokens) AS BIGINT) AS n_tokens,
         |  CAST(max(bin_tokens) AS BIGINT) AS max_bin_tokens
         |FROM b GROUP BY shard_id ORDER BY shard_id""".stripMargin

  /** The q95/q95b shared ledger oracle: a FULL recompute of every
    * stage from raw documents. q95 (one-shot build) and q95b
    * (incremental build over the staged base + arrivals delta) must
    * both hash-match it — for q95b the shared SQL IS the
    * incremental-equals-rebuild equivalence gate.
    */
  private lazy val q95LedgerSql: String =
      s"""WITH RECURSIVE $corpusRecipeCtes,
         |$subwordTokCtes,
         |keptd AS (SELECT doc_id FROM recipe
         |          WHERE keep AND split = 'train'),
         |kd AS (SELECT dd.doc_id, dd.source
         |       FROM documents dd JOIN keptd USING (doc_id)),
         |kc AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |       FROM kd GROUP BY source),
         |kmin AS (SELECT min(n_docs) AS n_min FROM kc),
         |kr AS (SELECT source,
         |    CAST(round(1000000.0 * (sqrt(CAST(n_min AS DOUBLE)) /
         |      sqrt(CAST(n_docs AS DOUBLE))), 0) AS BIGINT) AS rate_micro
         |  FROM kc, kmin),
         |sampled AS (SELECT kd.doc_id FROM kd JOIN kr ON kd.source = kr.source
         |  WHERE CAST('0x' || substr(md5('tsamp:' || CAST(kd.doc_id AS VARCHAR)),
         |      1, 8) AS BIGINT) % 1000000 < rate_micro),
         |ntok AS (SELECT dw.doc_id, CAST(sum(len(ids)) AS BIGINT) AS nt
         |         FROM dw JOIN tokend USING (word)
         |         WHERE dw.doc_id IN (SELECT doc_id FROM sampled)
         |         GROUP BY dw.doc_id),
         |sized AS (SELECT sp.doc_id,
         |    CAST(COALESCE(nt, 0) AS BIGINT) AS n_tokens,
         |    CAST('0x' || substr(md5('pack:' || CAST(sp.doc_id AS VARCHAR)), 1, 8)
         |      AS BIGINT)
         |      % (SELECT greatest(16, count(*) // 1000000) FROM documents)
         |      AS pack_bucket
         |  FROM sampled sp LEFT JOIN ntok ON ntok.doc_id = sp.doc_id),
         |cum AS (SELECT *, sum(n_tokens) OVER (PARTITION BY pack_bucket
         |        ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_end
         |      FROM sized),
         |asg2 AS (SELECT doc_id, pack_bucket, n_tokens,
         |    CAST((cum_end - n_tokens) // 512 AS BIGINT) AS bin_in_bucket
         |  FROM cum),
         |shd AS (SELECT *, (pack_bucket + bin_in_bucket) % 8 AS shard_id
         |       FROM asg2),
         |bns AS (SELECT shard_id, pack_bucket, bin_in_bucket,
         |        CAST(count(*) AS BIGINT) AS bin_docs,
         |        CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
         |      FROM shd GROUP BY 1, 2, 3)
         |SELECT shard_id,
         |  CAST(sum(bin_docs) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_bins,
         |  CAST(sum(bin_tokens) AS BIGINT) AS n_tokens,
         |  CAST(max(bin_tokens) AS BIGINT) AS max_bin_tokens
         |FROM bns GROUP BY shard_id ORDER BY shard_id""".stripMargin

  /** q90c's shared BPE replay, mirroring
    * [[PipelineQueries.bpeMergesBuild]] and
    * [[graft.expressions.Subword.BpeTokenize]] decision-for-decision:
    *
    * TRAINING — `BpeMergeCount` UNROLLED stages (SQL cannot loop over
    * a data-dependent trip count outside recursion, and each stage
    * needs a GLOBAL aggregate over the working segmentation, which a
    * recursive CTE cannot express — unrolling a fixed constant can):
    * stage i re-tokenizes the segmentation strings, counts adjacent
    * pairs weighted by word frequency, takes the argmax (count DESC,
    * then p1/p2 in DuckDB's binary collation = UTF-8 byte order = the
    * trainer's comparator), and merges it via string `replace` —
    * whose left-to-right non-overlapping scan IS BPE's merge pass. A
    * stage whose best count is < 2 leaves the segmentation unchanged
    * and contributes no merge row (the trainer's monotone early-stop:
    * merging never raises a later pair count above the current best).
    *
    * REPRESENTATION — a segmentation is a string with each symbol
    * wrapped in U+0001 separators (`\\x01 s1 \\x01\\x01 s2 \\x01...`):
    * the doubled interior separator keeps every symbol carrying its
    * own delimiters, so `replace('\\x01 p1 \\x01\\x01 p2 \\x01' →
    * '\\x01 p1p2 \\x01')` can never match across a symbol boundary
    * and consecutive occurrences stay independently matchable. Words
    * containing U+0001 are excluded from training and bypass the
    * merge machinery in apply (emitted whole, token_id 0 — the
    * expression's documented fallback); a word with two ADJACENT
    * U+0001 chars is outside this oracle's representable domain (the
    * engine handles it; the gate's corpus cannot contain one).
    *
    * APPLY — per distinct corpus word, a recursive CTE applies the
    * LOWEST-rank merge whose wrapped pair occurs in the segmentation
    * (all occurrences, left-to-right via the same `replace`) until no
    * merge applies — subword-nmt's encode loop. token_id = lowest
    * merge rank whose concatenation equals the token, else 0. The
    * lowest-rank pick is a correlated min(rank) scalar + equi-join,
    * NOT a LATERAL ... ORDER BY rank LIMIT 1: inside a recursive term
    * DuckDB 1.0's lateral over this union-of-materialized-CTEs merge
    * table silently saw only its first branches (observed: merges
    * rank ≥3 never matched), while the scalar-subquery form scans the
    * full table every iteration.
    */
  private lazy val bpeCtes: String = {
    val K = PipelineQueries.BpeMergeCount
    val S = PipelineQueries.SubwordSampleDocs
    def charSeg(w: String): String =
      s"chr(1) || array_to_string(list_transform(" +
        s"generate_series(1, len($w)), g -> substr($w, g, 1)), " +
        s"chr(1) || chr(1)) || chr(1)"
    val header =
      s"""bsamp AS (SELECT text FROM documents
         |  ORDER BY md5('vocsamp:' || CAST(doc_id AS VARCHAR)), doc_id LIMIT $S),
         |bw0 AS (SELECT unnest(string_split(trim(text), ' ')) AS word FROM bsamp),
         |bwc AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM bw0
         |        WHERE len(word) >= 1 AND strpos(word, chr(1)) = 0 GROUP BY 1),
         |bs0 AS MATERIALIZED (SELECT word, freq, ${charSeg("word")} AS seg FROM bwc)""".stripMargin
    val stages = (1 to K).map { i =>
      val prev = s"bs${i - 1}"
      s"""bt$i AS (SELECT freq, string_split(trim(seg, chr(1)),
         |           chr(1) || chr(1)) AS toks FROM $prev),
         |bx$i AS (SELECT freq, toks,
         |           unnest(generate_series(1, len(toks) - 1)) AS g FROM bt$i),
         |bp$i AS (SELECT toks[g] AS p1, toks[g + 1] AS p2, sum(freq) AS c
         |         FROM bx$i GROUP BY 1, 2),
         |bb$i AS MATERIALIZED (SELECT p1, p2 FROM bp$i WHERE c >= 2
         |         ORDER BY c DESC, p1, p2 LIMIT 1),
         |bs$i AS MATERIALIZED (SELECT word, freq, CASE WHEN EXISTS (SELECT 1 FROM bb$i)
         |    THEN replace(seg,
         |      chr(1) || (SELECT p1 FROM bb$i) || chr(1) || chr(1) ||
         |        (SELECT p2 FROM bb$i) || chr(1),
         |      chr(1) || (SELECT p1 FROM bb$i) || (SELECT p2 FROM bb$i) || chr(1))
         |    ELSE seg END AS seg FROM $prev)""".stripMargin
    }
    val mergeRows = (1 to K)
      .map(i => s"SELECT $i AS rank, p1, p2 FROM bb$i")
      .mkString("\n  UNION ALL ")
    val tail =
      s"""bmerges AS MATERIALIZED (
         |  $mergeRows),
         |bdw0 AS (SELECT doc_id, unnest(list_transform(
         |           string_split(trim(text), ' '),
         |           (x, i) -> struct_pack(wi := i, word := x))) AS u
         |         FROM documents),
         |bdw AS MATERIALIZED (SELECT doc_id, u.wi AS wi, u.word AS word FROM bdw0
         |        WHERE len(u.word) >= 1),
         |bu AS (SELECT DISTINCT word FROM bdw WHERE strpos(word, chr(1)) = 0),
         |ba0 AS (SELECT word, ${charSeg("word")} AS seg FROM bu),
         |bap AS (
         |  SELECT word, seg, 0 AS it FROM ba0
         |  UNION ALL
         |  SELECT x.word, replace(x.seg,
         |      chr(1) || m.p1 || chr(1) || chr(1) || m.p2 || chr(1),
         |      chr(1) || m.p1 || m.p2 || chr(1)), x.it + 1
         |  FROM (SELECT bap.word AS word, bap.seg AS seg, bap.it AS it,
         |          (SELECT min(m2.rank) FROM bmerges m2
         |           WHERE strpos(bap.seg,
         |             chr(1) || m2.p1 || chr(1) || chr(1) || m2.p2 || chr(1)) > 0)
         |            AS mr
         |        FROM bap) x
         |  JOIN bmerges m ON m.rank = x.mr),
         |baf AS (SELECT word, seg FROM (SELECT word, seg,
         |    row_number() OVER (PARTITION BY word ORDER BY it DESC) AS rn
         |  FROM bap) z WHERE rn = 1),
         |btoks AS (
         |  SELECT word, string_split(trim(seg, chr(1)), chr(1) || chr(1)) AS ts
         |  FROM baf
         |  UNION ALL
         |  SELECT word, [word] AS ts FROM (SELECT DISTINCT word FROM bdw
         |    WHERE strpos(word, chr(1)) > 0) zz),
         |bmid AS (SELECT p1 || p2 AS token, CAST(min(rank) AS BIGINT) AS token_id
         |         FROM bmerges GROUP BY 1)""".stripMargin
    (Seq(header) ++ stages ++ Seq(tail)).mkString(",\n")
  }

  /** q90's shared tokenizer recursion: vocab training (sample → gram
    * counts → ranked top-256) + the per-distinct-word greedy
    * longest-match replay. Mirrors
    * [[PipelineQueries.subwordVocabBuild]] and
    * [[graft.expressions.Subword.SubwordTokenize]] constant-for-
    * constant (maxLen 4, V 256, sample 128, 'vocsamp:' salt).
    */
  private lazy val subwordTokCtes: String =
    s"""samp AS (SELECT text FROM documents
       |  ORDER BY md5('vocsamp:' || CAST(doc_id AS VARCHAR)), doc_id LIMIT 128),
       |vsw AS (SELECT unnest(string_split(trim(text), ' ')) AS word FROM samp),
       |vg1 AS (SELECT word, unnest(generate_series(1, least(len(word), 4))) AS L
       |        FROM vsw WHERE len(word) >= 1),
       |vg2 AS (SELECT word, L,
       |          unnest(generate_series(1, len(word) - L + 1)) AS i FROM vg1),
       |vcnt AS (SELECT substr(word, i, L) AS token, count(*) AS cnt
       |         FROM vg2 GROUP BY 1),
       |vocab AS (SELECT token, CAST(token_id AS BIGINT) AS token_id FROM (
       |    SELECT token, row_number() OVER
       |      (ORDER BY cnt DESC, len(token) DESC, token ASC) AS token_id
       |    FROM vcnt)
       |  WHERE token_id <= 256),
       |dw0 AS (SELECT doc_id, unnest(list_transform(string_split(trim(text), ' '),
       |          (x, i) -> struct_pack(wi := i, word := x))) AS u FROM documents),
       |dw AS (SELECT doc_id, u.wi AS wi, u.word AS word FROM dw0
       |       WHERE len(u.word) >= 1),
       |uw AS (SELECT DISTINCT word FROM dw),
       |tk AS (
       |  SELECT word, 1 AS pos, CAST([] AS BIGINT[]) AS ids,
       |    CAST([] AS VARCHAR[]) AS ts FROM uw
       |  UNION ALL
       |  SELECT tk.word,
       |    tk.pos + CASE WHEN COALESCE(v4.token, v3.token, v2.token, v1.token)
       |        IS NOT NULL
       |      THEN len(COALESCE(v4.token, v3.token, v2.token, v1.token))
       |      ELSE 1 END,
       |    list_append(tk.ids, COALESCE(v4.token_id, v3.token_id,
       |      v2.token_id, v1.token_id, 0)),
       |    list_append(tk.ts, COALESCE(v4.token, v3.token, v2.token, v1.token,
       |      substr(tk.word, tk.pos, 1)))
       |  FROM tk
       |  LEFT JOIN vocab v4 ON v4.token = substr(tk.word, tk.pos, 4)
       |  LEFT JOIN vocab v3 ON v3.token = substr(tk.word, tk.pos, 3)
       |  LEFT JOIN vocab v2 ON v2.token = substr(tk.word, tk.pos, 2)
       |  LEFT JOIN vocab v1 ON v1.token = substr(tk.word, tk.pos, 1)
       |  WHERE tk.pos <= len(tk.word)),
       |tokend AS (SELECT word, ids, ts FROM tk WHERE pos > len(word))""".stripMargin

  /** q64's recompute-path yield-ledger SQL — shared verbatim by q64
    * and its materialized-stage twin q64b.
    */
  private lazy val q64YieldSql: String =
      s"""WITH RECURSIVE $corpusRecipeCtes,
         |tok AS (SELECT doc_id, source,
         |          CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS nt
         |        FROM documents)
         |SELECT source, disposition,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS n_tokens
         |FROM recipe JOIN tok USING (doc_id)
         |GROUP BY source, disposition
         |ORDER BY source, disposition""".stripMargin

  /** q63's formula-replayed dHash + min-per-hash verdict SQL — shared
    * verbatim by q63 and its TTL-bounded twin q63b (identical output
    * on the single-batch fixture drain; the twins differ only in
    * state-eviction behavior, pinned by the multi-batch spec).
    */
  private lazy val q63ImageDedupSql: String =
      s"""WITH imgs AS (
         |  SELECT img_id, 4 + img_id % 13 AS w, 3 + img_id % 11 AS h
         |  FROM read_parquet('${graft.functions.MediaFixture.fixtureDir}/images/*.parquet')),
         |ks AS (SELECT img_id, w, h, unnest(generate_series(0, 71)) AS k FROM imgs),
         |g AS (SELECT img_id, w, h, k % 9 AS gi, k // 9 AS gj,
         |        (299*((17*(((k % 9) * w) // 9) + 29*(((k // 9) * h) // 8) + 31*img_id) % 256)
         |       + 587*(( 3*(((k % 9) * w) // 9) +  7*(((k // 9) * h) // 8) + 11*img_id) % 256)
         |       + 114*((13*(((k % 9) * w) // 9) +  5*(((k // 9) * h) // 8) + 19*img_id) % 256)) // 1000 AS gray
         |      FROM ks),
         |bits AS (SELECT a.img_id, a.gj * 8 + a.gi AS k,
         |           CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
         |         FROM g a JOIN g b ON a.img_id = b.img_id AND a.gj = b.gj
         |            AND b.gi = a.gi + 1
         |         WHERE a.gi < 8),
         |halves AS (SELECT img_id,
         |    CAST(sum(CASE WHEN k >= 32 THEN bit * (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END) AS BIGINT) AS hi,
         |    CAST(sum(CASE WHEN k < 32 THEN bit * (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS lo
         |  FROM bits GROUP BY img_id),
         |fr AS (SELECT img_id, hi, lo,
         |         format('{:08x}', hi) || format('{:08x}', lo) AS dhash_hex
         |       FROM halves)
         |SELECT img_id, dhash_hex, dup_of, (img_id != dup_of) AS is_dup
         |FROM (SELECT img_id, dhash_hex,
         |        min(img_id) OVER (PARTITION BY hi, lo) AS dup_of FROM fr) z
         |ORDER BY img_id""".stripMargin

  /** q68's lag + conditional-cumsum sessionizer SQL — shared verbatim
    * by q68 and its skew-safe two-phase twin q68b (identical output,
    * different engine plan).
    */
  private lazy val q68SessionizeSql: String =
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
        |b AS (SELECT user_id, t,
        |        CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t)
        |               IS NULL
        |             OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
        |               > 600000000
        |             THEN 1 ELSE 0 END AS brk
        |      FROM e),
        |sx AS (SELECT user_id, t,
        |        CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |       FROM b)
        |SELECT user_id, session_idx,
        |  min(t) AS session_start_us, max(t) AS session_end_us,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM sx GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin

  /** The full q53 staged-recipe CTE chain, ending in
    * `recipe(doc_id, split, disposition, keep)` — shared by the q53
    * oracle and q64's per-source yield accounting.
    */
  private lazy val corpusRecipeCtes: String =
      s"""$q46CascadeCtes,
         |$q15PairCtes,
         |surv1 AS (SELECT doc_id FROM fc WHERE keep),
         |eth AS (SELECT dd.doc_id, md5(text) AS th
         |        FROM documents dd JOIN surv1 USING (doc_id)),
         |ec AS (SELECT th, min(doc_id) AS canon FROM eth GROUP BY th),
         |ex AS (SELECT eth.doc_id, (eth.doc_id = ec.canon) AS exact_keep
         |       FROM eth JOIN ec USING (th)),
         |surv2 AS (SELECT doc_id FROM ex WHERE exact_keep),
         |pr AS (SELECT doc_a, doc_b FROM v WHERE jaccard >= 0.8
         |       AND doc_a IN (SELECT doc_id FROM surv2)
         |       AND doc_b IN (SELECT doc_id FROM surv2)),
         |edges AS (SELECT doc_a AS u, doc_b AS vtx FROM pr
         |          UNION SELECT doc_b, doc_a FROM pr),
         |reach(u, vtx) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) n0
         |  UNION
         |  SELECT r.u, e.vtx FROM reach r JOIN edges e ON r.vtx = e.u),
         |lbl AS (SELECT u AS doc_id, min(vtx) AS cluster_id FROM reach GROUP BY u),
         |nr AS (SELECT s2.doc_id,
         |        coalesce(l.cluster_id, s2.doc_id) = s2.doc_id AS near_keep
         |      FROM surv2 s2 LEFT JOIN lbl l ON s2.doc_id = l.doc_id),
         |surv3 AS (SELECT doc_id FROM nr WHERE near_keep),
         |spl AS (SELECT doc_id,
         |    CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS b
         |  FROM documents),
         |s5 AS (SELECT doc_id,
         |    list_distinct(list_transform(range(1, len(w)-3),
         |      i -> array_to_string(w[i:i+4], ' '))) AS sh
         |  FROM ($docsWithWords) dw),
         |tes AS (SELECT DISTINCT
         |          CAST('0x' || substr(md5(sng), 1, 15) AS BIGINT) AS shh
         |        FROM (SELECT unnest(sh) AS sng
         |              FROM s5 JOIN spl USING (doc_id) WHERE b >= 95)),
         |cont AS (SELECT DISTINCT xx.doc_id FROM
         |    (SELECT doc_id,
         |       CAST('0x' || substr(md5(sng), 1, 15) AS BIGINT) AS shh
         |     FROM (SELECT s5.doc_id AS doc_id, unnest(sh) AS sng
         |           FROM s5 JOIN surv3 USING (doc_id) JOIN spl USING (doc_id)
         |           WHERE spl.b < 90) probe) xx
         |    JOIN tes USING (shh)),
         |recipe AS (
         |  SELECT doc_id, split, disposition, (disposition = 'kept') AS keep
         |  FROM (
         |    SELECT dd.doc_id,
         |      CASE WHEN spl.b < 90 THEN 'train'
         |           WHEN spl.b < 95 THEN 'validation'
         |           ELSE 'test' END AS split,
         |      CASE WHEN NOT fc.keep THEN 'rule:' || fc.reject_reason
         |           WHEN NOT coalesce(ex.exact_keep, TRUE) THEN 'exact_dup'
         |           WHEN NOT coalesce(nr.near_keep, TRUE) THEN 'near_dup'
         |           WHEN cont.doc_id IS NOT NULL THEN 'contaminated'
         |           ELSE 'kept' END AS disposition
         |    FROM documents dd
         |    JOIN spl ON dd.doc_id = spl.doc_id
         |    JOIN fc ON dd.doc_id = fc.doc_id
         |    LEFT JOIN ex ON dd.doc_id = ex.doc_id
         |    LEFT JOIN nr ON dd.doc_id = nr.doc_id
         |    LEFT JOIN cont ON dd.doc_id = cont.doc_id) z)""".stripMargin
}
