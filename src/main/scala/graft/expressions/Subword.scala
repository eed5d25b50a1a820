package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Subword tokenization as a native expression — the APPLY half of the
  * q90 tokenizer operator (WordPiece-style greedy longest-match over a
  * staged, frequency-trained vocab; see
  * [[graft.queries.PipelineQueries.q90SubwordTokenize]] for the
  * training half and the operating point).
  *
  * Why an expression and not higher-order SQL functions: the greedy
  * scan is a data-dependent while-loop (each match decides how far the
  * cursor advances), which `aggregate` can only express as one lambda
  * step per CHARACTER with up-to-maxLen map probes each — and Spark's
  * literal-map `element_at` is a linear scan over the vocab. Here the
  * vocab binds once per task into a real hash map and each word
  * tokenizes in one tight JVM loop (the [[Sketches]] rationale).
  * CodegenFallback: one virtual call per row, irrelevant next to the
  * per-character loop.
  *
  * Cursor arithmetic is in Unicode code points (matching Spark's and
  * DuckDB's character-based `substring`/`substr`), so the engine and
  * the DuckDB oracle twin tokenize identically on non-ASCII text.
  */
object Subword {

  /** graft_subword_tokenize(words: array<string>) →
    * array<struct<token_id: bigint, token: string>>: the document's
    * subword token stream, all words concatenated in order. Greedy
    * longest-match per word: at each position try the longest vocab
    * entry first (maxLen down to 1 code points, truncated at word
    * end); on a miss emit UNK (token_id 0) for the single code point
    * and advance one. token_id i is 1-based rank in the vocab array.
    * Empty words (doubled spaces) contribute nothing.
    */
  case class SubwordTokenize(child: Expression, vocab: Array[String])
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      Sketches.requireStringArray(child, "graft_subword_tokenize")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("token_id", LongType, nullable = false),
      StructField("token", StringType, nullable = false))),
      containsNull = false)
    @transient private lazy val vmap: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](vocab.length * 2)
      var i = 0
      while (i < vocab.length) {
        m.put(vocab(i), java.lang.Long.valueOf((i + 1).toLong)); i += 1
      }
      m
    }
    @transient private lazy val maxLen: Int =
      if (vocab.isEmpty) 1
      else vocab.map(v => v.codePointCount(0, v.length)).max
    override def nullSafeEval(input: Any): Any = {
      val words = input.asInstanceOf[ArrayData]
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      val nw = words.numElements()
      var wi = 0
      while (wi < nw) {
        if (!words.isNullAt(wi)) {
          val w = words.getUTF8String(wi).toString
          val wlen = w.length // UTF-16 units; cursor moves by code points
          var off = 0
          while (off < wlen) {
            val remaining = w.codePointCount(off, wlen)
            var l = math.min(maxLen, remaining)
            var id = -1L
            var end = 0
            while (l >= 1 && id < 0) {
              val e = w.offsetByCodePoints(off, l)
              val v = vmap.get(w.substring(off, e))
              if (v != null) { id = v.longValue(); end = e } else l -= 1
            }
            if (id >= 0) {
              out += InternalRow(id, UTF8String.fromString(w.substring(off, end)))
              off = end
            } else {
              val e = w.offsetByCodePoints(off, 1)
              out += InternalRow(0L, UTF8String.fromString(w.substring(off, e)))
              off = e
            }
          }
        }
        wi += 1
      }
      new GenericArrayData(out.toArray)
    }
    override protected def withNewChildInternal(c: Expression): SubwordTokenize =
      copy(child = c)
  }

  /** graft_bpe_tokenize(words: array<string>) →
    * array<struct<token_id: bigint, token: string>>: byte-pair-encoding
    * tokenization under a trained MERGE-RANK table (Sennrich 2015's
    * exact apply semantics, as in the reference subword-nmt encoder):
    * each word starts as its code-point characters and repeatedly the
    * LOWEST-RANK merge whose pair occurs anywhere in the current
    * segmentation is applied to ALL its occurrences (left-to-right,
    * non-overlapping) until no trained merge applies. token_id is the
    * LOWEST merge rank whose concatenation equals the token (two
    * different merges can produce the same string), 0 for base
    * characters and untokenizable words.
    *
    * A word containing U+0001 is emitted whole as one token_id-0 token:
    * the trainer excludes such words (U+0001 is the DuckDB oracle
    * twin's segment-separator — see the q90c oracle's representational
    * note), so no merge could apply to them anyway, and the whole-word
    * fallback keeps the engine total (every word contributes ≥1 token)
    * while staying inside the oracle's representable domain.
    */
  case class BpeTokenize(child: Expression, merges: Array[(String, String)])
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      Sketches.requireStringArray(child, "graft_bpe_tokenize")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("token_id", LongType, nullable = false),
      StructField("token", StringType, nullable = false))),
      containsNull = false)
    @transient private lazy val rankOf: java.util.HashMap[String, Integer] = {
      // pair key "p1 p2": a space can never appear inside a trained
      // symbol (symbols are concatenated substrings of sample words,
      // and words come from a single-space split), so the space-joined
      // key is collision-free.
      val m = new java.util.HashMap[String, Integer](merges.length * 2)
      var i = 0
      while (i < merges.length) {
        m.putIfAbsent(merges(i)._1 + " " + merges(i)._2, Integer.valueOf(i + 1))
        i += 1
      }
      m
    }
    @transient private lazy val idOf: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](merges.length * 2)
      var i = 0
      while (i < merges.length) {
        // lowest rank wins when two merges concat to the same string
        m.putIfAbsent(merges(i)._1 + merges(i)._2,
          java.lang.Long.valueOf((i + 1).toLong))
        i += 1
      }
      m
    }
    override def nullSafeEval(input: Any): Any = {
      val words = input.asInstanceOf[ArrayData]
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      val nw = words.numElements()
      var wi = 0
      while (wi < nw) {
        if (!words.isNullAt(wi)) {
          val w = words.getUTF8String(wi).toString
          if (w.nonEmpty) {
            if (w.indexOf('\u0001') >= 0) {
              out += InternalRow(0L, UTF8String.fromString(w))
            } else {
              // initial segmentation: code-point characters
              var seg = {
                val b = scala.collection.mutable.ArrayBuffer.empty[String]
                var off = 0
                while (off < w.length) {
                  val e = w.offsetByCodePoints(off, 1)
                  b += w.substring(off, e); off = e
                }
                b
              }
              // subword-nmt encode loop: lowest-rank present pair,
              // merge all occurrences, repeat
              var done = false
              while (!done && seg.length >= 2) {
                var best = Int.MaxValue
                var i = 0
                while (i < seg.length - 1) {
                  val r = rankOf.get(seg(i) + " " + seg(i + 1))
                  if (r != null && r.intValue() < best) best = r.intValue()
                  i += 1
                }
                if (best == Int.MaxValue) done = true
                else {
                  val (p1, p2) = merges(best - 1)
                  val nb = scala.collection.mutable.ArrayBuffer.empty[String]
                  var j = 0
                  while (j < seg.length) {
                    if (j < seg.length - 1 && seg(j) == p1 && seg(j + 1) == p2) {
                      nb += p1 + p2; j += 2 // left-to-right, non-overlapping
                    } else { nb += seg(j); j += 1 }
                  }
                  seg = nb
                }
              }
              seg.foreach { t =>
                val id = idOf.get(t)
                out += InternalRow(if (id == null) 0L else id.longValue(),
                  UTF8String.fromString(t))
              }
            }
          }
        }
        wi += 1
      }
      new GenericArrayData(out.toArray)
    }
    override protected def withNewChildInternal(c: Expression): BpeTokenize =
      copy(child = c)
  }

  /** Vocab arrives as a plan-time literal array<string>, ordered by
    * token_id (index + 1 IS the id) — the q81-codebook discipline: the
    * staged artifact is collected once (bounded, ≤ vocab size rows)
    * and shipped on the function call.
    */
  private def litVocab(e: Expression): Array[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        ad: ArrayData, ArrayType(StringType, _)) =>
      Array.tabulate(ad.numElements())(i => ad.getUTF8String(i).toString)
    case other => throw new IllegalArgumentException(
      s"graft_subword_tokenize: vocab must be a literal array<string>, got $other")
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_subword_tokenize",
      exprs => SubwordTokenize(exprs(0), litVocab(exprs(1))), "scala_udf")
    // merge table arrives as two parallel literal arrays (rank order);
    // the q81-codebook discipline, same as the vocab above.
    reg.createOrReplaceTempFunction("graft_bpe_tokenize",
      exprs => BpeTokenize(exprs(0),
        litVocab(exprs(1)).zip(litVocab(exprs(2)))), "scala_udf")
  }

  /** Subword token stream of a words-array column under `vocab`
    * (ordered by token_id). */
  def subwordTokenize(spark: SparkSession, words: Column,
      vocab: Seq[String]): Column = {
    register(spark)
    call_function("graft_subword_tokenize", words,
      org.apache.spark.sql.functions.typedLit(vocab))
  }

  /** BPE token stream of a words-array column under the rank-ordered
    * merge table (see [[BpeTokenize]]). */
  def bpeTokenize(spark: SparkSession, words: Column,
      merges: Seq[(String, String)]): Column = {
    register(spark)
    call_function("graft_bpe_tokenize", words,
      org.apache.spark.sql.functions.typedLit(merges.map(_._1)),
      org.apache.spark.sql.functions.typedLit(merges.map(_._2)))
  }
}
