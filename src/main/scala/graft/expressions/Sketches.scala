package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sketch operators.
  *
  * Spark's higher-order functions (`transform`/`aggregate`) evaluate
  * their lambdas interpreted — per-element, per-pass. SimHash needs 32
  * passes and MinHash k passes, which costs hundreds of millions of
  * boxed lambda evaluations per 50k docs. These expressions do the same
  * math in ONE tight JVM loop per row (~20× faster) while producing
  * bit-identical results to the DuckDB oracle (same md5-prefix hash,
  * same affine family).
  *
  * CodegenFallback costs one virtual call per row — irrelevant next to
  * the per-element loop. (A `doGenCode` variant is possible but the
  * interpreted loop is already memory-bound.)
  */
object Sketches {

  /** Per-thread MD5 instance: `MessageDigest.getInstance` does a
    * provider lookup + allocation, and the sketch expressions were
    * paying it once per ROW (the digest itself is reused across the
    * row's per-shingle loop, so the per-row constructor was pure
    * overhead). Expression instances can be shared across local-mode
    * task threads, so the cache is a ThreadLocal, not a field.
    */
  private[expressions] val md5Local:
      ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  private[expressions] def requireStringArray(e: Expression, fn: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn requires array<string>, got ${other.catalogString}")
    }

  /** md5-prefix 32-bit hash of UTF-8 bytes: first 4 digest bytes as an
    * unsigned int in a long — equals parsing the first 8 hex chars.
    */
  private[expressions] def hash32(bytes: Array[Byte], md: java.security.MessageDigest): Long = {
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** simhash32(words: array<string>): 32-bit SimHash of the word
    * multiset — bit j set iff the per-bit ±1 vote sum over all word
    * hashes is positive.
    */
  case class SimHash32(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child, "graft_simhash32")
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val md = md5Local.get()
      val counts = new Array[Int](32)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = hash32(arr.getUTF8String(i).getBytes, md)
          var j = 0
          while (j < 32) {
            if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
            j += 1
          }
        }
        i += 1
      }
      var out = 0L
      var j = 0
      while (j < 32) { if (counts(j) > 0) out |= (1L << j); j += 1 }
      out
    }
    override protected def withNewChildInternal(c: Expression): SimHash32 = copy(c)
  }

  /** minhash_sig(shingles: array<string>): array of k minhash values,
    * mh_i = min over shingles of ((a_i*h32(s) + b_i) mod p). One md5
    * and one k-way update per shingle.
    */
  case class MinHashSignature(child: Expression, as: Array[Long],
      bs: Array[Long], p: Long) extends UnaryExpression
      with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child, "graft_minhash_sig")
    // containsNull: an empty shingle set yields k nulls (list_min([]) = NULL)
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val md = md5Local.get()
      val k = as.length
      val mins = Array.fill(k)(Long.MaxValue)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = hash32(arr.getUTF8String(i).getBytes, md)
          var j = 0
          while (j < k) {
            val v = (as(j) * h + bs(j)) % p
            if (v < mins(j)) mins(j) = v
            j += 1
          }
        }
        i += 1
      }
      // Empty input ⇒ null signature values, matching list_min([]) = NULL
      if (n == 0) new GenericArrayData(Array.fill[Any](k)(null))
      else new GenericArrayData(mins.map(Long.box(_): Any))
    }
    override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(c)
  }

  /** minhash_shingles(words: array<string>): MinHash signature computed
    * directly from the word array — word n-gram shingle bytes are
    * assembled in a reused buffer, never materialized as strings.
    * Duplicates need no dedup (min is idempotent), so this equals the
    * signature over the DISTINCT shingle set the oracle uses.
    */
  case class MinHashShingles(child: Expression, n: Int, as: Array[Long],
      bs: Array[Long], p: Long) extends UnaryExpression
      with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child, "graft_minhash_shingles")
    // containsNull: fewer than n words ⇒ no shingles ⇒ k nulls
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val md = md5Local.get()
      val k = as.length
      val nw = arr.numElements()
      val nShingles = nw - n + 1
      if (nShingles <= 0) return new GenericArrayData(Array.fill[Any](k)(null))
      // Null words become empty strings (window structure preserved,
      // no NPE), matching MinHashSignature's null-element tolerance.
      val words = Array.tabulate(nw)(i =>
        if (arr.isNullAt(i)) Array.emptyByteArray else arr.getUTF8String(i).getBytes)
      val mins = Array.fill(k)(Long.MaxValue)
      val buf = new java.io.ByteArrayOutputStream(64)
      var i = 0
      while (i < nShingles) {
        buf.reset()
        var t = 0
        while (t < n) {
          if (t > 0) buf.write(' ')
          buf.write(words(i + t))
          t += 1
        }
        val h = hash32(buf.toByteArray, md)
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(mins.map(Long.box(_): Any))
    }
    override protected def withNewChildInternal(c: Expression): MinHashShingles = copy(c)
  }

  /** graft_shingle_set(words[, n]): the distinct n-word shingles of a
    * words array, first-occurrence order — bit-identical to the HOF
    * form `array_distinct(transform(sequence(1, size(w)-n+1), i =>
    * concat_ws(' ', slice(w, i, n))))` with its `when(size(w) >= n)`
    * empty-array fallback, but ONE tight loop per row instead of a
    * per-shingle interpreted lambda + slice/concat_ws allocations
    * (the most expensive map expression of q36/q38/q53's shingle
    * stages). Parity notes: a NULL words array yields the EMPTY array
    * (the HOF's `when(null) ... otherwise(array())`), and null word
    * elements are skipped concat_ws-style (separator only between
    * written pieces).
    */
  case class ShingleSet(child: Expression, n: Int) extends UnaryExpression
      with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child, "graft_shingle_set")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    override def eval(
        input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) new GenericArrayData(Array.empty[Any])
      else evalNonNull(v)
    }
    private def evalNonNull(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val nw = arr.numElements()
      val nSh = nw - n + 1
      if (nSh <= 0) return new GenericArrayData(Array.empty[Any])
      val words = new Array[UTF8String](nw)
      var wi = 0
      while (wi < nw) {
        if (!arr.isNullAt(wi)) words(wi) = arr.getUTF8String(wi)
        wi += 1
      }
      // UTF8String.concatWs IS the codegen'd concat_ws kernel (skips
      // nulls, separator between written pieces) — byte-level, no
      // String round-trips.
      val sep = UTF8String.fromString(" ")
      val out = new java.util.LinkedHashSet[UTF8String]()
      val slice = new Array[UTF8String](n)
      var i = 0
      while (i < nSh) {
        var t = 0
        while (t < n) { slice(t) = words(i + t); t += 1 }
        out.add(UTF8String.concatWs(sep, slice: _*))
        i += 1
      }
      new GenericArrayData(out.toArray(new Array[UTF8String](out.size()))
        .asInstanceOf[Array[Any]])
    }
    override protected def withNewChildInternal(c: Expression): ShingleSet =
      copy(child = c)
  }

  /** graft_bigram_stats(words): struct(n_bigrams, max_count) — the
    * quality cascade's repetition signal. Bit-identical to the HOF
    * form `bgs = array_sort(shingles(w, 2)); (size(bgs),
    * aggregate(longest equal-neighbour run))`: the longest equal run
    * of a SORTED array is the max multiplicity of any element, so a
    * single hash-count pass over the adjacent word pairs (assembled
    * with the concat_ws kernel, exactly the HOF's bigram strings)
    * replaces the per-row sort + interpreted fold. Null/short inputs
    * yield (0, 0), matching shingles()' empty-array fallback.
    */
  case class BigramStats(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child, "graft_bigram_stats")
    override def dataType: DataType = StructType(Seq(
      StructField("n_bigrams", LongType, nullable = false),
      StructField("max_count", LongType, nullable = false)))
    override def nullable: Boolean = false
    override def eval(
        input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null)
        return org.apache.spark.sql.catalyst.InternalRow(0L, 0L)
      val arr = v.asInstanceOf[ArrayData]
      val nw = arr.numElements()
      if (nw < 2)
        return org.apache.spark.sql.catalyst.InternalRow(0L, 0L)
      val words = new Array[UTF8String](nw)
      var wi = 0
      while (wi < nw) {
        if (!arr.isNullAt(wi)) words(wi) = arr.getUTF8String(wi)
        wi += 1
      }
      val sep = UTF8String.fromString(" ")
      val counts = new java.util.HashMap[UTF8String, Long]()
      var best = 0L
      var i = 0
      while (i < nw - 1) {
        val bg = UTF8String.concatWs(sep, words(i), words(i + 1))
        val c = counts.merge(bg, 1L, (a, b) => a + b)
        if (c > best) best = c
        i += 1
      }
      org.apache.spark.sql.catalyst.InternalRow((nw - 1).toLong, best)
    }
    override protected def withNewChildInternal(c: Expression): BigramStats =
      copy(child = c)
  }

  /** shingle_jaccard(wordsA, wordsB): exact Jaccard similarity of the
    * two documents' DISTINCT n-gram shingle sets. Used on LSH candidate
    * pairs only — the quadratic work never touches the full corpus.
    */
  case class ShingleJaccard(left: Expression, right: Expression, n: Int)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = requireStringArray(left, "graft_shingle_jaccard")
      if (l == TypeCheckResult.TypeCheckSuccess)
        requireStringArray(right, "graft_shingle_jaccard")
      else l
    }
    override def dataType: DataType = DoubleType
    private def shingleSet(arr: ArrayData): java.util.HashSet[String] = {
      val out = new java.util.HashSet[String]()
      val nw = arr.numElements()
      if (nw - n + 1 <= 0) return out
      // Null words become empty strings — no NPE on dirty input.
      val words = Array.tabulate(nw)(i =>
        if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString)
      var i = 0
      while (i <= nw - n) {
        val sb = new java.lang.StringBuilder(64)
        var t = 0
        while (t < n) {
          if (t > 0) sb.append(' ')
          sb.append(words(i + t))
          t += 1
        }
        out.add(sb.toString)
        i += 1
      }
      out
    }
    override def nullSafeEval(a: Any, b: Any): Any = {
      val sa = shingleSet(a.asInstanceOf[ArrayData])
      val sb = shingleSet(b.asInstanceOf[ArrayData])
      // Two empty shingle sets share nothing: 0.0, not 0/0 = NaN
      // (NaN would sort above every threshold under Spark ordering).
      if (sa.isEmpty && sb.isEmpty) return 0.0
      var inter = 0
      val it = sb.iterator()
      while (it.hasNext) if (sa.contains(it.next())) inter += 1
      inter.toDouble / (sa.size + sb.size - inter.toDouble)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): ShingleJaccard =
      copy(left = l, right = r)
  }

  /** graft_winnow(words: array<string>): winnowing document
    * fingerprint — hash the ordered n-word shingles, min of each
    * w-wide rolling window, distinct-sort the mins, md5 the
    * comma-joined decimal string (MOSS-style fingerprinting). One
    * pass, one md5 per shingle; bit-identical to the HOF/DuckDB form
    * (md5 of '' for fewer than w windows).
    */
  case class Winnow(child: Expression, n: Int, w: Int)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child, "graft_winnow")
    override def dataType: DataType = StructType(Seq(
      StructField("n_shingles", LongType, nullable = false),
      StructField("n_fingerprints", LongType, nullable = false),
      StructField("fingerprint", StringType, nullable = false)))
    private def md5hex(md: java.security.MessageDigest, s: String): UTF8String = {
      md.reset()
      UTF8String.fromString(md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    }
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val md = md5Local.get()
      val nw = arr.numElements()
      val nSh = nw - n + 1
      if (nSh <= 0)
        return org.apache.spark.sql.catalyst.InternalRow(0L, 0L, md5hex(md, ""))
      val words = Array.tabulate(nw)(i =>
        if (arr.isNullAt(i)) Array.emptyByteArray else arr.getUTF8String(i).getBytes)
      val hs = new Array[Long](nSh)
      val buf = new java.io.ByteArrayOutputStream(64)
      var i = 0
      while (i < nSh) {
        buf.reset()
        var t = 0
        while (t < n) {
          if (t > 0) buf.write(' ')
          buf.write(words(i + t))
          t += 1
        }
        hs(i) = hash32(buf.toByteArray, md)
        i += 1
      }
      val nWin = nSh - w + 1
      if (nWin <= 0)
        return org.apache.spark.sql.catalyst.InternalRow(nSh.toLong, 0L, md5hex(md, ""))
      val mins = new java.util.TreeSet[java.lang.Long]()
      var j = 0
      while (j < nWin) {
        var m = hs(j)
        var t = 1
        while (t < w) { if (hs(j + t) < m) m = hs(j + t); t += 1 }
        mins.add(m)
        j += 1
      }
      val sb = new java.lang.StringBuilder(mins.size * 11)
      val it = mins.iterator()
      while (it.hasNext) {
        if (sb.length > 0) sb.append(',')
        sb.append(it.next().longValue)
      }
      org.apache.spark.sql.catalyst.InternalRow(nSh.toLong, mins.size.toLong,
        md5hex(md, sb.toString))
    }
    override protected def withNewChildInternal(c: Expression): Winnow = copy(c)
  }

  /** graft_dot(x: array<float|double>, y: array<float|double>):
    * double — the dot product Σ (double)x_i · (double)y_i as a strict
    * left fold, bit-identical to
    * `aggregate(zip_with(x, y, (p,q) => p.cast(double)*q.cast(double)),
    * 0.0, _+_)` but one tight loop instead of per-element interpreted
    * lambdas (the embedding hot path: 12.5M pairs × 64 dims at sf0.1).
    * Null parity with the HOF form: null result on length mismatch or
    * any null element. Implements doGenCode so the loop inlines into
    * whole-stage codegen (no per-row virtual call on the pair join).
    */
  case class FloatDot(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    private def elemType(e: Expression): Option[DataType] = e.dataType match {
      case ArrayType(FloatType, _) => Some(FloatType)
      case ArrayType(DoubleType, _) => Some(DoubleType)
      case _ => None
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (elemType(left).isDefined && elemType(right).isDefined)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_fdot requires array<float|double> args, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      val lFloat = elemType(left).contains(FloatType)
      val rFloat = elemType(right).contains(FloatType)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xv = if (lFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rFloat) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
        i += 1
      }
      s
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val lFloat = elemType(left).contains(FloatType)
      val rFloat = elemType(right).contains(FloatType)
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val bad = ctx.freshName("bad")
        val xv = if (lFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
        val yv = if (rFloat) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
        s"""
           |int $n = $x.numElements();
           |if ($y.numElements() != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  boolean $bad = false;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
           |    $acc += $xv * $yv;
           |  }
           |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
           |}
         """.stripMargin
      })
    }
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): FloatDot = copy(l, r)
  }

  /** Round-half-away-from-zero — the JVM twin of Spark's
    * `round(x, 0)` on doubles (BigDecimal HALF_UP) and DuckDB's
    * `round(x)` (std::round), pinned by a property spec against
    * Spark's own function. Used by the micro-quantization path so the
    * native IVF expressions and the `round()`-based oracle SQL agree
    * bit-for-bit.
    */
  private[expressions] def roundAway(p: Double): Double = {
    val f = Math.floor(p)
    val frac = p - f
    if (frac > 0.5) f + 1.0
    else if (frac < 0.5) f
    else if (p >= 0) f + 1.0 else f // exact .5 tie: away from zero
  }

  private[expressions] def elemAsDouble(dt: DataType): (ArrayData, Int) => Double =
    dt match {
      case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
      case other => throw new IllegalArgumentException(
        s"expected array<float|double>, got ${other.catalogString}")
    }

  private[expressions] def requireNumArray(e: Expression, fn: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn requires array<float|double>, got ${other.catalogString}")
    }

  /** graft_microq(emb: array<float|double>): array<double> — each
    * component quantized to exact integer micro-units,
    * round(CAST(v AS DOUBLE) * 1e6). The values stay integer-exact in
    * doubles (corpus components are ≪ 2^53 micro), so downstream sums
    * and distances are order-insensitive and bit-identical to the
    * DuckDB `round(CAST(v AS DOUBLE) * 1000000, 0)` twin.
    */
  case class MicroQuantize(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      requireNumArray(child, "graft_microq")
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    @transient private lazy val get = elemAsDouble(child.dataType)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        // Loud on contract drift: the oracle's round(NULL) would
        // NULL-propagate where a primitive read returns 0 — fail
        // instead of silently diverging.
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          "graft_microq: null embedding component")
        out(i) = roundAway(get(arr, i) * 1e6)
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): MicroQuantize = copy(c)
  }

  /** graft_ivf_rank(emb, centroids): array<struct<nd double, cell int>>
    * sorted ascending by (nd, cell) — the IVF coarse-quantizer cell
    * ranking. The embedding is micro-quantized ([[MicroQuantize]]'s
    * exact integers) and nd is the EXACT squared euclidean distance to
    * each centroid, accumulated in longs (≪ 2^63) and emitted as an
    * integer-valued double — so the argmin and every tiebreak are
    * bit-identical to the oracle's sequential DOUBLE list_sum (exact
    * integer adds on both sides). Centroids arrive as a 2-D literal of
    * integer-valued doubles (micro units).
    */
  case class IvfCellRank(child: Expression, cents: Array[Array[Long]],
      preScaled: Boolean = false)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      requireNumArray(child, "graft_ivf_rank")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("nd", DoubleType, nullable = false),
      StructField("cell", IntegerType, nullable = false))), containsNull = false)
    @transient private lazy val get = elemAsDouble(child.dataType)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val dims = arr.numElements()
      val xq = new Array[Long](dims)
      var i = 0
      while (i < dims) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          "graft_ivf_rank: null embedding component")
        // preScaled: the input is ALREADY in exact micro units (e.g. a
        // coarse-quantizer residual, an integer difference of two
        // micro vectors) — quantizing again would scale it 1e6×.
        xq(i) = if (preScaled) roundAway(get(arr, i)).toLong
                else roundAway(get(arr, i) * 1e6).toLong
        i += 1
      }
      val k = cents.length
      val ds = new Array[Long](k)
      var c = 0
      while (c < k) {
        val cv = cents(c)
        val n = math.min(dims, cv.length)
        var d = 0L
        var j = 0
        while (j < n) { val t = xq(j) - cv(j); d += t * t; j += 1 }
        ds(c) = d
        c += 1
      }
      val order = Array.range(0, k).sortBy(ds(_)) // stable: ties keep cell order
      new GenericArrayData(order.map(c0 =>
        org.apache.spark.sql.catalyst.InternalRow(ds(c0).toDouble, c0): Any))
    }
    override protected def withNewChildInternal(c: Expression): IvfCellRank = copy(child = c)
  }

  /** Literal-int extractor for function-registry builder args: the
    * sketch params (shingle n, signature k) arrive as trailing literal
    * arguments of the SQL function call, fixed at plan time.
    */
  private def litInt(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected a literal int parameter, got $other")
  }

  /** Registers the sketch functions in the session's function registry
    * (idempotent) and returns Column builders via call_function — the
    * public route to use a custom Expression without private Column
    * internals.
    *
    * The minhash/jaccard functions take OPTIONAL trailing literal
    * params — `graft_minhash_shingles(words[, n, k])`,
    * `graft_shingle_jaccard(a, b[, n])` — so the sketch family is
    * tunable per call site (SURVEY's 1-(1-p^r)^b recall/cost knob)
    * without re-registering; omitted params keep the original
    * k=16 / n=3 defaults, and k is capped by the shared
    * [[graft.functions.Dedup.MinhashParams]] family so the engine and
    * the DuckDB oracle always draw the same affine constants.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_simhash32",
      exprs => SimHash32(exprs.head), "scala_udf")
    val (as, bs) = graft.functions.Dedup.MinhashParams.toArray.unzip
    def take(k: Int, fn: String): (Array[Long], Array[Long]) = {
      require(k >= 1 && k <= as.length,
        s"$fn: k=$k outside 1..${as.length} (MinhashParams family size)")
      (as.take(k), bs.take(k))
    }
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      exprs => {
        val k = if (exprs.length > 1) litInt(exprs(1), "graft_minhash_sig") else 16
        val (a, b) = take(k, "graft_minhash_sig")
        MinHashSignature(exprs.head, a, b, graft.functions.Dedup.MinhashP)
      }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_minhash_shingles",
      exprs => {
        val n = if (exprs.length > 1) litInt(exprs(1), "graft_minhash_shingles") else 3
        val k = if (exprs.length > 2) litInt(exprs(2), "graft_minhash_shingles") else 16
        val (a, b) = take(k, "graft_minhash_shingles")
        MinHashShingles(exprs.head, n, a, b, graft.functions.Dedup.MinhashP)
      }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_bigram_stats",
      exprs => BigramStats(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_shingle_set",
      exprs => ShingleSet(exprs.head,
        if (exprs.length > 1) litInt(exprs(1), "graft_shingle_set") else 3),
      "scala_udf")
    reg.createOrReplaceTempFunction("graft_shingle_jaccard",
      exprs => ShingleJaccard(exprs(0), exprs(1),
        if (exprs.length > 2) litInt(exprs(2), "graft_shingle_jaccard") else 3),
      "scala_udf")
    reg.createOrReplaceTempFunction("graft_fdot",
      exprs => FloatDot(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_winnow",
      exprs => Winnow(exprs.head, 3, 4), "scala_udf")
    reg.createOrReplaceTempFunction("graft_microq",
      exprs => MicroQuantize(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_ivf_rank",
      exprs => IvfCellRank(exprs(0),
        litCentroids(exprs(1), "graft_ivf_rank")), "scala_udf")
    reg.createOrReplaceTempFunction("graft_ivf_rank_raw",
      exprs => IvfCellRank(exprs(0),
        litCentroids(exprs(1), "graft_ivf_rank_raw"),
        preScaled = true), "scala_udf")
  }

  /** Centroids arrive as a plan-time 2-D literal (array<array<double>>
    * of integer-valued micro components) on the function call.
    */
  private def litCentroids(e: Expression, fn: String): Array[Array[Long]] =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(
          ad: ArrayData, ArrayType(ArrayType(DoubleType, _), _)) =>
        Array.tabulate(ad.numElements())(i =>
          ad.getArray(i).toDoubleArray().map(_.toLong))
      case other => throw new IllegalArgumentException(
        s"$fn: centroids must be a literal array<array<double>>, got $other")
    }

  /** Exact micro-quantization of a float/double array column. */
  def microQuantize(spark: SparkSession, emb: Column): Column = {
    register(spark)
    call_function("graft_microq", emb)
  }

  /** IVF cell ranking of an embedding against micro-unit centroids:
    * sorted array of (exact squared distance, cell).
    */
  def ivfCellRank(spark: SparkSession, emb: Column,
      cents: Array[Array[Long]]): Column = {
    register(spark)
    call_function("graft_ivf_rank", emb,
      org.apache.spark.sql.functions.typedLit(
        cents.map(_.toSeq.map(_.toDouble)).toSeq))
  }

  /** [[ivfCellRank]] over an input ALREADY in micro units (residuals,
    * integer differences of micro vectors) — skips the ×1e6
    * quantization, everything else identical.
    */
  def ivfCellRankRaw(spark: SparkSession, microVec: Column,
      cents: Array[Array[Long]]): Column = {
    register(spark)
    call_function("graft_ivf_rank_raw", microVec,
      org.apache.spark.sql.functions.typedLit(
        cents.map(_.toSeq.map(_.toDouble)).toSeq))
  }

  /** Winnowing fingerprint struct (3-word shingles, 4-wide windows). */
  def winnow(spark: SparkSession, words: Column): Column = {
    register(spark)
    call_function("graft_winnow", words)
  }

  /** Exact left-fold dot product of two float/double array columns. */
  def fdot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_fdot", a, b)
  }

  /** MinHash signature straight from a words array: k affine minima
    * over n-word shingles (defaults: the original n=3, k=16 family).
    */
  def minhashSigFromWords(spark: SparkSession, words: Column,
      shingleN: Int = 3, k: Int = 16): Column = {
    register(spark)
    call_function("graft_minhash_shingles", words,
      org.apache.spark.sql.functions.lit(shingleN),
      org.apache.spark.sql.functions.lit(k))
  }

  /** Bigram repetition stats (n_bigrams, max_count) of a words array. */
  def bigramStats(spark: SparkSession, words: Column): Column = {
    register(spark)
    call_function("graft_bigram_stats", words)
  }

  /** Distinct n-word shingles of a words array (native twin of
    * [[graft.functions.TextFunctions.shingleSet]]).
    */
  def shingleSet(spark: SparkSession, words: Column, n: Int): Column = {
    register(spark)
    call_function("graft_shingle_set", words,
      org.apache.spark.sql.functions.lit(n))
  }

  /** Exact n-gram shingle-set Jaccard of two word arrays (default n=3). */
  def shingleJaccard(spark: SparkSession, a: Column, b: Column,
      n: Int = 3): Column = {
    register(spark)
    call_function("graft_shingle_jaccard", a, b,
      org.apache.spark.sql.functions.lit(n))
  }

  def simhash32(spark: SparkSession, words: Column): Column = {
    register(spark)
    call_function("graft_simhash32", words)
  }

  def minhashSig(spark: SparkSession, shingles: Column): Column = {
    register(spark)
    call_function("graft_minhash_sig", shingles)
  }
}
