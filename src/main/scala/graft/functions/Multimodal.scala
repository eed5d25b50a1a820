package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode/feature steps run as batched
  * partition-level functions (the Scala analog of `mapInPandas`).
  *
  * Image decode is REAL — [[ImageCodec]] drives the JDK's built-in
  * PNG/BMP/GIF/JPEG readers on the executors, and the q43/q44 oracle
  * entries check the decoded pixels against a DuckDB twin that
  * recomputes the fixture's pixel formula in SQL. Non-image payloads
  * (e.g. a text corpus viewed as binary) fall back to deterministic
  * byte-domain metadata/features, which is what the q22/q26 oracles
  * pin. Only VIDEO frame-sampling remains a byte-domain stand-in (the
  * JDK ships no video codec); its distributed shape — per-partition
  * decoder init, typed binary outputs, no driver collection — is the
  * real contract and is what matters at 100 TB (payload bytes never
  * leave the executor).
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("content_hash", StringType, nullable = false),
    StructField("first_byte", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
  ))

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Dimensions for any payload: real codec decode for images; for
    * opaque/non-image payloads a deterministic byte-domain projection
    * (length mod frame) — the documented fallback the q22 oracle pins
    * for text corpora.
    */
  private def dimensions(bytes: Array[Byte]): (Int, Int) =
    ImageCodec.decode(bytes).map(d => (d.width, d.height))
      .getOrElse((bytes.length % 640, bytes.length % 480))

  /** Partition-batched metadata extraction over (id, binary) rows. Runs
    * as mapPartitions so per-batch setup (codec readers are initialized
    * once per partition, not per row) is amortized — the
    * `mapInPandas` batching contract.
    */
  def extractMeta(docs: DataFrame, idCol: String, binCol: String): DataFrame = {
    val in = docs.select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
    val enc = RowEncoder.encoderFor(metaSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h) = dimensions(bytes)
        val first = if (bytes.nonEmpty) bytes(0) & 0xff else -1
        Row(id, bytes.length.toLong, md5hex(bytes), first, w, h)
      }
    }(enc)
  }

  /** The documents table viewed as a multimodal table: text payload cast
    * to binary stands in for an image/audio blob.
    */
  def q22MultimodalMeta(s: SparkSession, dir: String): DataFrame =
    extractMeta(
      graft.Tables.documents(s, dir).select(col("doc_id"),
        col("text").cast("binary").as("payload")),
      "doc_id", "payload")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** Image feature vector from DECODED pixels: f0–f2 = global channel
    * means /255, f3 = aspect ratio w/(w+h), f4+ = per-quadrant
    * luminance means /255 (row-major quadrants, cycling). Every value
    * is an exact integer sum divided once, so it is reproducible
    * across JVMs.
    */
  def imageFeatures(d: DecodedImage, k: Int): Array[Double] = {
    val (sr, sg, sb) = ImageCodec.channelSums(d)
    val n = d.rgb.length.toDouble
    val quads = Array.ofDim[Long](4); val qn = Array.ofDim[Long](4)
    var i = 0
    while (i < d.rgb.length) {
      val x = i % d.width; val y = i / d.width
      val q = (if (y * 2 >= d.height) 2 else 0) + (if (x * 2 >= d.width) 1 else 0)
      val p = d.rgb(i)
      // integer luminance: (2r + 5g + b) / 8 scaled by 8 to stay exact
      quads(q) += 2L * ((p >> 16) & 0xff) + 5L * ((p >> 8) & 0xff) + (p & 0xff)
      qn(q) += 1
      i += 1
    }
    Array.tabulate(k) {
      case 0 => sr / n / 255.0
      case 1 => sg / n / 255.0
      case 2 => sb / n / 255.0
      case 3 => d.width.toDouble / (d.width + d.height)
      case j =>
        val q = (j - 4) % 4
        if (qn(q) == 0) 0.0 else quads(q).toDouble / (8.0 * 255.0 * qn(q))
    }
  }

  /** Byte-domain feature fallback for non-image payloads: k
    * pseudo-embedding components, component j = md5-prefix hash of
    * (payload ++ "_j") scaled into [0,1). Pure function of the payload
    * (test/oracle-reproducible; the q26 oracle's twin), and the
    * division by 2^32 is exact in doubles so both engines emit the
    * identical value.
    */
  def featureStub(bytes: Array[Byte], k: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(k) { j =>
      md.reset()
      md.update(bytes)
      md.update(s"_$j".getBytes("UTF-8"))
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      h.toDouble / 4294967296.0
    }
  }

  /** Byte-domain resize for opaque payloads: nearest-neighbor resample
    * of the payload to `outLen` bytes. The REAL image resize (decoded
    * pixels, integer nearest-neighbor) is [[resizeImages]] / q44.
    */
  def resizeStub(bytes: Array[Byte], outLen: Int): Array[Byte] =
    if (bytes.isEmpty) Array.emptyByteArray
    else Array.tabulate(outLen)(i =>
      bytes(((i.toLong * bytes.length) / outLen).toInt))

  /** Frame sampler stand-in: `n` fixed-length windows at evenly spaced
    * offsets (a real implementation would decode video keyframes — the
    * JDK ships no video codec, so this is the one remaining byte-domain
    * stand-in). Windows are clamped to the payload, so short payloads
    * yield short frames.
    */
  def frameSampleStub(bytes: Array[Byte], n: Int,
      frameLen: Int): Array[Array[Byte]] =
    Array.tabulate(n) { i =>
      val off = if (n == 1) 0 else ((i.toLong * math.max(bytes.length - frameLen, 0)) / (n - 1)).toInt
      java.util.Arrays.copyOfRange(bytes, off,
        math.min(off + frameLen, bytes.length))
    }

  private def featureSchema(k: Int): StructType = StructType(
    StructField("id", LongType, nullable = false) +:
      (0 until k).map(j => StructField(f"f$j%02d", DoubleType, nullable = false)))

  /** Partition-batched feature extraction (the mapInPandas-shaped
    * stage): one fixed-width feature row per payload, bytes never leave
    * the executor. Image payloads get REAL pixel-statistics features
    * ([[imageFeatures]], exercised by MultimodalSpec over encoded
    * PNGs); opaque payloads the byte-domain fallback (the q26 oracle).
    */
  def extractFeatures(docs: DataFrame, idCol: String, binCol: String,
      k: Int = 8): DataFrame = {
    val in = docs.select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
    val enc = RowEncoder.encoderFor(featureSchema(k))
    in.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val fs = ImageCodec.decode(bytes).map(imageFeatures(_, k))
          .getOrElse(featureStub(bytes, k))
        Row.fromSeq(r.getLong(0) +: fs.toSeq)
      }
    }(enc)
  }

  private val transformSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("resized", BinaryType, nullable = false),
    StructField("frames", ArrayType(BinaryType, containsNull = false),
      nullable = false)))

  /** Partition-batched byte-domain resize + frame-sample over
    * (id, binary) rows — the transform stage for OPAQUE payloads
    * (per-partition decoder init point, typed binary outputs, no
    * driver collection). The real image transform is [[resizeImages]].
    */
  def transformMedia(docs: DataFrame, idCol: String, binCol: String,
      outLen: Int = 64, nFrames: Int = 4, frameLen: Int = 16): DataFrame = {
    val in = docs.select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
    val enc = RowEncoder.encoderFor(transformSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.getLong(0), resizeStub(bytes, outLen),
          frameSampleStub(bytes, nFrames, frameLen).toSeq)
      }
    }(enc)
  }

  /** Driver-gated feature query: 8 features per document (byte-domain
    * path — the documents' payloads are text, not images).
    */
  def q26MultimodalFeatures(s: SparkSession, dir: String): DataFrame =
    extractFeatures(
      graft.Tables.documents(s, dir).select(col("doc_id"),
        col("text").cast("binary").as("payload")),
      "doc_id", "payload")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  // ---- Real image decode, oracle-gated (q43/q44) ----------------------

  private val imageMetaSchema: StructType = StructType(Seq(
    StructField("img_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  private val imageResizeSchema: StructType = StructType(Seq(
    StructField("img_id", LongType, nullable = false),
    StructField("rgb_hex", StringType, nullable = false)))

  private val imageDhashSchema: StructType = StructType(Seq(
    StructField("img_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("dhash_hex", StringType, nullable = false)))

  // One PNG encode pass per session: the (img_id, png) table is also
  // materialized to the fixture dir so the DuckDB twin can enumerate
  // the same img_ids (it recomputes everything else from the formula).
  private val imageCache =
    new graft.SessionCache[DataFrame]()

  private def images(s: SparkSession): DataFrame =
    imageCache.get(s, (s2: SparkSession) => {
      import s2.implicits._
      val df = (0 until MediaFixture.nImages)
        .map(id => (id.toLong, MediaFixture.png(id))).toDF("img_id", "png")
        .persist()
      df.count()
      graft.queries.FixtureIO.writeStable(
        df, s"${MediaFixture.fixtureDir}/images")
      df
    })

  /** Decode each PNG on the executors and report dimensions plus exact
    * per-channel pixel sums. The DuckDB twin recomputes the fixture's
    * pixel formula in SQL — a decode defect (wrong size, channel
    * order, pixel values) breaks the hash.
    */
  def q43ImageMeta(s: SparkSession, dir: String): DataFrame = {
    val enc = RowEncoder.encoderFor(imageMetaSchema)
    images(s).mapPartitions { rows =>
      rows.map { r =>
        val d = ImageCodec.decode(r.getAs[Array[Byte]](1)).getOrElse(
          throw new IllegalStateException("fixture PNG failed to decode"))
        val (sr, sg, sb) = ImageCodec.channelSums(d)
        Row(r.getLong(0), d.width, d.height, sr, sg, sb)
      }
    }(enc).orderBy(col("img_id"))
  }

  /** Real image resize: decode → integer nearest-neighbor resample to
    * `ow`×`oh` → hex-packed RGB (row-major). Executor-local pixels,
    * mapPartitions shape.
    */
  def resizeImages(imgs: DataFrame, idCol: String, binCol: String,
      ow: Int, oh: Int): DataFrame = {
    val in = imgs.select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
    val enc = RowEncoder.encoderFor(imageResizeSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val d = ImageCodec.decode(r.getAs[Array[Byte]](1)).getOrElse(
          throw new IllegalStateException("payload failed to decode"))
        Row(r.getLong(0), ImageCodec.toHex(ImageCodec.resampleNearest(d, ow, oh)))
      }
    }(enc)
  }

  def q44ImageResize(s: SparkSession, dir: String): DataFrame =
    resizeImages(images(s), "img_id", "png", 4, 4).orderBy(col("img_id"))

  /** dHash perceptual image fingerprint — the standard image near-dup
    * signature: decode, integer nearest-resample to a 9×8 grid, exact
    * integer luma ((299r+587g+114b)//1000), bit k = [gray(i+1,j) >
    * gray(i,j)] over the 8×8 adjacent-column gradient (row-major
    * k = j·8+i), emitted as 16 hex chars (hi word then lo word, so
    * the 64th bit needs no signed-BIGINT gymnastics in either
    * engine). Hamming distance on the hash ≈ visual similarity;
    * corpus-scale candidate pairs band it exactly like q30's Charikar
    * blocks. Every stage is exact integer math, so the DuckDB twin
    * replays decode→resample→luma→gradient from the fixture's pixel
    * formula — the engine's real ImageIO decode is load-bearing in
    * the gate.
    */
  /** The dHash bit computation over a decoded image: 9×8 nearest
    * resample → integer luma → adjacent-column gradient bits, returned
    * as the (hi, lo) 32-bit halves. Shared by the image operator (q57)
    * and the video-frame composition (q61).
    */
  private def dhashHalves(d: DecodedImage): (Long, Long) = {
    val px = ImageCodec.resampleNearest(d, 9, 8)
    def gray(p: Int): Int =
      (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
        114 * (p & 0xff)) / 1000
    var lo = 0L
    var hi = 0L
    var k = 0
    while (k < 64) {
      val i = k % 8
      val j = k / 8
      if (gray(px(j * 9 + i + 1)) > gray(px(j * 9 + i))) {
        if (k < 32) lo |= (1L << k) else hi |= (1L << (k - 32))
      }
      k += 1
    }
    (hi, lo)
  }

  def imageDhash(imgs: DataFrame, idCol: String, binCol: String): DataFrame = {
    val in = imgs.select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
    val enc = RowEncoder.encoderFor(imageDhashSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val d = ImageCodec.decode(r.getAs[Array[Byte]](1)).getOrElse(
          throw new IllegalStateException("payload failed to decode"))
        val (hi, lo) = dhashHalves(d)
        Row(r.getLong(0), d.width, d.height, f"$hi%08x$lo%08x")
      }
    }(enc)
  }

  def q57ImageDhash(s: SparkSession, dir: String): DataFrame =
    imageDhash(images(s), "img_id", "png").orderBy(col("img_id"))

  private val audioMetaSchema: StructType = StructType(Seq(
    StructField("clip_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_us", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false)))

  private val clipCache =
    new graft.SessionCache[DataFrame]()

  private def clips(s: SparkSession): DataFrame =
    clipCache.get(s, (s2: SparkSession) => {
      import s2.implicits._
      val df = (0 until MediaFixture.nClips)
        .map(id => (id.toLong, MediaFixture.wav(id))).toDF("clip_id", "wav")
        .persist()
      df.count()
      graft.queries.FixtureIO.writeStable(
        df, s"${MediaFixture.fixtureDir}/audio")
      df
    })

  /** Audio signal metadata over opaque WAV binary columns: a GENUINE
    * RIFF/PCM16 parse on the executors ([[AudioCodec.decodeWav]] —
    * magic checks, chunk walk, little-endian samples), then exact
    * integer signal statistics (duration in µs, Σ|s|, Σs², peak).
    * The DuckDB twin regenerates the fixture's sample formula
    * arithmetically, so a decode defect — wrong endianness, header
    * off-by-one, channel misparse — breaks the hash gate. Completes
    * the multimodal triad next to the image operators (q43/q44/q57);
    * same scale shape: map-only per-row decode, bytes never leave
    * executors.
    */
  def audioMeta(clipsDf: DataFrame, idCol: String, binCol: String): DataFrame = {
    val in = clipsDf.select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
    val enc = RowEncoder.encoderFor(audioMetaSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val d = AudioCodec.decodeWav(r.getAs[Array[Byte]](1)).getOrElse(
          throw new IllegalStateException("payload failed to decode as WAV"))
        var sumAbs = 0L
        var sumSq = 0L
        var peak = 0
        d.samples.foreach { s0 =>
          val v = s0.toInt
          val a = math.abs(v)
          sumAbs += a
          sumSq += v.toLong * v
          if (a > peak) peak = a
        }
        Row(r.getLong(0), d.sampleRate, d.samples.length.toLong,
          d.samples.length.toLong * 1000000L / d.sampleRate,
          sumAbs, sumSq, peak)
      }
    }(enc)
  }

  def q58AudioMeta(s: SparkSession, dir: String): DataFrame =
    audioMeta(clips(s), "clip_id", "wav").orderBy(col("clip_id"))

  private val videoFrameSchema: StructType = StructType(Seq(
    StructField("video_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  private val videoCache =
    new graft.SessionCache[DataFrame]()

  private def videos(s: SparkSession): DataFrame =
    videoCache.get(s, (s2: SparkSession) => {
      import s2.implicits._
      val df = (0 until MediaFixture.nVideos)
        .map(id => (id.toLong, MediaFixture.video(id))).toDF("video_id", "gvid")
        .persist()
      df.count()
      graft.queries.FixtureIO.writeStable(
        df, s"${MediaFixture.fixtureDir}/videos")
      df
    })

  /** Video FRAME-SAMPLING over opaque container binary columns: walk
    * the container header on the executor, slice out only every
    * `stride`-th frame (unsampled frames are never copied), decode
    * each sampled frame for real (ImageIO) and report exact per-frame
    * channel sums. The production shape for "take 1 frame/sec from
    * 100 TB of video": per-row work is bounded by sampled frames, the
    * bytes never leave the executor, and the output is a long-form
    * (video, frame) table ready for the image operators (q57's dHash
    * composes directly). The oracle recomputes each sampled frame's
    * sums from the fixture formula — container-walk or decode defects
    * break the hash gate.
    */
  def sampleVideoFrames(vids: DataFrame, idCol: String, binCol: String,
      stride: Int): DataFrame = {
    val in = vids.select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
    val enc = RowEncoder.encoderFor(videoFrameSchema)
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val n = VideoContainer.frameCount(bytes).getOrElse(
          throw new IllegalStateException("payload is not a GVID container"))
        val idxs = 0 until n by stride
        val frames = VideoContainer.sampleFrames(bytes, idxs).getOrElse(
          throw new IllegalStateException("container frame walk failed"))
        idxs.zip(frames).map { case (f, png) =>
          val d = ImageCodec.decode(png).getOrElse(
            throw new IllegalStateException(s"frame $f failed to decode"))
          val (sr, sg, sb) = ImageCodec.channelSums(d)
          Row(r.getLong(0), f, d.width, d.height, sr, sg, sb)
        }
      }
    }(enc)
  }

  def q59VideoFrames(s: SparkSession, dir: String): DataFrame =
    sampleVideoFrames(videos(s), "video_id", "gvid", stride = 3)
      .orderBy(col("video_id"), col("frame_idx"))

  private val videoDhashSchema: StructType = StructType(Seq(
    StructField("video_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false),
    StructField("dhash_hex", StringType, nullable = false)))

  /** q59's container walk composed with q57's fingerprint: slice the
    * sampled frames, dHash each — one map-only pass, bytes never leave
    * the executor; the (hi, lo) halves ride along so downstream
    * banding/Hamming needs no hex re-parse.
    */
  def videoFrameDhash(vids: DataFrame, idCol: String, binCol: String,
      stride: Int): DataFrame = {
    val in = vids.select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
    val enc = RowEncoder.encoderFor(videoDhashSchema)
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val n = VideoContainer.frameCount(bytes).getOrElse(
          throw new IllegalStateException("payload is not a GVID container"))
        val idxs = 0 until n by stride
        val frames = VideoContainer.sampleFrames(bytes, idxs).getOrElse(
          throw new IllegalStateException("container frame walk failed"))
        idxs.zip(frames).map { case (f, png) =>
          val d = ImageCodec.decode(png).getOrElse(
            throw new IllegalStateException(s"frame $f failed to decode"))
          val (hi, lo) = dhashHalves(d)
          Row(r.getLong(0), f, hi, lo, f"$hi%08x$lo%08x")
        }
      }
    }(enc)
  }

  /** FRAME-level video near-dup report — the composition the video
    * pipeline actually runs ("is this minute of footage a re-upload of
    * that one?"): sampled frames → dHash → near-dup verdict per frame.
    * A frame's `dup_of` is the smallest (video, frame) whose hash is
    * within Hamming distance 3; frames with no earlier neighbour are
    * their own canonical (`is_dup = false`) — the q34 keep/drop shape
    * at frame granularity, so the report is total (one row per sampled
    * frame) rather than sparse pairs.
    *
    * Scale shape: candidates come from 4 exact 16-bit bands of the
    * 64-bit hash — by pigeonhole a pair within Hamming ≤ 3 collides in
    * at least one band, so the banded equi-join + exact Hamming verify
    * EQUALS the brute-force pair set (no recall loss, no n² anywhere;
    * q30's Charikar-block pattern). The oracle brute-forces the same
    * predicate over the formula-replayed hashes — affordable at
    * fixture scale, bit-identical by construction.
    */
  def q61VideoFrameNearDup(s: SparkSession, dir: String): DataFrame = {
    val fr = videoFrameDhash(videos(s), "video_id", "gvid", stride = 3)
      // frame key: video*1e6+idx keeps (video, frame) ordering in one
      // long (frame_idx ≪ 1e6 by construction — stride-sampled indices)
      .withColumn("fk", col("video_id") * 1000000L + col("frame_idx"))
    hash64NearDupVerdict(fr)
      .select(col("video_id"), col("frame_idx"), col("dhash_hex"),
        expr("dup_fk div 1000000").as("dup_video_id"),
        pmod(col("dup_fk"), lit(1000000L)).cast("int").as("dup_frame_idx"),
        (col("dup_fk") =!= col("fk")).as("is_dup"))
      .orderBy(col("video_id"), col("frame_idx"))
  }

  /** Near-dup verdict over any 64-bit perceptual hash: the input needs
    * `fk` (an ordering key), `hi`, `lo` (the hash halves) — every
    * other column rides through. Appends `dup_fk` = the smallest fk
    * whose hash is within Hamming distance 3, or the row's own fk.
    * Candidates come from 4 exact 16-bit bands (pigeonhole-complete
    * for Hamming ≤ 3 — no recall loss vs brute force, no n²
    * anywhere); shared by the video-frame (q61) and audio-clip (q62)
    * near-dup reports.
    */
  private def hash64NearDupVerdict(fr0: DataFrame): DataFrame = {
    val fr = fr0.localCheckpoint(true) // tiny (one row per item); feeds
                                       // banding, both verify sides and
                                       // the output spine
    val banded = fr.select(col("fk"), posexplode(array(
      col("lo").bitwiseAND(lit(65535L)),
      shiftright(col("lo"), 16).bitwiseAND(lit(65535L)),
      col("hi").bitwiseAND(lit(65535L)),
      shiftright(col("hi"), 16).bitwiseAND(lit(65535L)))))
      .select(col("fk"), col("pos").as("band"), col("col").as("bv"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.fk") < col("b.fk"))
      .select(col("a.fk").as("fk_a"), col("b.fk").as("fk_b")).distinct()
    val ham = cand
      .join(fr.select(col("fk").as("fk_a"), col("hi").as("hi_a"),
        col("lo").as("lo_a")), "fk_a")
      .join(fr.select(col("fk").as("fk_b"), col("hi").as("hi_b"),
        col("lo").as("lo_b")), "fk_b")
      .filter(expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)") <= 3)
    val dup = ham.groupBy(col("fk_b").as("fk")).agg(min(col("fk_a")).as("dup_fk"))
    fr.join(dup, Seq("fk"), "left")
      .withColumn("dup_fk", coalesce(col("dup_fk"), col("fk")))
  }

  private val audioHashSchema: StructType = StructType(Seq(
    StructField("clip_id", LongType, nullable = false),
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false),
    StructField("ahash_hex", StringType, nullable = false)))

  /** Perceptual AUDIO fingerprint — dHash's idea on the waveform
    * envelope: split the clip into 65 equal windows (sample t →
    * window t·65/n, integer floor), sum |sample| per window (exact
    * integer energy), bit k = [E(k+1) > E(k)] over the 64 adjacent
    * deltas. Loudness-profile shaped, so a re-encoded / gain-shifted
    * copy keeps most bits (the audio analogue of q57's gradient
    * fingerprint), and every stage is integer-exact so the DuckDB
    * twin replays it from the fixture's sample formula — the genuine
    * RIFF/PCM16 parse (q58's decoder) stays load-bearing.
    */
  def audioEnvelopeHash(clipsDf: DataFrame, idCol: String,
      binCol: String): DataFrame = {
    val in = clipsDf.select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
    val enc = RowEncoder.encoderFor(audioHashSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val d = AudioCodec.decodeWav(r.getAs[Array[Byte]](1)).getOrElse(
          throw new IllegalStateException("payload failed to decode as WAV"))
        val n = d.samples.length
        require(n >= 65, s"clip too short for a 65-window envelope: $n")
        val en = new Array[Long](65)
        var t = 0
        while (t < n) {
          en(t * 65 / n) += math.abs(d.samples(t).toInt)
          t += 1
        }
        var lo = 0L
        var hi = 0L
        var k = 0
        while (k < 64) {
          if (en(k + 1) > en(k)) {
            if (k < 32) lo |= (1L << k) else hi |= (1L << (k - 32))
          }
          k += 1
        }
        Row(r.getLong(0), hi, lo, f"$hi%08x$lo%08x")
      }
    }(enc)
  }

  /** CLIP-level audio near-dup — completes near-dup coverage across
    * the modality triad (text: q15/q38, image/video: q57/q61, audio:
    * here): envelope fingerprint per clip, then the same
    * banding-exact Hamming ≤ 3 verdict as q61. Same scale shape:
    * map-only decode (bytes never leave executors) + the banded
    * equi-join; the oracle brute-forces the verdict over
    * formula-replayed fingerprints.
    */
  def q62AudioNearDup(s: SparkSession, dir: String): DataFrame = {
    val fr = audioEnvelopeHash(clips(s), "clip_id", "wav")
      .withColumn("fk", col("clip_id"))
    hash64NearDupVerdict(fr)
      .select(col("clip_id"), col("ahash_hex"),
        col("dup_fk").as("dup_clip_id"),
        (col("dup_fk") =!= col("fk")).as("is_dup"))
      .orderBy(col("clip_id"))
  }

  /** Materialize the image fixture (idempotent per session) and return
    * its parquet directory — the streaming image-dedup job (q63) reads
    * the same fixture THROUGH a file stream instead of the in-memory
    * frame.
    */
  private[graft] def ensureImagesFixture(s: SparkSession): String = {
    images(s)
    s"${MediaFixture.fixtureDir}/images"
  }

  /** Largest live fixture-cache entry count (post-sweep) — the leak
    * gauge Bench prints after its fresh-session-per-entry loop: a
    * value > live-session count means stopped sessions are retained.
    */
  private[graft] def fixtureCacheSize: Int =
    Seq(imageCache, clipCache, videoCache).map(_.size).max
}

/** Deterministic media fixture: tiny truecolor PNGs built from a pure
  * pixel formula, so the q43/q44 DuckDB twins can recompute the
  * expected decode output in SQL without any image library. PNG is
  * lossless — encode(formula) then decode must reproduce the formula
  * exactly, making the engine's ImageIO decode load-bearing in the
  * oracle gate.
  */
object MediaFixture {
  val fixtureDir: String =
    sys.env.getOrElse("GRAFT_MEDIA_FIXTURE_DIR", "/root/repo/.fixture/media")
  val nImages = 96
  def width(id: Int): Int = 4 + id % 13
  def height(id: Int): Int = 3 + id % 11
  def rgb(id: Int, x: Int, y: Int): Int =
    (((17 * x + 29 * y + 31 * id) % 256) << 16) |
    (((3 * x + 7 * y + 11 * id) % 256) << 8) |
    ((13 * x + 5 * y + 19 * id) % 256)
  def png(id: Int): Array[Byte] =
    ImageCodec.encodePng(width(id), height(id), (x, y) => rgb(id, x, y))

  /** Deterministic PCM16 mono clips: sample i of clip id is a pure
    * integer formula (range ±4096, well inside int16), so the q58
    * oracle can recompute every signal statistic in SQL while the
    * engine decodes the actual RIFF bytes.
    */
  val nClips = 64
  val clipRate = 8000
  def clipSamples(id: Int): Int = 800 + (id % 7) * 160
  def pcm(id: Int, i: Int): Int = ((31 * i + 17 * id) % 8192) - 4096
  def wav(id: Int): Array[Byte] =
    AudioCodec.encodeWav(clipRate,
      Array.tabulate(clipSamples(id))(i => pcm(id, i).toShort))

  /** Deterministic "videos": GVID containers of PNG frames whose
    * pixels reuse the image formula with the frame index folded into
    * the id — so the q59 oracle recomputes any sampled frame's channel
    * sums in SQL while the engine walks real container bytes and
    * ImageIO-decodes real PNGs.
    */
  val nVideos = 24
  def videoFrames(id: Int): Int = 6 + id % 8
  def frameSeed(id: Int, f: Int): Int = id * 31 + f * 7
  def video(id: Int): Array[Byte] =
    VideoContainer.encode((0 until videoFrames(id)).map { f =>
      val seed = frameSeed(id, f)
      ImageCodec.encodePng(width(id), height(id), (x, y) => rgb(seed, x, y))
    })
}
