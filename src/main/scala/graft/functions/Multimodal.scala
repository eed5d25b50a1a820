package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode/feature steps run as batched
  * partition-level functions (the Scala analog of `mapInPandas`).
  *
  * The decode itself is STUBBED (no image/audio libs in this
  * container): `decodeStub` derives deterministic fake metadata from
  * the bytes. The Spark-side contract — schema, binary column,
  * partition-batched UDF shape, no driver collection — is real and is
  * what matters at 100 TB (payload bytes never leave the executor).
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

  /** STUB decoder: a real implementation would parse the media header
    * here (e.g. JPEG SOF for width/height). The fake is a pure function
    * of the payload so tests and the oracle can reproduce it.
    */
  private def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val n = bytes.length
    (n % 640, n % 480)
  }

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Partition-batched metadata extraction over (id, binary) rows. Runs
    * as mapPartitions so per-batch setup (a real decoder would init a
    * codec once per partition, not per row) is amortized — the
    * `mapInPandas` batching contract.
    */
  def extractMeta(docs: DataFrame, idCol: String, binCol: String): DataFrame = {
    val in = docs.select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
    val enc = RowEncoder.encoderFor(metaSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h) = decodeStub(bytes)
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

  /** STUB feature extractor: k pseudo-embedding components, component j
    * = md5-prefix hash of (payload ++ "_j") scaled into [0,1). A real
    * implementation would run a codec + model forward pass here; the
    * fake keeps the binary → fixed-dim-vector contract, is a pure
    * function of the payload (test/oracle-reproducible), and the
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

  /** STUB byte-domain resize: nearest-neighbor resample of the payload
    * to `outLen` bytes (a real implementation: image rescale in the
    * decoder). Pure, shape-fixed, executor-local.
    */
  def resizeStub(bytes: Array[Byte], outLen: Int): Array[Byte] =
    if (bytes.isEmpty) Array.emptyByteArray
    else Array.tabulate(outLen)(i =>
      bytes(((i.toLong * bytes.length) / outLen).toInt))

  /** STUB frame sampler: `n` fixed-length windows at evenly spaced
    * offsets (a real implementation: video keyframe decode). Windows
    * are clamped to the payload, so short payloads yield short frames.
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
    * the executor.
    */
  def extractFeatures(docs: DataFrame, idCol: String, binCol: String,
      k: Int = 8): DataFrame = {
    val in = docs.select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
    val enc = RowEncoder.encoderFor(featureSchema(k))
    in.mapPartitions { rows =>
      rows.map { r =>
        val fs = featureStub(r.getAs[Array[Byte]](1), k)
        Row.fromSeq(r.getLong(0) +: fs.toSeq)
      }
    }(enc)
  }

  private val transformSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("resized", BinaryType, nullable = false),
    StructField("frames", ArrayType(BinaryType, containsNull = false),
      nullable = false)))

  /** Partition-batched resize + frame-sample over (id, binary) rows —
    * the decode-transform stage of a media pipeline, stubbed but with
    * the real distributed shape (per-partition codec init point, typed
    * binary outputs, no driver collection).
    */
  def transformMedia(docs: DataFrame, idCol: String, binCol: String,
      outLen: Int = 64, nFrames: Int = 4, frameLen: Int = 16): DataFrame = {
    val in = docs.select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
    val enc = RowEncoder.encoderFor(transformSchema)
    in.mapPartitions { rows =>
      // A real decoder would be initialized HERE, once per partition.
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.getLong(0), resizeStub(bytes, outLen),
          frameSampleStub(bytes, nFrames, frameLen).toSeq)
      }
    }(enc)
  }

  /** Driver-gated feature query: 8 stub features per document. */
  def q26MultimodalFeatures(s: SparkSession, dir: String): DataFrame =
    extractFeatures(
      graft.Tables.documents(s, dir).select(col("doc_id"),
        col("text").cast("binary").as("payload")),
      "doc_id", "payload")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))
}
