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
}
