package graft.near

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Genesis one-shot load (SURVEY S3, genesis.rs:43-132): seed
  * `accounts` and `access_keys` from the genesis records. The
  * reference streams the file and chunks inserts by 5,000 to bound
  * memory; in Spark the records explode into a distributed DataFrame
  * and partitioning does the bounding (§4 "Genesis memory control"),
  * with the ON-CONFLICT JdbcSink absorbing replays.
  *
  * Record shapes (public NEAR genesis layout):
  *   {"Account":   {"account_id": "...", "account": {...}}}
  *   {"AccessKey": {"account_id": "...", "public_key": "...",
  *                  "access_key": {"nonce":…, "permission": "FullAccess"
  *                                 | {"FunctionCall": {...}}}}}
  * All other record kinds are ignored (genesis.rs:94-113).
  */
object Genesis {

  private val D20 = DecimalType(20, 0)

  /** Parse a whole genesis file. Fine up to a few GB on one multiLine
    * read; for larger files use [[loadStreamed]] — the >memory route.
    */
  def load(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val g = spark.read.option("multiLine", "true").json(path)
    val height = g.select(col("genesis_height")).collect()(0).getLong(0)
    val records = g.select(explode(col("records")).as("r"))
    (accountsFromRecords(records, height),
      accessKeysFromRecords(records, height))
  }

  /** The multi-GB route (genesis.rs:43-132 streams the file for the
    * same reason): a single pass with Jackson's streaming parser —
    * O(one record) driver memory — splits `records` into a JSONL file,
    * which Spark then reads line-splittable and DISTRIBUTED (a
    * multiLine JSON document is one unsplittable task; JSONL shards by
    * `maxPartitionBytes`). Returns the same (accounts, access_keys)
    * pair as [[load]].
    */
  def loadStreamed(spark: SparkSession, genesisPath: String,
      jsonlPath: String): (DataFrame, DataFrame) = {
    val height = splitRecordsToJsonl(spark, genesisPath, jsonlPath)
    loadJsonl(spark, jsonlPath, height)
  }

  /** Seed tables from an already-split records JSONL (one record object
    * per line).
    */
  def loadJsonl(spark: SparkSession, jsonlPath: String,
      genesisHeight: Long): (DataFrame, DataFrame) = {
    val records = spark.read.json(jsonlPath)
      .select(struct(col("*")).as("r"))
    (accountsFromRecords(records, genesisHeight),
      accessKeysFromRecords(records, genesisHeight))
  }

  /** Stream the genesis JSON once (token-level, never materializing the
    * records array), writing each record as a JSONL line; returns
    * `genesis_height`. Works on any Hadoop filesystem.
    */
  def splitRecordsToJsonl(spark: SparkSession, genesisPath: String,
      jsonlPath: String): Long = {
    import com.fasterxml.jackson.core.JsonToken
    val conf = spark.sparkContext.hadoopConfiguration
    val inPath = new org.apache.hadoop.fs.Path(genesisPath)
    val outPath = new org.apache.hadoop.fs.Path(jsonlPath)
    val in = inPath.getFileSystem(conf).open(inPath)
    val out = new java.io.PrintWriter(new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(
        outPath.getFileSystem(conf).create(outPath, true), "UTF-8")))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val parser = mapper.getFactory.createParser(in: java.io.InputStream)
    var height = -1L
    try {
      while (parser.nextToken() != null) {
        if (parser.currentToken() == JsonToken.FIELD_NAME &&
            parser.currentName() != null) {
          parser.currentName() match {
            case "genesis_height" =>
              parser.nextToken()
              height = parser.getLongValue
            case "records" =>
              require(parser.nextToken() == JsonToken.START_ARRAY,
                "genesis `records` must be an array")
              while (parser.nextToken() != JsonToken.END_ARRAY)
                out.println(mapper.readTree[
                  com.fasterxml.jackson.databind.JsonNode](parser).toString)
            case _ =>
              parser.nextToken()
              parser.skipChildren() // no-op for scalars
          }
        }
      }
    } finally { parser.close(); out.close() }
    require(height >= 0, s"no genesis_height in $genesisPath")
    height
  }

  /** accounts seed rows (accounts.rs Account::new_from_genesis): no
    * creating receipt, alive, updated at genesis height.
    */
  def accountsFromRecords(records: DataFrame, genesisHeight: Long): DataFrame =
    records.filter(col("r.Account").isNotNull)
      .select(
        col("r.Account.account_id").as("account_id"),
        lit(null).cast("string").as("created_by_receipt_id"),
        lit(null).cast("string").as("deleted_by_receipt_id"),
        lit(genesisHeight).cast(D20).as("last_update_block_height"))

  /** access_keys seed rows (access_keys.rs AccessKey::from_genesis):
    * permission kind FULL_ACCESS for the plain string form,
    * FUNCTION_CALL for the object form.
    */
  def accessKeysFromRecords(records: DataFrame, genesisHeight: Long): DataFrame = {
    // `permission` infers as StringType ("FullAccess" / mixed) or a
    // struct with a FunctionCall field (homogeneous files) — branch on
    // the inferred schema.
    val permPath = "r.AccessKey.access_key.permission"
    val permKind = records
      .select(col(permPath)).schema.head.dataType match {
      case org.apache.spark.sql.types.StringType =>
        when(col(permPath).contains("FunctionCall"), "FUNCTION_CALL")
          .otherwise("FULL_ACCESS")
      case s: org.apache.spark.sql.types.StructType
          if s.fieldNames.contains("FunctionCall") =>
        when(col(s"$permPath.FunctionCall").isNotNull, "FUNCTION_CALL")
          .otherwise("FULL_ACCESS")
      case _ => lit("FULL_ACCESS")
    }
    records.filter(col("r.AccessKey").isNotNull)
      .select(
        col("r.AccessKey.public_key").as("public_key"),
        col("r.AccessKey.account_id").as("account_id"),
        lit(null).cast("string").as("created_by_receipt_id"),
        lit(null).cast("string").as("deleted_by_receipt_id"),
        permKind.as("permission_kind"),
        lit(genesisHeight).cast(D20).as("last_update_block_height"))
  }
}
