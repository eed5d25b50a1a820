package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * All loads go through `spark.read.parquet` so Catalyst gets filter
  * pushdown + column pruning for free; callers `select` early so the
  * parquet scan reads only needed columns (checked via
  * `.explain("formatted")` → ReadSchema).
  */
object Tables {
  /** Per-session memo of loaded testdata relations: every
    * `spark.read.parquet` call runs a one-task footer job (schema
    * inference) plus a driver file listing, and the loaders run on
    * EVERY query construction — a composed entry like q55c paid the
    * footer job 8+ times per execution (r21 JobProfile). The memo
    * returns the same immutable plan per (session, path); the DATA is
    * still scanned from parquet on every execution — only the repeated
    * construction-time footer/listing work is deduped. Testdata is
    * immutable for the life of a run, and values die with their
    * session ([[SessionCache]] sweeps stopped sessions).
    */
  private val loaded =
    new SessionCache[scala.collection.concurrent.TrieMap[String, DataFrame]]()
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    loaded.get(spark,
        _ => scala.collection.concurrent.TrieMap.empty[String, DataFrame])
      .getOrElseUpdate(s"$dir/$name.parquet",
        spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** Round-robin balance a scan whose FILE LAYOUT under-parallelizes
    * it. Parquet can only split at row-group boundaries, so a
    * single-row-group file scans as ONE partition no matter what
    * `spark.sql.files.maxPartitionBytes` says — and every per-row
    * map stage upstream of the first shuffle (minhash/simhash
    * signatures, shingling, pairwise dot products, quality scoring)
    * then runs on one core of the whole cluster.
    *
    * Scale-safety: the repartition engages ONLY when the scan yields
    * fewer splits than `defaultParallelism`. A corpus-scale table has
    * thousands of row groups → condition false → zero-cost no-op; when
    * it does engage the shuffled volume is bounded by
    * (#splits × maxPartitionBytes) ≈ a few hundred MB, not O(corpus).
    * This is the same adaptivity philosophy as AQE, applied to the one
    * axis AQE cannot touch (it can coalesce, never split, a scan).
    */
  private[graft] def balanced(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (scanPartitions(df) < p) df.repartition(p) else df
  }

  /** Scan-partition count of a freshly-loaded table, memoized per
    * (session, parallelism): computing it via `df.rdd` plans the whole
    * query once just to read a number that is a pure function of the
    * file layout and split config — and the loaders run on every query
    * construction, dozens of times per bench sweep. The memo key
    * carries the session id (a stopped session's entry is useless but
    * harmless — values are Ints) and the plan's file listing is
    * re-derived per session anyway on first call.
    */
  private val scanParts =
    scala.collection.concurrent.TrieMap[(String, String), Int]()
  private def scanPartitions(df: DataFrame): Int = {
    val s = df.sparkSession
    val key = (System.identityHashCode(s).toString,
      df.queryExecution.logical.toString + s.sparkContext.defaultParallelism)
    scanParts.getOrElseUpdate(key, df.rdd.getNumPartitions)
  }

  /** documents/embeddings feed compute-heavy per-row pipelines
    * (signatures, pairwise similarity), so their batch loaders balance
    * the scan; the TPC-H tables keep raw scans (their queries are
    * join/agg-shaped — first shuffle lands within a stage anyway, and
    * an unconditional extra exchange would just tax the fast paths).
    * Streaming reads ([[graft.streaming.StreamingJobs]]) are untouched:
    * file-stream batches partition per file and the stateful operators
    * repartition on their grouping keys immediately.
    */
  def documents(s: SparkSession, d: String): DataFrame =
    balanced(load(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame = {
    // Footer-pinned float32×64 contract (memoized; zero jobs) — the
    // events.ts lesson applied to the embedding surface.
    DataContract.assertEmbeddingsContract(s, s"$d/embeddings.parquet")
    balanced(load(s, d, "embeddings"))
  }

  /** `events` with `ts` exposed as a LongType NANOSECOND epoch — the
    * engine-wide contract every downstream consumer (q06–q10, the
    * streaming jobs) is written against. The reference keeps nanosecond
    * epochs as raw integers (Spark timestamps are µs — SURVEY §7.6),
    * and the DuckDB oracle mirrors with `epoch_ns(ts)`.
    *
    * The FILE encoding is the driver's choice and has drifted across
    * rounds (TIMESTAMP(NANOS) int64 → TIMESTAMP(MICROS) NTZ), so the
    * load dispatches on the footer annotation
    * ([[DataContract.eventsTsUnit]] — loud on anything else):
    *   - MICROS: read as the timestamp it is, derive nanos as
    *     `unix_micros * 1000` (exact — sub-µs digits don't exist).
    *   - NANOS: the raw int64 IS the contract value; pass through.
    * No session conf is touched (the former `nanosAsLong` toggle was
    * both a shared-session TOCTOU hazard and inapplicable to
    * MICROS-annotated data).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    DataContract.eventsTsUnit(s, s"$d/events.parquet") match {
      case TimeUnit.NANOS =>
        // Explicit LongType schema: the parquet reader hands the
        // annotated int64 through raw — no legacy session flag needed.
        s.read.schema(eventsSchemaTsNanos).parquet(s"$d/events.parquet")
      case _ /* MICROS */ =>
        tsMicrosToNanos(s, load(s, d, "events"))
    }
  }

  import org.apache.spark.sql.types._

  /** events schema under the legacy TIMESTAMP(NANOS) int64 encoding
    * (`ts` read raw as LongType nanos — already the contract value).
    */
  private[graft] val eventsSchemaTsNanos: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  /** events schema under the TIMESTAMP(MICROS, NTZ) encoding (round
    * 10+ driver output); [[tsMicrosToNanos]] derives the nanos column.
    */
  private[graft] val eventsSchemaTsMicros: StructType = StructType(
    eventsSchemaTsNanos.fields.map {
      case StructField("ts", _, n, m) => StructField("ts", TimestampNTZType, n, m)
      case f => f
    })

  /** Rewrites a µs-timestamp `ts` column to the LongType-nanos
    * contract: `unix_micros * 1000`, exact because sub-µs digits don't
    * exist in a MICROS file (the oracle's `epoch_ns` carries the same
    * trailing zeros).
    */
  private[graft] def tsMicrosToNanos(s: SparkSession, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, unix_micros}
    // NTZ→timestamp cast reads wall time in the session zone; the
    // oracle (DuckDB epoch_ns) treats the same wall time as UTC.
    require(s.conf.get("spark.sql.session.timeZone", "") == "UTC",
      "events loader requires spark.sql.session.timeZone=UTC (the " +
        "NTZ→epoch conversion and the DuckDB oracle both assume it)")
    df.withColumn("ts",
      unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
  }
}
