package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference engine is a streaming
  * ETL (`indexer/src/main.rs:243-259` consumes an ordered block
  * stream); this module carries the same readStream → transform →
  * sink shape over the testdata events table.
  */
object StreamingJobs {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanosecond epoch, read raw (SURVEY §7.6)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  /** Hourly tumbling-window counts per event type, computed through a
    * real streaming query (file source → event-time window → memory
    * sink), drained synchronously. Window start is emitted as µs epoch
    * for oracle parity.
    */
  def hourlyEventCounts(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val name = "hourly_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // The file stream source wants a directory or a glob; a bare file
    // path is rejected. The [t] glob makes it a pattern that matches
    // exactly the events file.
    val stream = s.readStream.schema(eventsSchema)
      .option("basePath", dir)
      .parquet(s"$dir/events.parque[t]")
      .withColumn("ev_ts", timestamp_micros(expr("ts div 1000")))
    val agg = stream
      .withWatermark("ev_ts", "1 hour")
      .groupBy(window(col("ev_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    s.table(name)
      .select(unix_micros(col("window.start")).as("hour_us"),
        col("event_type"), col("n_events"))
      .orderBy(col("hour_us"), col("event_type"))
      // materialize before the memory sink's table goes stale
      .localCheckpoint(true)
  }

  /** SESSIONIZATION through a real streaming query: `session_window`
    * with a 30-minute inactivity gap, keyed per user — the dynamic-
    * window state operator (tumbling q23 and dedup q35 are the other
    * two streaming state shapes). Emitted as µs epochs for oracle
    * parity; the DuckDB twin is the classic gaps-and-islands window
    * construction.
    */
  def userSessions(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val name = "sessions_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(eventsSchema)
      .option("basePath", dir)
      .parquet(s"$dir/events.parque[t]")
      .withColumn("ev_ts", timestamp_micros(expr("ts div 1000")))
    val agg = stream
      .withWatermark("ev_ts", "1 hour")
      .groupBy(session_window(col("ev_ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_events"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    s.table(name)
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))
      .localCheckpoint(true)
  }

  /** Streaming DEDUPLICATION: distinct users per event type computed
    * through a real streaming query with `dropDuplicates` keyed state —
    * the streaming sibling of the batch exact-dedup operator. The dedup
    * state is keyed on (user_id, event_type); at scale the key space is
    * the distinct-user set, which the state store shards across
    * executors, and a production deployment bounds it with
    * `dropDuplicatesWithinWatermark` once the dedup horizon is an
    * event-time window rather than all-time.
    */
  def distinctUsersPerType(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val name = "dedup_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(eventsSchema)
      .option("basePath", dir)
      .parquet(s"$dir/events.parque[t]")
    val agg = stream
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_users"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    s.table(name)
      .orderBy(col("event_type"))
      .localCheckpoint(true)
  }
}
