package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Batch analytic query surface (SURVEY.md §2.5/§2.6/§2.3 operator
  * classes re-expressed over the driver testdata).
  *
  * Determinism contract with the DuckDB oracle: every floating
  * aggregate is computed as an EXACT decimal sum (each double input is
  * cast to DECIMAL first, so summation order cannot change the result),
  * then cast back to double and rounded. Both engines produce
  * bit-identical values that way.
  */
object Analytics {

  /** Exact, order-insensitive sum of a double column: cast each element
    * to DECIMAL(18,4) (inputs are money/quantity-scale values with ≤2
    * decimals), sum exactly, emit rounded double.
    */
  private def dsum(c: Column): Column =
    round(sum(c.cast("decimal(18,4)")).cast("double"), 2)

  private def dsumExpr(c: Column): Column = // for products of decimals
    round(sum(c).cast("double"), 2)

  /** A1-class aggregation (TPC-H Q1 shape): pricing summary per flag/status. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumExpr(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** J-class multi-join (TPC-H Q5 shape): revenue per nation. The dims
    * (region, nation, customer) are broadcast — at 100 TB the fact
    * tables shuffle once on the join key and every dim stays local.
    */
  def q02RevenueByNation(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"),
      col("l_extendedprice"), col("l_discount"))
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsumExpr(col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** Semi-join: orders having at least one line shipped after the order
    * date, counted per priority (EXISTS — Spark left_semi).
    */
  def q03PriorityCount(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
    o.join(li, o("o_orderkey") === li("l_orderkey") &&
        li("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Anti-join (J6-class, `transactions.rs:65-75` analog): parts that
    * never shipped in bulk (no lineitem with quantity > 45).
    */
  def q04CustomersWithoutOrders(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_name"))
    val li = Tables.lineitem(s, dir).select(col("l_partkey"), col("l_quantity"))
      .filter(col("l_quantity") > 45)
    p.join(li, col("p_partkey") === col("l_partkey"), "left_anti")
      .orderBy(col("p_partkey"))
  }

  /** Window ranking (A7-class, `row_number` over partition): top-3
    * lineitems per supplier by extended price, deterministic tiebreak.
    */
  def q05TopPerSupplier(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** Last-writer-wins per key (A5-class, accounts/access_keys lifecycle
    * reduction `accounts.rs:34-83`): latest event per user by (ts,
    * event_id) — the same max_by/struct-ordering pattern the mutable
    * entity registries use.
    */
  def q06LastEventPerUser(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        round(col("value").cast("decimal(18,4)").cast("double"), 2).as("last_value"))
      .orderBy(col("user_id"))
  }

  /** Daily tumbling bucket on raw nanosecond epochs (circulating-supply
    * day bucketing, `circulating-supply/src/main.rs:112-114`): ts −
    * ts % DAY, all arithmetic on the raw int64 nanos.
    */
  def q07DailyEventStats(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val day = lit(86400000000000L)
    e.withColumn("day_ns", (col("ts") - (col("ts") % day)).cast("long"))
      .groupBy(col("day_ns"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy(col("day_ns"), col("event_type"))
  }

  /** As-of lookup (A2-class, `blocks.rs:42-52`): per user, the latest
    * event at-or-before a fixed cutoff timestamp.
    */
  def q08AsOfEvent(s: SparkSession, dir: String): DataFrame = {
    // cutoff = 2024-01-03T00:00:00Z; filter on µs (see asof_us note)
    val e = Tables.events(s, dir)
      .filter(expr("ts div 1000") <= lit(1704240000000000L))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"),
        // µs, not ns: DuckDB's parquet reader may truncate TIMESTAMP_NS
        // to µs depending on version, so the oracle-stable contract is
        // microseconds (floor) on both sides.
        expr("ts div 1000").cast("long").as("asof_us"),
        col("event_type").as("asof_type"))
      .orderBy(col("user_id"))
  }

  /** Conditional aggregation (A3-class, circulating-supply formula
    * `main.rs:160-236`): per event type — total value, row count, count
    * of high-value rows, and the "circulating" style derived measure.
    */
  def q09ConditionalAgg(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.groupBy(col("event_type"))
      .agg(
        dsum(col("value")).as("total_value"),
        count(lit(1)).as("n_rows"),
        count(when(col("value") > 100.0, 1)).as("n_high"),
        dsum(when(col("value") > 100.0, col("value")).otherwise(lit(0.0)))
          .as("high_value"))
      .withColumn("low_value",
        round((col("total_value").cast("decimal(18,2)") -
          col("high_value").cast("decimal(18,2)")).cast("double"), 2))
      .orderBy(col("event_type"))
  }

  /** JSON extraction (P5-class permissive JSON parse,
    * `serializers.rs:89-92`): pull `k` out of the props JSON string,
    * bucket, aggregate. get_json_object returns NULL on malformed input
    * — same decode-or-null semantics as the reference.
    */
  def q10JsonProps(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("k_bucket", (col("k") % 10).cast("long"))
      .groupBy(col("k_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("k_bucket"))
  }

  /** BUCKETED CO-LOCATED JOIN — the one 100 TB join strategy the
    * surface didn't yet demonstrate: both fact tables written ONCE as
    * 16-bucket parquet tables hashed on the join key, after which
    * every orderkey-join runs with ZERO shuffle of either side —
    * Spark's scan reports the bucket hash-partitioning, the
    * SortMergeJoin's distribution requirement is already met, and no
    * Exchange appears before the join (the spec pins that plan). At
    * 100 TB this is the difference between shuffling the fact table
    * on every join and shuffling it once at ingest: the same
    * co-location serves every downstream orderkey join and
    * aggregation. The bucketed mirror is staged write-once under the
    * external stage root keyed by the input's identity (the q64b
    * staging convention) and re-attached to each session's catalog as
    * an external bucketed table. Oracle: the plain inequality-free join +
    * aggregate over the original parquet — co-location must not
    * change a single row.
    */
  def q74BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val (l, o) = bucketedJoinSides(s, dir)
    l.hint("merge").join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(dsumExpr(col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  /** The two bucketed sides, pruned to the entry's columns — split out
    * so the spec can assert the bare join's no-Exchange plan.
    */
  private[graft] def bucketedJoinSides(s: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val suf = ensureBucketedMirror(s, dir)
    (s.table(s"graft_lineitem_b_$suf").select(col("l_orderkey"),
      col("l_extendedprice"), col("l_discount")),
      s.table(s"graft_orders_b_$suf").select(col("o_orderkey"),
        col("o_orderpriority")))
  }

  /** SELECTIVE DIMENSION PROBE (q78) — the TPC-H-Q17-shaped join whose
    * 100 TB lever is RUNTIME row-level filtering: the part side is cut
    * to one brand (~1% of the dimension) before the join, and Spark's
    * runtime bloom-filter optimization can inject a
    * `bloom_filter_might_contain(p_partkey)` predicate INTO THE FACT
    * SCAN, so lineitem rows for the 99% of parts that cannot match are
    * dropped at the scan instead of surviving to the join exchange.
    * The join is deliberately UNHINTED: an explicit broadcast() hint
    * suppresses InjectRuntimeFilter (verified), while the free
    * optimizer still picks the broadcast join at fixture sizes and
    * keeps the bloom lever available at the sizes where it matters
    * (the spec pins the injected `might_contain` under sf-scaled
    * thresholds AND result-equality with the default plan; the shared
    * oracle proves semantics are config-independent). The only fact
    * shuffle is the final 1-group aggregate's.
    */
  def q78SelectiveProbe(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#23")
      .select(col("p_partkey"), col("p_brand"))
    val l = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_quantity"))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(dsum(col("l_extendedprice")).as("sum_price"),
        dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }

  /** Write-once bucketed mirrors of orders/lineitem (16 buckets on the
    * orderkey), registered in this session's catalog as EXTERNAL
    * tables under [[PipelineQueries.stageRoot]].
    *
    * Replay idempotency is keyed on the FILESYSTEM, not the per-JVM
    * catalog (the r14 defect: a managed-table location under the
    * warehouse dir outlives the in-memory catalog, so every JVM after
    * the first died with LOCATION_ALREADY_EXISTS). The contract here
    * is `stagedDisposition`'s marker-after-data pattern:
    *   - marker present  → the stage is complete; re-attach it to this
    *     session's catalog with CREATE TABLE … CLUSTERED BY … LOCATION
    *     (bucket metadata lives in the DDL, the bucket-id file naming
    *     is already on disk), touching zero data.
    *   - location without marker → a torn write from a crashed JVM;
    *     the mirror is a derived cache, so delete and rebuild.
    * The identity tag (dir + lineitem file length + mtime) is
    * recomputed on EVERY call — one getFileStatus — so a regenerated
    * corpus or a different dir in the same session can never be served
    * a stale mirror.
    */
  private def ensureBucketedMirror(s: SparkSession, dir: String): String = {
    val hconf = s.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(s"$dir/lineitem.parquet")
    val fs = src.getFileSystem(hconf)
    val st = fs.getFileStatus(src)
    val suf = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir|${st.getLen}|${st.getModificationTime}|v2"
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    // Build + publish + attach via the shared bucketed write-once
    // protocol (PipelineQueries.writeOnceBucketedStage): UUID temp
    // table + dir, marker RE-CHECKED before the delete/rename so a
    // racing JVM can never delete a live marker-committed stage,
    // rename into place, marker after data, CLUSTERED BY re-attach.
    def ensure(name: String, df: => DataFrame, key: String): Unit =
      PipelineQueries.writeOnceBucketedStage(s,
        s"${PipelineQueries.stageRoot}/bucketed/$name", name, 16,
        Seq(key), df)
    ensure(s"graft_orders_b_$suf", Tables.orders(s, dir), "o_orderkey")
    ensure(s"graft_lineitem_b_$suf", Tables.lineitem(s, dir), "l_orderkey")
    suf
  }
}
