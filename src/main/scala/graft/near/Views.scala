package graft.near

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The aggregated query surface: the `aggregated__lockups` view
  * (SURVEY J4/J5), the block lookups (A1/A2), and the daily
  * circulating-supply computation (A3).
  */
object Views {

  private val D20 = DecimalType(20, 0)
  private val D38 = DecimalType(38, 0)

  /** aggregated__lockups (2021-08-04-151515.../up.sql:22-31):
    * accounts ⟕ receipts ⟕ blocks ⟕ receipts ⟕ blocks on lockup
    * accounts. The probe sides (receipts of the handful of lockup
    * accounts) are tiny relative to blocks at scale, but all four
    * joins key on high-cardinality hashes — the lockup filter runs
    * FIRST so only `%.lockup.near` accounts shuffle; Catalyst then
    * broadcast-joins the filtered side.
    */
  def aggregatedLockups(accounts: DataFrame, receipts: DataFrame,
      blocks: DataFrame): DataFrame = {
    val lockups = accounts.filter(col("account_id").endsWith(".lockup.near"))
    // receipts/blocks are the biggest warehouse tables — never
    // broadcast them whole. Semi-join each down to the handful of
    // lockup lifecycle receipt ids first (the tiny id set broadcasts),
    // then the FILTERED side is small enough to broadcast into the
    // left-outer joins.
    def lifecycleReceipts(idCol: String, outId: String, outBlock: String) =
      receipts
        .join(broadcast(lockups.select(col(idCol).as("want"))
          .filter(col("want").isNotNull).distinct()),
          col("receipt_id") === col("want"), "left_semi")
        .select(col("receipt_id").as(outId),
          col("included_in_block_hash").as(outBlock))
    val rStart = lifecycleReceipts("created_by_receipt_id", "rs_id", "rs_block")
    val rEnd = lifecycleReceipts("deleted_by_receipt_id", "re_id", "re_block")
    def blockHeights(blockCol: String, outHash: String, outHeight: String,
        src: DataFrame) =
      blocks
        .join(broadcast(src.select(col(blockCol).as("want")).distinct()),
          col("block_hash") === col("want"), "left_semi")
        .select(col("block_hash").as(outHash), col("block_height").as(outHeight))
    val bStart = blockHeights("rs_block", "bs_hash", "creation_block_height", rStart)
    val bEnd = blockHeights("re_block", "be_hash", "deletion_block_height", rEnd)
    lockups
      .join(broadcast(rStart), col("created_by_receipt_id") === col("rs_id"), "left")
      .join(broadcast(bStart), col("rs_block") === col("bs_hash"), "left")
      .join(broadcast(rEnd), col("deleted_by_receipt_id") === col("re_id"), "left")
      .join(broadcast(bEnd), col("re_block") === col("be_hash"), "left")
      .select(col("account_id"), col("creation_block_height"),
        col("deletion_block_height"))
  }

  /** J5: lockup accounts live at `blockHeight`
    * (accounts.rs:202-252): NULL-tolerant containment of the height in
    * the [creation, deletion] interval.
    */
  def lockupAccountIdsAtHeight(lockupsView: DataFrame,
      blockHeight: Long): DataFrame =
    lockupsView.filter(
        (col("creation_block_height").isNull ||
          col("creation_block_height") <= blockHeight) &&
        (col("deletion_block_height").isNull ||
          col("deletion_block_height") >= blockHeight))
      .select(col("account_id"))

  /** A1: latest block height (blocks.rs:29-40). */
  def latestBlockHeight(blocks: DataFrame): DataFrame =
    blocks.agg(max(col("block_height")).as("latest_block_height"))

  /** A2: latest block at-or-before a nanosecond timestamp
    * (blocks.rs:42-52). The reference's `ORDER BY block_timestamp DESC
    * LIMIT 1` is nondeterministic across same-height forks; we break
    * ties by height desc then hash asc so replays are stable.
    */
  def latestBlockBeforeTimestamp(blocks: DataFrame, tsNanos: BigDecimal): DataFrame =
    blocks.filter(col("block_timestamp") <= lit(tsNanos.bigDecimal).cast(D20))
      .orderBy(col("block_timestamp").desc, col("block_height").desc,
        col("block_hash").asc)
      .limit(1)

  /** A3: circulating supply for one block
    * (circulating-supply/src/main.rs:160-236).
    *
    * The reference walks lockup accounts sequentially over RPC; here
    * the per-lockup state is a DataFrame (produced by the RPC point
    * source S4 in production — stubbed as a table in tests) and the
    * locked-amount math runs distributed as a typed map, so the job
    * scales with lockup count. Sum/count aggregation is a single
    * partial-aggregated `agg`.
    *
    * @param block       one-row DataFrame (latestBlockBeforeTimestamp)
    * @param lockupsView aggregatedLockups output
    * @param states      lockup contract states at the block height, one
    *                    row per account (Lockup.State)
    * @param foundationLockedTokens Σ balances of the foundation
    *                    accounts [lockup.near, contributors.near]
    *                    (main.rs:208-218) — two RPC point reads
    */
  def circulatingSupply(spark: SparkSession, block: DataFrame,
      lockupsView: DataFrame, states: Dataset[Lockup.State],
      foundationLockedTokens: BigInt): DataFrame = {
    import spark.implicits._
    val b = block.select(col("block_hash"), col("block_height").cast("long"),
      col("block_timestamp").cast("long"), col("total_supply").cast(D38))
      .collect() match {
      case Array(row) => row
      case rows => throw new IllegalStateException(
        s"expected exactly one block row, got ${rows.length}")
    }
    val blockHash = b.getString(0)
    val blockHeight = b.getLong(1)
    val blockTs = b.getLong(2)
    val totalSupply = BigInt(b.getDecimal(3).toBigInteger)

    val liveIds = lockupAccountIdsAtHeight(lockupsView, blockHeight)
    // Per-lockup locked amount: distributed typed map (U256-safe math).
    val locked = states
      .join(broadcast(liveIds), states("accountId") === liveIds("account_id"))
      .drop("account_id").as[Lockup.State]
      .map(s => Lockup.lockedAmount(s, blockTs).toString)
      .toDF("locked")
      .select(col("locked").cast(D38).as("locked"))

    val agg = locked.agg(
      coalesce(sum(col("locked")), lit(0).cast(D38)).as("lockups_locked"),
      count(lit(1)).cast("int").as("total_lockups"),
      count(when(col("locked") > 0, 1)).cast("int").as("unfinished_lockups"))
      .collect()(0)
    val lockupsLocked = BigInt(agg.getDecimal(0).toBigInteger)
    val circulating = totalSupply - foundationLockedTokens - lockupsLocked

    Seq((blockTs.toString, blockHash, circulating.toString,
        totalSupply.toString, agg.getInt(1), agg.getInt(2),
        foundationLockedTokens.toString, lockupsLocked.toString))
      .toDF("ts", "computed_at_block_hash", "circ", "total",
        "total_lockup_contracts_count", "unfinished_lockup_contracts_count",
        "foundation", "lockups")
      .select(
        col("ts").cast(D20).as("computed_at_block_timestamp"),
        col("computed_at_block_hash"),
        col("circ").cast(D38).as("circulating_tokens_supply"),
        col("total").cast(D38).as("total_tokens_supply"),
        col("total_lockup_contracts_count"),
        col("unfinished_lockup_contracts_count"),
        col("foundation").cast(D38).as("foundation_locked_tokens"),
        col("lockups").cast(D38).as("lockups_locked_tokens"))
  }

  /** A3 without pre-built state tables: the lockup states and the
    * foundation balances come from the S4 RPC point source at the
    * block's height (main.rs:160-236 end-to-end).
    */
  def circulatingSupplyViaRpc(spark: SparkSession, block: DataFrame,
      lockupsView: DataFrame, transport: Rpc.Transport): DataFrame = {
    val blockHeight = block.select(col("block_height").cast("long"))
      .collect() match {
      case Array(row) => row.getLong(0)
      case rows => throw new IllegalStateException(
        s"expected exactly one block row, got ${rows.length}")
    }
    val states = Rpc.lockupStates(spark,
      lockupAccountIdsAtHeight(lockupsView, blockHeight), transport,
      blockHeight)
    circulatingSupply(spark, block, lockupsView, states,
      Rpc.foundationLockedTokens(transport, blockHeight))
  }

  /** A3 as a DAILY SERIES (main.rs:60-158 run over history): one
    * supply row per UTC day present in `blocks`, computed at the day's
    * LAST block (ties broken height desc then hash asc — same-height
    * forks share (timestamp, height)).
    *
    * Scale shape: the day pick is one window over blocks partitioned
    * by day (rows per day are bounded — ~70k on mainnet — so no
    * skew risk); the per-day lockup set is a broadcast theta-join of
    * the tiny day table (≤ days-since-genesis rows) against the
    * lockups view; and the U256 locked-amount math runs distributed
    * per (lockup, day) pair — no per-day driver loop, so a
    * years-long backfill is a single job.
    */
  def dailyCirculatingSupply(spark: SparkSession, blocks: DataFrame,
      lockupsView: DataFrame, states: Dataset[Lockup.State],
      foundationLockedTokens: BigInt): DataFrame = {
    import spark.implicits._
    val dayBlk = blocks
      .withColumn("day_ns",
        (col("block_timestamp") - (col("block_timestamp") % lit(86400000000000L)))
          .cast(D20))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("day_ns"))
          .orderBy(col("block_timestamp").desc, col("block_height").desc,
            col("block_hash").asc)))
      .filter(col("rn") === 1)
      .select(col("day_ns"), col("block_hash"),
        col("block_height").cast("long").as("day_block_height"),
        col("block_timestamp"), col("total_supply"))

    val live = lockupsView.join(
        broadcast(dayBlk.select(col("day_ns").cast("long").as("day"),
          col("day_block_height"),
          col("block_timestamp").cast("long").as("bts"))),
        (col("creation_block_height").isNull ||
          col("creation_block_height") <= col("day_block_height")) &&
        (col("deletion_block_height").isNull ||
          col("deletion_block_height") >= col("day_block_height")))
      .select(col("day"), col("account_id"), col("bts"))

    val locked = states
      .join(live, states("accountId") === live("account_id"))
      .select(col("day"), col("bts"),
        struct(states.columns.toIndexedSeq.map(states(_)): _*).as("s"))
      .as[(Long, Long, Lockup.State)]
      .map { case (day, bts, s) => (day, Lockup.lockedAmount(s, bts).toString) }
      .toDF("day", "locked")
      .select(col("day"), col("locked").cast(D38).as("locked"))

    val agg = locked.groupBy(col("day"))
      .agg(sum(col("locked")).cast(D38).as("lockups_locked"),
        count(lit(1)).cast("int").as("total_lockups"),
        count(when(col("locked") > 0, 1)).cast("int").as("unfinished_lockups"))

    val f = lit(new java.math.BigDecimal(foundationLockedTokens.bigInteger))
      .cast(D38)
    dayBlk.join(agg, dayBlk("day_ns").cast("long") === agg("day"), "left")
      .select(
        col("block_timestamp").cast(D20).as("computed_at_block_timestamp"),
        col("block_hash").as("computed_at_block_hash"),
        (col("total_supply").cast(D38) - f -
          coalesce(col("lockups_locked"), lit(0).cast(D38))).cast(D38)
          .as("circulating_tokens_supply"),
        col("total_supply").cast(D38).as("total_tokens_supply"),
        coalesce(col("total_lockups"), lit(0)).cast("int")
          .as("total_lockup_contracts_count"),
        coalesce(col("unfinished_lockups"), lit(0)).cast("int")
          .as("unfinished_lockup_contracts_count"),
        f.as("foundation_locked_tokens"),
        coalesce(col("lockups_locked"), lit(0).cast(D38)).cast(D38)
          .as("lockups_locked_tokens"))
      .orderBy(col("computed_at_block_timestamp"))
  }

  /** Nanosecond start-of-day bucketing (main.rs:112-114):
    * `ts − ts % DAY` on raw nanos (NOT TimestampType — µs only).
    */
  def startOfDayNs(tsNanos: BigInt): BigInt = {
    val day = BigInt(86400L) * 1000000000L
    tsNanos - (tsNanos % day)
  }

  /** A4: skip-if-precomputed check
    * (aggregated/circulating_supply.rs:40-61) — point lookup by the
    * computed-at timestamp.
    */
  def supplyAlreadyComputed(aggregatedSupply: DataFrame,
      blockTsNanos: BigInt): Boolean =
    !aggregatedSupply.filter(col("computed_at_block_timestamp") ===
        lit(new java.math.BigDecimal(blockTsNanos.bigInteger)).cast(D20))
      .limit(1).isEmpty

  /** The daily job body (§3.2, main.rs:107-158): resolve the last
    * block before the day boundary (A2), skip if precomputed (A4),
    * else compute (A3). Returns None when already computed or no
    * block exists yet.
    */
  def computeDailyIfMissing(spark: SparkSession, blocks: DataFrame,
      lockupsView: DataFrame, aggregatedSupply: Option[DataFrame],
      states: Dataset[Lockup.State], foundationLockedTokens: BigInt,
      requestTsNanos: BigInt): Option[DataFrame] = {
    val dayStart = startOfDayNs(requestTsNanos)
    val block = latestBlockBeforeTimestamp(blocks, BigDecimal(dayStart))
    block.select(col("block_timestamp").cast("long")).collect() match {
      case Array(row) =>
        val ts = BigInt(row.getLong(0))
        val done = aggregatedSupply.exists(supplyAlreadyComputed(_, ts))
        if (done) None
        else Some(circulatingSupply(spark, block, lockupsView, states,
          foundationLockedTokens))
      case _ => None // no blocks loaded before the day boundary yet
    }
  }
}
