package graft

import java.math.BigInteger
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.near.{Fixtures, Ingest, Lockup, Views}

/** Golden tests for the lockup math (lockup.rs:104-196), the
  * aggregated__lockups view (J4/J5), the block lookups (A1/A2), and
  * the circulating-supply job (A3).
  */
class NearSupplySpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val tables: Map[String, DataFrame] =
    Ingest.allTables(Ingest.blocksFromJson(spark, Fixtures.chain).toDF())
      .map { case (k, v) => k -> v.cache() }

  private def state(
      amount: String = "1000000",
      withdrawn: String = "0",
      lockupDuration: Long = 0L,
      releaseDuration: Option[Long] = None,
      lockupTimestamp: Option[Long] = None,
      transfersTimestamp: Long = 1000L,
      vestingType: String = Lockup.VestingNone,
      vs: Option[(Long, Long, Long)] = None,
      terminatingUnvested: Option[String] = None) =
    Lockup.State("x.lockup.near", "unknown-hash", amount, withdrawn,
      lockupDuration, releaseDuration, lockupTimestamp, transfersTimestamp,
      vestingType, vs.map(_._1), vs.map(_._2), vs.map(_._3),
      terminatingUnvested)

  test("lockup math: fully locked before lockup timestamp") {
    // lockupTs = max(1000 + 500, 2000) = 2000 > blockTs 1500
    val s = state(lockupDuration = 500L, lockupTimestamp = Some(2000L),
      withdrawn = "100")
    assert(Lockup.lockedAmount(s, 1500L, hasBug = false) ==
      new BigInteger("999900"))
  }

  test("lockup math: linear release midpoint and completion") {
    // lockupTs = 1000; release over 1000 ns from 1000 → at 1500 half left
    val s = state(releaseDuration = Some(1000L))
    assert(Lockup.lockedAmount(s, 1500L, hasBug = false) ==
      new BigInteger("500000"))
    assert(Lockup.lockedAmount(s, 2000L, hasBug = false) == BigInteger.ZERO)
    // no release duration ⇒ nothing unreleased once lockupTs passed
    assert(Lockup.lockedAmount(state(), 1001L, hasBug = false) ==
      BigInteger.ZERO)
  }

  test("lockup math: the start-date bug changes the release origin") {
    // lockup_timestamp 2000 > transfers 1000; release 1000 ns.
    // Fixed: start=2000, at 2500 → 500/1000 left. Buggy: start=1000,
    // end=2000 ≤ 2500 → everything released.
    val s = state(releaseDuration = Some(1000L), lockupTimestamp = Some(2000L))
    assert(Lockup.lockedAmount(s, 2500L, hasBug = false) ==
      new BigInteger("500000"))
    assert(Lockup.lockedAmount(s, 2500L, hasBug = true) == BigInteger.ZERO)
  }

  test("lockup math: termination withdrawal saturates, vesting floor wins") {
    // released fully (0 unreleased) but vesting says 400000 unvested
    val s = state(releaseDuration = Some(1000L),
      vestingType = Lockup.VestingSchedule, vs = Some((0L, 0L, 10000L)))
    // at blockTs 6000: unreleased 0; unvested = 1000000×4000/10000
    assert(Lockup.lockedAmount(s, 6000L, hasBug = false) ==
      new BigInteger("400000"))
    // before cliff everything unvested
    val s2 = state(vestingType = Lockup.VestingSchedule,
      vs = Some((5000L, 8000L, 10000L)))
    assert(Lockup.lockedAmount(s2, 6000L, hasBug = false) ==
      new BigInteger("1000000"))
    // terminating: explicit unvested amount
    val s3 = state(vestingType = Lockup.VestingTerminating,
      terminatingUnvested = Some("123456"))
    assert(Lockup.lockedAmount(s3, 6000L, hasBug = false) ==
      new BigInteger("123456"))
  }

  test("lockup math: u128-scale amounts need >128-bit intermediates") {
    val nearMax = "340282366920938463463374607431768211455" // u128::MAX
    val s = state(amount = nearMax, releaseDuration = Some(1000000L))
    val got = Lockup.lockedAmount(s, 1000L + 300000L, hasBug = false)
    val expected = new BigInteger(nearMax)
      .multiply(BigInteger.valueOf(700000L))
      .divide(BigInteger.valueOf(1000000L))
    assert(got == expected)
  }

  test("lockup math: buggy code hash whitelist") {
    assert(Lockup.isBuggy("3kVY9qcVRoW3B5498SMX6R3rtSLiCdmBzKs7zcnzDJ7Q"))
    assert(!Lockup.isBuggy("4Pfw2RU6e35dUsHQQoFYfwX8KFFvSRNwMSNLXuSFHXrC"))
    assert(!Lockup.isBuggy("anything-else"))
  }

  test("aggregated__lockups view: creation height from receipt's block") {
    val v = Views.aggregatedLockups(tables("accounts"), tables("receipts"),
      tables("blocks")).collect()
    assert(v.length == 1)
    val r = v(0)
    assert(r.getAs[String]("account_id") == "fund.lockup.near")
    assert(r.getAs[java.math.BigDecimal]("creation_block_height").intValue == 102)
    assert(r.getAs[Any]("deletion_block_height") == null)
  }

  test("lockup liveness interval filter (J5)") {
    val v = Views.aggregatedLockups(tables("accounts"), tables("receipts"),
      tables("blocks"))
    assert(Views.lockupAccountIdsAtHeight(v, 102L).count() == 1)
    assert(Views.lockupAccountIdsAtHeight(v, 103L).count() == 1) // no deletion
    assert(Views.lockupAccountIdsAtHeight(v, 101L).count() == 0) // pre-creation
  }

  test("block lookups A1/A2: latest height and as-of with fork tiebreak") {
    assert(Views.latestBlockHeight(tables("blocks")).collect()(0)
      .getAs[java.math.BigDecimal]("latest_block_height").intValue == 102)
    val asOf = Views.latestBlockBeforeTimestamp(tables("blocks"),
      BigDecimal("1700000002000000000")).collect()(0)
    assert(asOf.getAs[String]("block_hash") == "B102a") // hash-asc tiebreak
    val earlier = Views.latestBlockBeforeTimestamp(tables("blocks"),
      BigDecimal("1700000001500000000")).collect()(0)
    assert(earlier.getAs[String]("block_hash") == "B101")
  }

  test("circulating supply (A3): formula over fixture lockups") {
    import spark.implicits._
    val block = Views.latestBlockBeforeTimestamp(tables("blocks"),
      BigDecimal("1700000002000000000"))
    val v = Views.aggregatedLockups(tables("accounts"), tables("receipts"),
      tables("blocks"))
    val row = Views.circulatingSupply(spark, block, v,
      spark.createDataset(Fixtures.lockupStates),
      Fixtures.foundationLocked).collect()(0)

    val blockTs = 1700000002000000000L
    val expectedLocked = Lockup.lockedAmount(Fixtures.lockupStates.head, blockTs)
    assert(expectedLocked.signum > 0) // mid-release: partially locked
    val total = BigInt("1178709068419829947981959148837955")
    val expectedCirc =
      total - Fixtures.foundationLocked - BigInt(expectedLocked)

    assert(row.getAs[String]("computed_at_block_hash") == "B102a")
    assert(BigInt(row.getAs[java.math.BigDecimal]("computed_at_block_timestamp")
      .toBigInteger) == BigInt(blockTs))
    assert(BigInt(row.getAs[java.math.BigDecimal]("lockups_locked_tokens")
      .toBigInteger) == BigInt(expectedLocked))
    assert(BigInt(row.getAs[java.math.BigDecimal]("circulating_tokens_supply")
      .toBigInteger) == expectedCirc)
    assert(row.getAs[Int]("total_lockup_contracts_count") == 1)
    assert(row.getAs[Int]("unfinished_lockup_contracts_count") == 1)
  }

  test("start-of-day nanosecond bucketing") {
    assert(Views.startOfDayNs(BigInt("1700000002000000000")) ==
      BigInt("1699920000000000000"))
    assert(Views.startOfDayNs(BigInt("1699920000000000000")) ==
      BigInt("1699920000000000000"))
  }
}
