package graft

import java.math.BigInteger
import java.util.Base64
import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import graft.near.{DailyScheduler, Fixtures, Ingest, Lockup, Rpc, Views}

/** Top-level (not suite-inner) so Spark closures carrying the
  * transport don't drag a non-serializable ScalaTest suite along.
  */
private object NearRpcFixtures {

  /** Encode a full LockupContract borsh blob (lockup_types.rs:32-84)
    * from a Lockup.State; the on-chain transfers variant intentionally
    * differs from the injected phase-2 value to prove the injection
    * (lockup.rs:66-73).
    */
  def encodeContract(s: Lockup.State): Array[Byte] = {
    val w = new Rpc.BorshWriter
    w.string("owner.near")
    w.u128(new BigInteger(s.lockupAmount))
    w.u128(new BigInteger(s.terminationWithdrawnTokens))
    w.u64(s.lockupDuration)
    w.option(s.releaseDuration)(w.u64(_))
    w.option(s.lockupTimestamp)(w.u64(_))
    w.u8(0).u64(999L) // TransfersEnabled { on-chain ts ≠ injected }
    s.vestingType match {
      case Lockup.VestingNone => w.u8(0)
      case Lockup.VestingHash => w.u8(1).bytesVec(Array[Byte](1, 2, 3))
      case Lockup.VestingSchedule =>
        w.u8(2).u64(s.vestingStart.get).u64(s.vestingCliff.get)
          .u64(s.vestingEnd.get)
      case Lockup.VestingTerminating =>
        w.u8(3).u128(new BigInteger(s.terminatingUnvestedAmount.get)).u8(4)
    }
    w.string("whitelist.near") // staking_pool_whitelist_account_id
    w.u8(1) // staking_information: Some
    w.string("pool.near").u8(0).u128(BigInteger.valueOf(42L))
    w.u8(1).string("foundation.near") // foundation_account_id: Some
    w.toBytes
  }

  /** Recorded-fixture transport: dispatches on request_type/account_id
    * like a NEAR node would, from canned responses.
    */
  final class FixtureTransport extends Rpc.Transport {
    @transient private lazy val mapper = new ObjectMapper()
    val stateB64: String =
      Base64.getEncoder.encodeToString(encodeContract(Fixtures.lockupStates.head))
    def post(body: String): String = {
      val req = mapper.readTree(body)
      val params = req.get("params")
      if (req.get("method").asText() == "block")
        return """{"result":{"header":{"timestamp_nanosec":"1700000002000000000"}}}"""
      val acct = params.get("account_id").asText()
      params.get("request_type").asText() match {
        case "view_state" =>
          assert(acct == "fund.lockup.near")
          assert(params.get("block_id").asLong() == 102L)
          s"""{"result":{"values":[{"key":"U1RBVEU=","value":"$stateB64"}]}}"""
        case "view_account" =>
          val (amount, hash) = acct match {
            case "fund.lockup.near" =>
              ("0", Fixtures.lockupStates.head.codeHash)
            case "lockup.near" =>
              ("100000000000000000000000000000000", "11111111111111111111111111111111")
            case "contributors.near" =>
              ("200000000000000000000000000000000", "11111111111111111111111111111111")
          }
          s"""{"result":{"amount":"$amount","locked":"0","code_hash":"$hash","storage_usage":1000}}"""
      }
    }
  }
}

/** S4 (the JSON-RPC point source) + the daily scheduler loop: borsh
  * round-trip of the LockupContract layout, recorded-fixture transport
  * serving ViewState/ViewAccount, the supply job end-to-end WITHOUT
  * pre-built state tables, and the 00:10-UTC/2h-retry cadence.
  */
class NearRpcSpec extends AnyFunSuite {
  import SparkTestSession._
  import NearRpcFixtures.encodeContract

  test("non-429 4xx fails fast: RpcClientError passes through the retry loop") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    var calls = 0
    val e = intercept[graft.near.Rpc.RpcClientError] {
      graft.near.Rpc.withRetry(sleep = sleeps.append(_)) { () =>
        calls += 1
        // what HttpTransport throws for a deterministic 4xx answer
        throw new graft.near.Rpc.RpcClientError(404, "no such method")
      }
    }
    assert(e.statusCode == 404)
    assert(calls == 1, "a deterministic 4xx answer must not be retried")
    assert(sleeps.isEmpty)
  }

  test("borsh round-trip: every vesting variant decodes to its fields") {
    val base = Fixtures.lockupStates.head
    val variants = Seq(
      base,
      base.copy(vestingType = Lockup.VestingHash),
      base.copy(vestingType = Lockup.VestingSchedule,
        vestingStart = Some(1L), vestingCliff = Some(2L),
        vestingEnd = Some(3L)),
      base.copy(vestingType = Lockup.VestingTerminating,
        terminatingUnvestedAmount =
          Some("340282366920938463463374607431768211455"))) // u128::MAX
    variants.foreach { v =>
      val raw = Rpc.decodeLockupContract(encodeContract(v))
      assert(raw.ownerAccountId == "owner.near")
      assert(raw.lockupAmount == new BigInteger(v.lockupAmount))
      assert(raw.lockupDuration == v.lockupDuration)
      assert(raw.releaseDuration == v.releaseDuration)
      assert(raw.lockupTimestamp == v.lockupTimestamp)
      assert(raw.vestingType == v.vestingType)
      assert(raw.vestingStart == v.vestingStart)
      assert(raw.vestingCliff == v.vestingCliff)
      assert(raw.vestingEnd == v.vestingEnd)
      assert(raw.terminatingUnvestedAmount.map(_.toString)
        == v.terminatingUnvestedAmount)
    }
  }

  test("borsh round-trip property: arbitrary u128/u64/option layouts") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val balance = Gen.chooseNum(0L, Long.MaxValue)
      .map(n => (BigInt(n) * BigInt(n).max(1)).toString) // up to ~2^126
    val optLong = Gen.option(Gen.chooseNum(0L, Long.MaxValue))
    val genState = for {
      amount <- balance
      withdrawn <- balance
      dur <- Gen.chooseNum(0L, Long.MaxValue)
      rel <- optLong
      lts <- optLong
      vt <- Gen.oneOf(Lockup.VestingNone, Lockup.VestingHash,
        Lockup.VestingSchedule, Lockup.VestingTerminating)
      vs <- Gen.chooseNum(0L, Long.MaxValue)
      vc <- Gen.chooseNum(0L, Long.MaxValue)
      ve <- Gen.chooseNum(0L, Long.MaxValue)
      tua <- balance
    } yield Fixtures.lockupStates.head.copy(
      lockupAmount = amount, terminationWithdrawnTokens = withdrawn,
      lockupDuration = dur, releaseDuration = rel, lockupTimestamp = lts,
      vestingType = vt,
      vestingStart = if (vt == Lockup.VestingSchedule) Some(vs) else None,
      vestingCliff = if (vt == Lockup.VestingSchedule) Some(vc) else None,
      vestingEnd = if (vt == Lockup.VestingSchedule) Some(ve) else None,
      terminatingUnvestedAmount =
        if (vt == Lockup.VestingTerminating) Some(tua) else None)
    // Deterministic sweep (fixed seeds) — no flaky generators.
    (0 until 200).foreach { i =>
      val s = genState.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val raw = Rpc.decodeLockupContract(encodeContract(s))
      assert(raw.lockupAmount.toString == s.lockupAmount)
      assert(raw.terminationWithdrawnTokens.toString ==
        s.terminationWithdrawnTokens)
      assert(raw.lockupDuration == s.lockupDuration)
      assert(raw.releaseDuration == s.releaseDuration)
      assert(raw.lockupTimestamp == s.lockupTimestamp)
      assert(raw.vestingType == s.vestingType)
      assert((raw.vestingStart, raw.vestingCliff, raw.vestingEnd) ==
        ((s.vestingStart, s.vestingCliff, s.vestingEnd)))
      assert(raw.terminatingUnvestedAmount.map(_.toString) ==
        s.terminatingUnvestedAmount)
    }
  }

  test("S4 end-to-end: circulating supply from the RPC point source") {
    val tables = Ingest.allTables(
      Ingest.blocksFromJson(spark, Fixtures.chain).toDF())
    val block = Views.latestBlockBeforeTimestamp(tables("blocks"),
      BigDecimal("1700000002000000000"))
    val v = Views.aggregatedLockups(tables("accounts"), tables("receipts"),
      tables("blocks"))

    val viaRpc = Views.circulatingSupplyViaRpc(spark, block, v,
      new NearRpcFixtures.FixtureTransport).collect()(0)
    // Must equal the pre-built-table path on the same fixtures.
    import spark.implicits._
    val viaTables = Views.circulatingSupply(spark, block, v,
      spark.createDataset(Fixtures.lockupStates),
      Fixtures.foundationLocked).collect()(0)
    assert(viaRpc.toSeq == viaTables.toSeq)
    assert(BigInt(viaRpc.getAs[java.math.BigDecimal]("foundation_locked_tokens")
      .toBigInteger) == Fixtures.foundationLocked) // summed from 2 point reads
  }

  test("daily scheduler: wait, compute, skip-precomputed, retry on error") {
    val day0 = DailyScheduler.initialDayToCompute
    assert((day0 - DailyScheduler.ComputeDelayNs) % DailyScheduler.DayNs == 0)
    assert(day0 > BigInt(Lockup.TransfersEnabledNs))

    val sleeps = scala.collection.mutable.ArrayBuffer[BigInt]()
    val computed = scala.collection.mutable.ArrayBuffer[BigInt]()
    var clock = day0 - BigInt(1000L) // just before the first boundary
    var chainHead = day0 - BigInt(1L) // blocks NOT yet past the boundary
    var failNext = true
    val env = DailyScheduler.Env(
      now = () => clock,
      sleep = ns => { sleeps += ns; clock += ns },
      finalBlockTimestamp = () => chainHead,
      computeDay = day => {
        if (failNext) { failNext = false; Left(new RuntimeException("transient")) }
        else { computed += day; Right(()) }
      })

    // Step 1: blocks lag → one 2h backoff, then the head advances.
    val after1 = DailyScheduler.run(env, day0, maxSteps = 1)
    assert(sleeps.head == BigInt(1000L)) // waited until 00:10 boundary
    assert(sleeps.count(_ == DailyScheduler.RetryNs) == 1) // block wait
    assert(after1 == day0 && computed.isEmpty)

    chainHead = day0 + BigInt(1L)
    // Step 2: compute fails → 2h retry, same day. Step 3: succeeds.
    val after2 = DailyScheduler.run(env, after1, maxSteps = 2)
    assert(after2 == day0 + DailyScheduler.DayNs)
    assert(computed.toSeq == Seq(day0))
    assert(sleeps.count(_ == DailyScheduler.RetryNs) == 2) // + failure retry

    // Next day: head already past, compute succeeds immediately
    // (the precomputed-skip branch returns Right as well — A4 inside).
    chainHead = day0 + 2 * DailyScheduler.DayNs
    val after3 = DailyScheduler.run(env, after2, maxSteps = 1)
    assert(after3 == day0 + 2 * DailyScheduler.DayNs)
    assert(computed.toSeq == Seq(day0, day0 + DailyScheduler.DayNs))
  }

  test("daily body wires computeDailyIfMissing: compute once then skip") {
    import spark.implicits._
    val tables = Ingest.allTables(
      Ingest.blocksFromJson(spark, Fixtures.chain).toDF())
    val v = Views.aggregatedLockups(tables("accounts"), tables("receipts"),
      tables("blocks"))
    val reqTs = BigInt("1700000002000000000") + DailyScheduler.DayNs
    val first = Views.computeDailyIfMissing(spark, tables("blocks"), v,
      aggregatedSupply = None, spark.createDataset(Fixtures.lockupStates),
      Fixtures.foundationLocked, reqTs)
    assert(first.nonEmpty)
    val again = Views.computeDailyIfMissing(spark, tables("blocks"), v,
      aggregatedSupply = first, spark.createDataset(Fixtures.lockupStates),
      Fixtures.foundationLocked, reqTs)
    assert(again.isEmpty) // A4 precomputed-skip
  }
}
