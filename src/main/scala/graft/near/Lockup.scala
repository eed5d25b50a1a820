package graft.near

import java.math.BigInteger

/** Lockup-contract locked-amount math (SURVEY §2.8), re-deriving the
  * semantics of `circulating-supply/src/lockup.rs:104-196` (itself a
  * copy of the public near/core-contracts lockup getters).
  *
  * All balances are u128 yoctoNEAR and the intermediate
  * `lockup_amount × time_left` product needs up to 192 bits, so the
  * math runs on java.math.BigInteger (the reference uses a U256 type
  * for the same reason). Timestamps/durations are u64 nanoseconds;
  * additions saturate at u64::MAX like Rust's `saturating_add`
  * (lockup.rs:111-126).
  */
object Lockup {

  /** Nanos when mainnet transfers were enabled (lockup.rs:17-18);
    * injected when the contract never recorded its own poll result
    * (lockup.rs:66-73).
    */
  val TransfersEnabledNs: Long = 1602614338293769340L

  /** Code-hash → has-the-start-date-bug whitelist
    * (lockup.rs:78-100); unknown hashes are assumed fixed.
    */
  val BuggyCodeHashes: Map[String, Boolean] = Map(
    "3kVY9qcVRoW3B5498SMX6R3rtSLiCdmBzKs7zcnzDJ7Q" -> true,
    "DiC9bKCqUHqoYqUXovAnqugiuntHWnM3cAc7KrgaHTu" -> true,
    "Cw7bnyp4B6ypwvgZuMmJtY6rHsxP2D4PC8deqeJ3HP7D" -> false,
    "4Pfw2RU6e35dUsHQQoFYfwX8KFFvSRNwMSNLXuSFHXrC" -> false,
    "3skHaUtj85RPdUZwx6M4Jp4PfC9qJHqnsyuWLtuq2xBT" -> false,
  )

  def isBuggy(codeHash: String): Boolean =
    BuggyCodeHashes.getOrElse(codeHash, false)

  /** Vesting discriminants (lockup_types.rs VestingInformation). */
  val VestingNone = "NONE"
  val VestingHash = "HASH"
  val VestingSchedule = "SCHEDULE"
  val VestingTerminating = "TERMINATING"

  /** One lockup contract's state as read at a block height — the
    * relational projection of `LockupContract` (lockup_types.rs:32-84)
    * with `transfers_timestamp` already injected (lockup.rs:66-73).
    * Balances ride as decimal strings (u128 > Long).
    */
  final case class State(
      accountId: String,
      codeHash: String,
      lockupAmount: String,
      terminationWithdrawnTokens: String,
      lockupDuration: Long,
      releaseDuration: Option[Long],
      lockupTimestamp: Option[Long],
      transfersTimestamp: Long,
      vestingType: String,
      vestingStart: Option[Long],
      vestingCliff: Option[Long],
      vestingEnd: Option[Long],
      terminatingUnvestedAmount: Option[String])

  private val U64Max = new BigInteger("18446744073709551615")

  /** u64 saturating_add. */
  private def satAdd(a: Long, b: Long): BigInteger = {
    val s = BigInteger.valueOf(a).add(BigInteger.valueOf(b))
    if (s.compareTo(U64Max) > 0) U64Max else s
  }

  private def bi(s: String): BigInteger = new BigInteger(s)
  private def max(a: BigInteger, b: BigInteger) = if (a.compareTo(b) >= 0) a else b

  /** get_unvested_amount (lockup.rs:163-196) for the SCHEDULE branch:
    * before cliff everything is unvested; after end nothing; in between
    * `lockup_amount × time_left / total_time`.
    */
  def unvestedAmount(lockupAmount: BigInteger, start: Long, cliff: Long,
      end: Long, blockTs: Long): BigInteger =
    if (blockTs < cliff) lockupAmount
    else if (blockTs >= end) BigInteger.ZERO
    else lockupAmount
      .multiply(BigInteger.valueOf(end - blockTs))
      .divide(BigInteger.valueOf(end - start))

  /** get_locked_amount (lockup.rs:104-159). */
  def lockedAmount(s: State, blockTs: Long, hasBug: Boolean): BigInteger = {
    val lockupAmount = bi(s.lockupAmount)
    val withdrawn = bi(s.terminationWithdrawnTokens)
    val lockupTs = max(satAdd(s.transfersTimestamp, s.lockupDuration),
      BigInteger.valueOf(s.lockupTimestamp.getOrElse(0L)))
    val blockTsBi = BigInteger.valueOf(blockTs)
    if (lockupTs.compareTo(blockTsBi) <= 0) {
      val unreleased = s.releaseDuration match {
        case Some(rd) =>
          val startLockup =
            if (hasBug) BigInteger.valueOf(s.transfersTimestamp) else lockupTs
          val endTs = {
            val e = startLockup.add(BigInteger.valueOf(rd))
            if (e.compareTo(U64Max) > 0) U64Max else e
          }
          if (blockTsBi.compareTo(endTs) >= 0) BigInteger.ZERO
          else lockupAmount.multiply(endTs.subtract(blockTsBi))
            .divide(BigInteger.valueOf(rd))
        case None => BigInteger.ZERO
      }
      val unvested = s.vestingType match {
        case VestingSchedule =>
          unvestedAmount(lockupAmount, s.vestingStart.get, s.vestingCliff.get,
            s.vestingEnd.get, blockTs)
        case VestingTerminating =>
          bi(s.terminatingUnvestedAmount.getOrElse("0"))
        // Hash vesting is private → assume started before lockup date
        case _ => BigInteger.ZERO
      }
      max(max(unreleased.subtract(withdrawn), BigInteger.ZERO), unvested)
    } else {
      // Entire balance locked before the lockup timestamp
      lockupAmount.subtract(withdrawn)
    }
  }

  def lockedAmount(s: State, blockTs: Long): BigInteger =
    lockedAmount(s, blockTs, isBuggy(s.codeHash))
}
