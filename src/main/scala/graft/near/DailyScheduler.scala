package graft.near

/** The daily circulating-supply cadence
  * (`circulating-supply/src/main.rs:60-105,238-263`): compute each UTC
  * day at 00:10 (data assumed finalized), starting the day after
  * mainnet transfers were enabled; wait until the chain has loaded
  * blocks past the boundary; on failure retry the SAME day after 2 h;
  * on success advance one day.
  *
  * Time and side effects are injected ([[Env]]) so specs drive
  * simulated days deterministically; production wires `System.nanoTime`
  * -free wall-clock nanos, `Thread.sleep`, [[Rpc.finalBlockTimestamp]]
  * and [[Views.computeDailyIfMissing]].
  */
object DailyScheduler {

  val DayNs: BigInt = BigInt(86400L) * 1000000000L
  val RetryNs: BigInt = BigInt(2L * 3600) * 1000000000L // 2 h (main.rs:21)
  val ComputeDelayNs: BigInt = BigInt(10L * 60) * 1000000000L // 00:10 UTC

  /** First day boundary to compute: transfers-enabled day + 1 day,
    * at 00:10 UTC (main.rs:64-71).
    */
  def initialDayToCompute: BigInt =
    Views.startOfDayNs(BigInt(Lockup.TransfersEnabledNs)) + DayNs + ComputeDelayNs

  /** Injected environment; every timestamp is UTC nanos.
    *
    * @param now        wall clock
    * @param sleep      blocking wait
    * @param finalBlockTimestamp latest FINAL block's timestamp (RPC
    *                   probe; may throw — treated as not-loaded-yet,
    *                   main.rs:247-259)
    * @param computeDay run the day's body (A2+A4+A3,
    *                   Views.computeDailyIfMissing); Left(error) retries
    *                   the day, Right(skippedOrDone) advances
    */
  final case class Env(
      now: () => BigInt,
      sleep: BigInt => Unit,
      finalBlockTimestamp: () => BigInt,
      computeDay: BigInt => Either[Throwable, Unit])

  /** Drive up to `maxSteps` loop iterations (Int.MaxValue in
    * production — the reference loops forever). Returns the next
    * day-to-compute so a restart resumes where it left off.
    */
  def run(env: Env, startDay: BigInt = initialDayToCompute,
      maxSteps: Int = Int.MaxValue): BigInt = {
    var day = startDay
    var steps = 0
    while (steps < maxSteps) {
      val now = env.now()
      if (now < day) env.sleep(day - now)
      // wait_for_loading_needed_blocks (main.rs:238-263): a probe
      // error is "not loaded yet", both cases back off RETRY.
      var loaded = false
      while (!loaded && steps < maxSteps) {
        loaded = scala.util.Try(env.finalBlockTimestamp())
          .map(_ > day).getOrElse(false)
        if (!loaded) { env.sleep(RetryNs); steps += 1 }
      }
      if (loaded) {
        env.computeDay(day) match {
          case Right(_) => day += DayNs
          case Left(_)  => env.sleep(RetryNs)
        }
        steps += 1
      }
    }
    day
  }
}
