package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for the measurement tooling
  * (Bench's jobs-vs-wall split, JobProfile's per-job table):
  * `SparkContext.listenerBus.waitUntilEmpty` is `private[spark]`, so
  * this one-method bridge lives under `org.apache.spark`. It replaces
  * the previous `Thread.sleep(300)` drain, which was a race — under
  * load late JobEnd/StageCompleted events landed after the profile was
  * printed and skewed per-job metrics (r20 ADVICE). Measurement
  * plumbing only; no query path touches this.
  */
object ListenerSync {
  /** Block until every queued listener event has been delivered, or
    * `timeoutMs` elapses (best-effort: a timeout or a stopped context
    * degrades to the old imprecision, never to a failure).
    */
  def drain(sc: SparkContext, timeoutMs: Long = 5000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
