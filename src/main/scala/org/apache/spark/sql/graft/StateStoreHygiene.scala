package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Bridge into Spark's `private[sql]` state-store registry.
  *
  * Structured Streaming keeps every loaded `StateStoreProvider` (and,
  * under RocksDB, its native memory plus periodic maintenance work)
  * registered in the executor for the life of the session — correct
  * for a long-running production query that will read its state again,
  * pure overhead for a drained `Trigger.AvailableNow` run whose
  * throwaway checkpoint can never be reopened. Spark exposes the
  * unload hook only `private[sql]`, hence this one-file shim in the
  * `org.apache.spark.sql` namespace (the standard technique for
  * reaching a package-private Spark API; no Spark internals are
  * modified or copied).
  */
object StateStoreHygiene {
  /** Unload all loaded state-store providers on this executor. Safe at
    * any quiescent point: the next streaming batch re-loads providers
    * from its own checkpoint on demand.
    */
  def unloadAll(): Unit = StateStore.unloadAll()
}
