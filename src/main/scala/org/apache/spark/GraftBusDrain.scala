package org.apache.spark

/** Bench-only accessor: `SparkContext.listenerBus` is `private[spark]`,
  * but the bench's per-query metric attribution must not race the async
  * listener bus — task-end events for a finished job can still be in
  * flight when the timing loop snapshots its counters. `waitUntilEmpty`
  * itself is a public method on [[scheduler.LiveListenerBus]]; this
  * object only bridges the package-private field access (the standard
  * ecosystem pattern for test/bench utilities that need bus barriers).
  */
object GraftBusDrain {
  def drain(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
