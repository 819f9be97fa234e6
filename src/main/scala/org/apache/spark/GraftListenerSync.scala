package org.apache.spark

/** Same-package access to the `private[spark]` listener bus drain.
  *
  * [[graft.BenchTelemetry]] attributes task metrics to the query that just
  * ran; listener delivery is asynchronous, so without a drain the tail of
  * one query's events can land in the next query's window. Spark exposes
  * `LiveListenerBus.waitUntilEmpty()` for exactly this (its own suites use
  * it between job and assertion) but keeps it `private[spark]` — this shim
  * is the minimal bridge, no behavior of its own.
  */
object GraftListenerSync {

  /** Block until every queued listener event has been delivered. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
