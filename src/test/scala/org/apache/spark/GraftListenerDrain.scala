package org.apache.spark

/** Test-only shim into Spark's private[spark] listener bus: the marquee
  * job-count assertions must DRAIN the async bus before reading their
  * counters, and `waitUntilEmpty` (the deterministic drain Spark's own
  * test suites use) is package-private — a bounded wait here replaces a
  * flaky Thread.sleep on a loaded host (round-8 advice).
  */
object GraftListenerDrain {
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
