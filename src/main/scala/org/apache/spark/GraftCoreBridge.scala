package org.apache.spark

/** Minimal `private[spark]` bridge into spark-core for the graft bench
  * instrumentation (the GraftBridge pattern applied to core): per-query
  * attribution of task metrics needs the ASYNC listener bus drained at
  * each query boundary, or a heavy query's straggler events bill the next
  * query. `LiveListenerBus.waitUntilEmpty` is exactly that barrier but is
  * package-private; this is the one-method hop every metrics-attributing
  * harness needs. */
object GraftCoreBridge {
  /** Block until every queued listener event has been delivered, bounded
    * at `timeoutMs` (a bus that cannot drain in 10 s is a diagnostic
    * finding itself — swallow the timeout, the attribution just gets one
    * boundary's slop instead of failing the bench). */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => }
}
