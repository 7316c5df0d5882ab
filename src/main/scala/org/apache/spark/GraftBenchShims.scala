package org.apache.spark

/** Minimal access shim for the `private[spark]` listener-bus drain:
  * bench instrumentation samples per-query task metrics from a
  * SparkListener, and without a drain between queries the async bus
  * would attribute a query's late events to the next query's window.
  */
object GraftBenchShims {
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
