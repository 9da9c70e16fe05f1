package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge: `SparkContext.listenerBus` is `private[spark]`, but
  * metrics-based assertions (e.g. "this append read only the appended
  * files") must drain the async bus before reading their accumulators.
  * Lives in the `org.apache.spark` namespace solely for access.
  */
object TestShim {
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
