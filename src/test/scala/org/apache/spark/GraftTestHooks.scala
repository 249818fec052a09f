package org.apache.spark

/** Test-only bridge: flush the async listener bus so input-metric
  * assertions observe every completed task (waitUntilEmpty is
  * private[spark]). */
object GraftTestHooks {
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
