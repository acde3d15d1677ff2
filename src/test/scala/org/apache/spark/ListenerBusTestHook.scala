package org.apache.spark

/** Test-only accessor for the private[spark] listener bus: job-counting
  * assertions must drain in-flight events before reading their counters.
  */
object ListenerBusTestHook {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
