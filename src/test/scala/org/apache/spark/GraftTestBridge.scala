package org.apache.spark

/** Test-only bridge into `private[spark]` listener plumbing:
  * SparkListener metrics arrive asynchronously, so a spec that asserts on
  * accumulated task metrics must drain the bus first. Same pattern as
  * `org.apache.spark.sql.GraftColumnBridge` (Column↔Expression).
  */
object GraftTestBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}
