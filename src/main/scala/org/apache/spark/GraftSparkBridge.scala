package org.apache.spark

/** Minimal bridge to `private[spark]` APIs (same pattern as the
  * graft.functions.ColumnBridge shim for `private[sql]`): the listener
  * bus delivers task-metric events asynchronously, so any code that sums
  * task metrics around a job must drain the queue before reading the sum.
  */
object GraftSparkBridge {
  /** Block until every queued listener event has been delivered. */
  def waitListenerQueueEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
