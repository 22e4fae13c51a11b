package org.apache.spark

/** Access bridge to `private[spark]` SparkContext members (same pattern
  * as sql.GraftBridge): the bench must drain the async listener bus
  * before reading task-time totals, or the last stage's metrics race the
  * read.
  */
object GraftSparkBridge {
  def waitForListeners(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
