package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Flush the async listener bus so per-query metric snapshots are exact.
  * `SparkContext.listenerBus` is `private[spark]`; reached from inside the
  * namespace the same way the sql-side ColumnBridge reaches
  * ExpressionUtils.
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
