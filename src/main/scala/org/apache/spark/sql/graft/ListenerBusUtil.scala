package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** `LiveListenerBus.waitUntilEmpty` is `private[spark]`; the benchmark's
  * per-query bytesRead attribution needs it to fence listener events
  * between queries (task-end events are delivered asynchronously).
  */
object ListenerBusUtil {
  def waitUntilEmpty(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(30000L)
}
