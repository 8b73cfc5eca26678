package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession

/** Test seam for plan-capture specs: `QueryExecutionListener` events ride
  * the shared async listener bus, so a spec that registers a listener,
  * runs a write, and immediately asserts on the captured plans races the
  * delivery thread. `LiveListenerBus.waitUntilEmpty()` closes that race
  * but is `private[spark]` — this bridge lives in the package tree for
  * the same reason [[StreamBridge]] does.
  */
object ListenerBridge {

  /** Block until every queued listener event (including
    * QueryExecutionListener deliveries) has been dispatched.
    */
  def drain(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}

