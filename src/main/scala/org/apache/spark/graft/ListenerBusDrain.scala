package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bench-only shim: drain the listener bus so a task-metrics delta read
  * after an action includes every task of that action (task-end events
  * are delivered asynchronously on the bus thread). `waitUntilEmpty` is
  * `private[spark]`, hence this one accessor under `org.apache.spark`;
  * nothing else in graft reaches into Spark internals this way.
  */
object ListenerBusDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
