package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; this bridge exposes
  * the one call a metrics meter needs — block until every queued
  * listener event is delivered, so sums read after an action are
  * complete rather than racing the async bus.
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
