package org.apache.spark.graftdiag

import org.apache.spark.SparkContext

/** Read-only visibility into `private[spark]` scheduler internals for
  * the aging diagnostics in [[graft.core.Diag]] — a long-lived driver
  * accumulates per-session listeners (every `SparkSession` that runs a
  * streaming query registers a `StreamingQueryListenerBus` on the
  * shared `LiveListenerBus`), and the only way to SEE that from user
  * code is from inside the `org.apache.spark` package. Nothing here
  * mutates anything. */
object BusDiag {
  /** Number of listeners currently registered on the shared
    * LiveListenerBus (all queues). Monotonic growth across a bench run
    * = a per-query session/listener leak. */
  def listenerCount(sc: SparkContext): Int =
    sc.listenerBus.listeners.size()

  /** Drain the shared bus: block until every queued event has been
    * delivered to every listener. Used by the maintenance-scratch
    * receipt, whose block-update listener must observe a finished
    * drive's LAST events before its byte counter is read. */
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Listener class-name histogram — names WHICH listener type is
    * accumulating when the count climbs. */
  def listenerHistogram(sc: SparkContext): Seq[(String, Int)] = {
    import scala.jdk.CollectionConverters._
    sc.listenerBus.listeners.asScala.toSeq
      .groupBy(_.getClass.getName).view.mapValues(_.size).toSeq.sortBy(-_._2)
  }
}
