package org.apache.spark

/** Bridge into Spark-core's `private[spark]` surface (the core-side
  * sibling of [[org.apache.spark.sql.GraftSql]]): the bench harness
  * needs the listener bus DRAINED before snapshotting accumulated task
  * metrics — `SparkListener` events post asynchronously, so without a
  * flush a query's last tasks could be attributed to the next query. */
object GraftSpark {

  /** Block until every queued listener event has been dispatched. */
  def flushListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
