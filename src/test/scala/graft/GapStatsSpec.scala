package graft

import org.apache.spark.sql.functions._

/** Inter-event gap distribution (TimeOps.gapStats): bucket rows must
  * equal a driver-side recompute of per-user consecutive gaps under the
  * (ts, event_id) order, and totals must account for every event minus
  * one per user.
  */
class GapStatsSpec extends SparkSpec {

  test("buckets equal brute per-user gap recompute; totals account") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = ev.groupBy(_._1).values.flatMap { xs =>
      val sorted = xs.sortBy(t => (t._2, t._3))
      sorted.sliding(2).collect { case Array(a, b) => b._2 - a._2 }
    }.toSeq
    def bucket(g: Long): Int =
      if (g < 1000000L) 0 else if (g < 10000000L) 1 else if (g < 60000000L) 2
      else if (g < 300000000L) 3 else if (g < 3600000000L) 4 else 5
    val expect = gaps.groupBy(bucket).map { case (b, gs) =>
      b -> ((gs.size.toLong, gs.min, gs.max, gs.sum / gs.size))
    }
    val got = ext.TimeOps.queries("time_gap_stats")(spark, sf0001)
      .collect()
      .map(r => (r.getInt(0), (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got === expect)
    val nUsers = ev.map(_._1).distinct.length
    assert(got.values.map(_._1).sum === (ev.length - nUsers).toLong)
    assert(got.size >= 2, "fixture gaps land in one bucket — vacuous")
  }
}
