package graft

import org.apache.spark.sql.functions._

/** CUSUM changepoint stat (TimeOps.cusum): the per-type row must equal
  * a driver-side exact-integer recompute over hourly counts (max
  * |n·S_k − k·S_n|, earliest-hour tie-break), and the statistic's
  * hard algebraic bounds must hold (0 ≤ max|D| < n·S_n ⇒ dev_milli
  * strictly below 1000).
  */
class CusumSpec extends SparkSpec {

  test("per-type changepoint equals brute integer recompute; bounds hold") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"),
              date_format(date_trunc("hour", col("ts")),
                          "yyyy-MM-dd HH:mm:ss").as("h"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expect = ev.groupBy(_._1).map { case (et, xs) =>
      val hourly = xs.groupBy(_._2).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val n = hourly.size.toLong
      val total = hourly.map(_._2).sum
      var sk = 0L
      val devs = hourly.zipWithIndex.map { case ((h, c), i) =>
        sk += c
        (h, math.abs(n * sk - (i + 1L) * total))
      }
      // deterministic tie-break: max absdev, then EARLIEST hour
      val maxDev = devs.map(_._2).max
      val cpHour = devs.filter(_._2 == maxDev).map(_._1).min
      et -> ((n, total, cpHour, maxDev, maxDev * 1000L / (n * total)))
    }
    val got = ext.TimeOps.queries("time_cusum")(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getLong(5))))
      .toMap
    assert(got === expect)
    assert(got.nonEmpty, "no event types — vacuous")
    got.values.foreach { case (n, total, _, maxDev, devMilli) =>
      // |D_k| = |n·S_k − k·S_n| ≤ total·k(n−k)·?/… — the tight bound is
      // D_k ≤ S_n·k(n−k)/n·… use the loose exact one: D_k < n·S_n
      assert(maxDev >= 0L && maxDev < n * total)
      // normalized score: max of |S_k/S_n − k/n| over a nonneg series
      // is < 1, and for the count series it is ≤ 1/4 + edge slack — pin
      // the hard algebraic bound only
      assert(devMilli >= 0L && devMilli < 1000L, s"dev_milli $devMilli")
    }
  }
}
