package graft

import org.apache.spark.sql.functions._

/** Lag-1 hourly-rate autocorrelation (TimeOps.autocorr): moments must
  * equal a driver-side recompute over per-type hourly counts, r_milli
  * must equal the IEEE num/√dx/√dy in the same op order, and r must be
  * bounded in [-1000, 1000] (Cauchy–Schwarz on the exact integers).
  */
class AutocorrSpec extends SparkSpec {

  test("moments and r_milli equal brute hourly recompute; |r| <= 1") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"),
              date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("h"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expect = ev.groupBy(_._1).flatMap { case (et, xs) =>
      val hourly = xs.groupBy(_._2).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1).map(_._2)
      val pairs = hourly.sliding(2).collect { case Seq(p, c) => (c, p) }.toSeq
      val n = pairs.size.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(t => t._1 * t._2).sum
      val sxx = pairs.map(t => t._1 * t._1).sum
      val syy = pairs.map(t => t._2 * t._2).sum
      val num = n * sxy - sx * sy
      val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
      if (n >= 2 && dx > 0 && dy > 0)
        Some(et -> ((n, num, dx, dy,
          // HALF_UP away from zero = Spark/DuckDB round (math.round
          // floors negative halves — wrong reference)
          BigDecimal(num.toDouble / math.sqrt(dx.toDouble) /
                     math.sqrt(dy.toDouble) * 1e3)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)))
      else None
    }
    val got = ext.TimeOps.queries("time_autocorr")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got === expect)
    assert(got.nonEmpty, "no event type survived the variance gate — vacuous")
    got.values.foreach { case (_, num, dx, dy, rm) =>
      assert(math.abs(rm) <= 1000L, s"|r| > 1: $rm")
      // Cauchy–Schwarz on the exact integers: num^2 <= dx*dy
      assert(BigInt(num) * BigInt(num) <= BigInt(dx) * BigInt(dy))
    }
  }
}
