package graft

import org.apache.spark.sql.functions._

/** Hour-of-day profile (TimeOps.seasonalProfile): bins must equal a
  * brute recompute from hourly counts under the UTC session, exactly
  * one peak per type, and the bins must conserve the type's event
  * total.
  */
class SeasonalProfileSpec extends SparkSpec {

  test("profile equals brute hour-of-day recompute; one peak; mass conserved") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"),
              date_format(date_trunc("hour", col("ts")),
                          "yyyy-MM-dd HH").as("h"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expect = ev.groupBy(_._1).flatMap { case (et, xs) =>
      val hourly = xs.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
      val byHod = hourly.groupBy { case (h, _) => h.substring(11, 13).toInt }
      val rows = byHod.map { case (hod, hs) =>
        val nh = hs.size.toLong
        val nev = hs.map(_._2).sum
        (hod, nh, nev, nev * 1000000L / nh)
      }.toSeq
      val peak = rows.minBy { case (hod, _, _, m) => (-m, hod) }._1
      rows.map { case (hod, nh, nev, m) =>
        (et, hod) -> ((nh, nev, m, if (hod == peak) 1 else 0))
      }
    }.toMap
    val got = ext.TimeOps.queries("time_seasonal_profile")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))))
      .toMap
    assert(got === expect)
    assert(got.nonEmpty)
    // exactly one peak per type; per-type event mass conserved
    val types = ev.map(_._1).distinct
    types.foreach { et =>
      val bins = got.collect { case ((t, _), v) if t == et => v }
      assert(bins.count(_._4 == 1) === 1, s"$et peak count")
      assert(bins.map(_._2).sum === ev.count(_._1 == et).toLong,
        s"$et mass not conserved")
    }
  }
}
