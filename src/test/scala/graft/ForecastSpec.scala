package graft

import org.apache.spark.sql.functions._

/** Seasonal-naive backtest (TimeOps.forecastBacktest): rows must equal
  * a brute causal replay (expanding same-hod mean, floor division,
  * first observation unscored) and the accounting must close: scored
  * forecasts = hourly observations − populated (type, hod) bins.
  */
class ForecastSpec extends SparkSpec {

  test("per-type MAE/bias equal brute causal replay; accounting closes") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"),
              date_format(date_trunc("hour", col("ts")),
                          "yyyy-MM-dd HH").as("h"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val hourly = ev.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case ((et, h), c) => (et, h, c) }
    val expect = hourly.groupBy(_._1).map { case (et, xs) =>
      val errs = xs.groupBy(_._2.substring(11, 13)).toSeq.flatMap {
        case (_, bin) =>
          val ordered = bin.sortBy(_._2).map(_._3)
          var np = 0L; var sp = 0L
          ordered.flatMap { c =>
            val r = if (np >= 1) Some(c - sp / np) else None
            np += 1; sp += c
            r
          }
      }
      val n = errs.size.toLong
      val sae = errs.map(math.abs).sum
      val bias = errs.sum
      val biasMilli =
        if (bias < 0) -((-bias) * 1000L / n) else bias * 1000L / n
      et -> ((n, sae, sae * 1000000L / n, bias, biasMilli))
    }
    val got = ext.TimeOps.queries("time_forecast_backtest")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))))
      .toMap
    assert(got === expect)
    assert(got.nonEmpty)
    // accounting: each populated (type, hod) bin loses exactly its first
    // observation to causality
    val binCount = hourly.map(t => (t._1, t._2.substring(11, 13))).distinct
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val obsCount = hourly.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    got.foreach { case (et, (n, _, _, _, _)) =>
      assert(n === obsCount(et) - binCount(et), s"$et forecast count")
    }
  }
}
