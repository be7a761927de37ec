package graft

/** Multi-lag ACF (TimeOps.acf): the lag-1 rows must equal time_autocorr
  * exactly (same moments, same float step), every r must respect
  * Cauchy–Schwarz, and all requested lags must be populated on the
  * 30-day fixture.
  */
class AcfSpec extends SparkSpec {

  test("lag-1 slice == time_autocorr; |r| <= 1; all lags populated") {
    val acf = ext.TimeOps.queries("time_acf")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val auto = ext.TimeOps.queries("time_autocorr")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(5))))
      .toMap
    assert(auto.nonEmpty)
    auto.foreach { case (et, (n, rm)) =>
      assert(acf((et, 1)) === ((n, rm)), s"lag-1 row for $et != time_autocorr")
    }
    acf.values.foreach { case (_, rm) => assert(math.abs(rm) <= 1000L) }
    val lags = Seq(1, 2, 3, 6, 12, 24)
    val types = auto.keySet
    types.foreach { et =>
      lags.foreach(l => assert(acf.contains((et, l)), s"missing ($et, $l)"))
    }
  }
}
