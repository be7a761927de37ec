package graft

import org.apache.spark.sql.functions._

/** time_ohlc invariants: bars must agree with a driver-side recompute
  * from the raw events under the same (ts, event_id) ordering, and the
  * window/aggregate split must not disturb bar membership. */
class OhlcSpec extends SparkSpec {

  private lazy val bars =
    ext.TimeOps.ohlc(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
         r.getDouble(6), r.getDouble(7))).toMap

  private lazy val raw = Tables.events(spark, sf0001)
    .select(col("event_type"),
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
              .as("h"),
            col("ts").cast("long").as("tsl"), col("event_id"), col("value"))
    .collect()
    .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
               r.getDouble(4)))

  test("bars agree with a driver-side recompute") {
    val grouped = raw.groupBy(e => (e._1, e._2))
    assert(grouped.nonEmpty && bars.nonEmpty)
    assert(bars.keySet === grouped.keySet)
    for ((k, es) <- grouped) {
      val ord = es.sortBy(e => (e._3, e._4)) // (ts, event_id)
      val (n, o, c, lo, hi, vol) = bars(k)
      assert(n === es.length, s"$k count")
      assert(o === ord.head._5, s"$k open")
      assert(c === ord.last._5, s"$k close")
      assert(lo === es.map(_._5).min, s"$k low")
      assert(hi === es.map(_._5).max, s"$k high")
      assert(math.abs(vol - es.map(_._5).sum) < 0.01, s"$k volume")
    }
  }

  test("open and close coincide on single-event bars, and low <= high") {
    for ((k, (n, o, c, lo, hi, _)) <- bars) {
      if (n == 1L) assert(o === c, s"$k single-event bar open != close")
      assert(lo <= hi, s"$k low > high")
      assert(lo <= o && o <= hi && lo <= c && c <= hi, s"$k open/close outside range")
    }
  }
}
