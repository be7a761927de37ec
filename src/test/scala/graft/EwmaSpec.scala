package graft

/** time_ewma invariants: the 8-lag truncated EWM must match a
  * driver-side recompute with the same binary-exact weights, and since
  * the zero-padded weights sum to exactly 1 the smoother is a convex
  * combination — bounded by [0, max(last 8 counts)]. */
class EwmaSpec extends SparkSpec {

  private lazy val rows =
    ext.TimeOps.ewma(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
                 r.getDouble(3), r.getInt(4)))

  test("ewm matches a driver-side recompute with 2^-i weights") {
    assert(rows.nonEmpty)
    for ((_, series) <- rows.groupBy(_._1)) {
      val ordered = series.sortBy(_._2)
      val counts = ordered.map(_._3)
      for (t <- ordered.indices) {
        var num = 0.0
        for (i <- 0 until 8) {
          val c = if (t - i >= 0) counts(t - i) else 0L
          num += c.toDouble * (1.0 / (1L << i))
        }
        val expect = BigDecimal(num / (255.0 / 128.0))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(ordered(t)._4 === expect,
               s"${ordered(t)._1}/${ordered(t)._2} ewm")
        val burst = if (counts(t).toDouble > expect * 2) 1 else 0
        assert(ordered(t)._5 === burst, s"${ordered(t)._2} burst flag")
      }
    }
  }

  test("ewm is a convex combination: bounded by the padded window max") {
    for ((_, series) <- rows.groupBy(_._1)) {
      val ordered = series.sortBy(_._2)
      val counts = ordered.map(_._3)
      for (t <- ordered.indices) {
        val windowMax =
          (0 until 8).map(i => if (t - i >= 0) counts(t - i) else 0L).max
        val ewm = ordered(t)._4
        assert(ewm >= 0.0 && ewm <= windowMax.toDouble + 1e-4,
               s"${ordered(t)._2} ewm $ewm outside [0, $windowMax]")
      }
    }
  }
}
