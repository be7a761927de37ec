package graft

/** Batch time-analytics checks beyond the oracle hash: the spike
  * detector's integer test recomputed independently from the hourly
  * series. */
class TimeOpsSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  test("spike flags equal an independent trailing-window recomputation") {
    val rows = ext.TimeOps.spike(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getInt(4))).sortBy(_._1)
    assert(rows.length > 100, "hourly series suspiciously short")
    val counts = rows.map(_._2)
    rows.zipWithIndex.foreach { case ((h, c, s24, k, flag), i) =>
      val lo = math.max(0, i - 24)
      val trailing = counts.slice(lo, i)
      assert(k === trailing.length.toLong, s"$h: k=$k vs ${trailing.length}")
      assert(s24 === trailing.sum, s"$h: s24=$s24 vs ${trailing.sum}")
      val expect = if (trailing.length >= 12 && c * trailing.length > trailing.sum * 2) 1 else 0
      assert(flag === expect, s"$h: flag=$flag expected=$expect")
    }
    assert(rows.map(_._5).sum > 0, "no spike fired at sf0.01 — vacuous data")
  }

  test("MAD outlier flags equal an independent median/MAD recomputation") {
    val rows = ext.TimeOps.madOutlier(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getInt(5)))
    assert(rows.nonEmpty)
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((s.length + 1) / 2 - 1) // rank (n+1) div 2, 1-based
    }
    rows.groupBy(_._1).foreach { case (et, days) =>
      val xs = days.map(_._3)
      val med = lowerMedian(xs)
      val mad = lowerMedian(xs.map(x => math.abs(x - med)))
      days.foreach { case (_, d, x, gotMed, gotMad, flag) =>
        assert(gotMed == med, s"$et/$d median")
        assert(gotMad == mad, s"$et/$d mad")
        assert(flag == (if (math.abs(x - med) > 3 * mad) 1 else 0), s"$et/$d flag")
      }
    }
    // both classes populated: at least one outlier and one normal day
    assert(rows.exists(_._6 == 1) && rows.exists(_._6 == 0),
      "MAD outlier test is vacuous at sf0.01")
  }
}
