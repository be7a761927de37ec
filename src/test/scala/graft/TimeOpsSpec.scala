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
}
