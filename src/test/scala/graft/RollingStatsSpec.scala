package graft

/** Rolling stats: invariants (variance numerator nonneg, window warmup,
  * non-vacuous band breaks) + exact equality with a from-scratch driver
  * recompute of one partition. */
class RollingStatsSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  private lazy val rows = ext.TimeOps.rollingStats(spark, sf001).collect()
    .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
               r.getLong(4), r.getLong(5), r.getLong(6), r.getInt(7)))

  test("variance numerator nonneg; baseline windows ramp 0..5; breaks exist") {
    assert(rows.nonEmpty)
    assert(rows.forall(_._7 >= 0), "negative variance numerator")
    assert(rows.forall(r => r._5 >= 0 && r._5 <= 5))
    assert(rows.count(_._8 == 1) > 0, "no band break fired — vacuous")
    // under-2-row baselines are gated off: no variance estimate, no flag
    rows.filter(_._5 < 2).foreach(r => assert(r._8 == 0))
  }

  test("exact equality with a driver recompute of one event_type") {
    import org.apache.spark.sql.functions._
    val t = rows.head._1
    // reference order uses the RAW microsecond ts (the formatted output
    // column truncates to seconds and must not drive the reference sort)
    val seq = Tables.events(spark, sf001)
      .filter(col("event_type") === t)
      .select(col("ts").cast("long").as("tsus"), col("event_id"),
              round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(r => (r._1, r._2))
    val cs = seq.map(_._3)
    val ref = seq.zipWithIndex.map { case ((_, id, c), i) =>
      val w = cs.slice(math.max(0, i - 5), i) // the 5 PRECEDING rows
      val vn = w.length.toLong * w.map(x => x * x).sum - w.sum * w.sum
      val dev = c * w.length.toLong - w.sum
      id -> ((w.length.toLong, w.sum, vn,
              if (w.length >= 2 && dev * dev > 9 * vn) 1 else 0))
    }.toMap
    val mine = rows.filter(_._1 == t)
    assert(mine.length == ref.size)
    mine.foreach { case (_, _, id, _, n, sc, vn, brk) =>
      val (rn, rsc, rvn, rbrk) = ref(id)
      assert(n == rn && sc == rsc && vn == rvn && brk == rbrk,
        s"mismatch on event $id")
    }
  }
}
