package graft

import org.apache.spark.sql.functions._

/** Event-type transition matrix (TimeOps.transitions), per-user entropy
  * (TimeOps.userEntropy), and group mode (Aggs.modeAgg): each must equal
  * a brute driver-side recompute under the same integer disciplines.
  */
class TransitionsSpec extends SparkSpec {

  test("transitions equal brute per-user lag recompute; shares bounded") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
              col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { xs =>
      val s = xs.sortBy(t => (t._2, t._3))
      s.sliding(2).collect { case Array(a, b) => (a._4, b._4) }
    }.toSeq
    val cnt = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tot = pairs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val got = ext.TimeOps.queries("time_transitions")(spark, sf0001)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
                 (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet === cnt.keySet)
    got.foreach { case ((p, n), (c, t, share)) =>
      assert(c === cnt((p, n)))
      assert(t === tot(p))
      assert(share === c * 1000000L / t)
    }
    // each source row's shares sum to ≤ 1e6 (floor division loses < |row|)
    got.groupBy(_._1._1).foreach { case (p, rows) =>
      val s = rows.values.map(_._3).sum
      assert(s <= 1000000L && s > 1000000L - rows.size)
    }
  }

  test("user entropy equals brute micronized-ln recompute; bounds hold") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def lnM(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val expect = ev.groupBy(_._1).map { case (u, xs) =>
      val cs = xs.groupBy(_._2).values.map(_.size.toLong)
      val n = cs.sum
      u -> ((n, cs.size.toLong, lnM(n) - cs.map(c => c * lnM(c)).sum / n))
    }
    val got = ext.TimeOps.queries("time_user_entropy")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expect)
    // 0 ≤ H ≤ ln(n_types) + rounding slack
    got.values.foreach { case (_, k, h) =>
      assert(h >= -1L && h <= lnM(k) + 1L)
    }
    assert(got.values.exists(_._3 > 0L), "all-zero entropy — vacuous fixture")
  }

  test("session ids tie out against the session_window aggregate") {
    val ids = ext.TimeOps.queries("time_session_ids")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val sessions = ext.TimeOps.queries("time_session")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // same session count and same per-session size multiset as the
    // session_window aggregation (different composition, same 5-min rule)
    val bySession = ids.groupBy(t => (t._1, t._3)).map(_._2.length.toLong)
    assert(bySession.size === sessions.length)
    assert(bySession.toSeq.sorted === sessions.map(_._2).sorted.toSeq)
    // exactly one start flag per session; ordinals start at 1, contiguous
    ids.groupBy(t => (t._1, t._3)).values
      .foreach(g => assert(g.count(_._4 == 1) === 1))
    ids.groupBy(_._1).values.foreach { g =>
      val sids = g.map(_._3).distinct.sorted
      assert(sids === (1L to sids.max))
    }
  }

  test("mode equals brute (count desc, value asc) argmax per group") {
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expect = o.groupBy(_._1).map { case (s, xs) =>
      val best = xs.groupBy(_._2).map { case (p, v) => (p, v.size.toLong) }
        .toSeq.sortBy { case (p, c) => (-c, p) }.head
      s -> best
    }
    val got = ops.Aggs.queries("agg_mode")(spark, sf0001)
      .collect().map(r => (r.getString(0), (r.getString(1), r.getLong(2)))).toMap
    assert(got === expect)
  }
}
