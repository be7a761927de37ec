package graft

import org.apache.spark.sql.functions._

/** Exact positional selection: per-group median (Aggs.medianAgg) and
  * per-type value quantiles (TimeOps.valueQuantiles) must equal brute
  * sorted-pick recomputes — the values are stored doubles selected, not
  * computed, so equality is exact.
  */
class MedianQuantileSpec extends SparkSpec {

  test("median equals brute sorted lower-median pick") {
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val expect = o.groupBy(_._1).map { case (p, xs) =>
      val s = xs.sortBy(t => (t._2, t._3))
      p -> ((s.length.toLong, s((s.length + 1) / 2 - 1)._2))
    }
    val got = ops.Aggs.queries("agg_median")(spark, sf0001)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got === expect)
  }

  test("value quantiles equal brute ceil-rank picks; ordered p50≤p90≤p99") {
    val e = Tables.events(spark, sf0001)
      .select(col("event_type"), col("value"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val expect = e.groupBy(_._1).map { case (t, xs) =>
      val s = xs.sortBy(x => (x._2, x._3)).map(_._2)
      val n = s.length.toLong
      def pick(q: Long) = s(((n * q + 99) / 100 - 1).toInt)
      t -> ((n, pick(50), pick(90), pick(99)))
    }
    val got = ext.TimeOps.queries("time_value_quantiles")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0),
                 (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got === expect)
    got.values.foreach { case (_, p50, p90, p99) =>
      assert(p50 <= p90 && p90 <= p99)
    }
  }

  test("HHI equals brute exact-cents recompute; 1/n ≤ HHI ≤ 1 bounds") {
    val o = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
    val seg = Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val expect = o.groupBy(t => seg(t._1)).map { case (s, xs) =>
      val perCust = xs.groupBy(_._1).values.map(_.map(_._2).sum).toSeq
      val tot = perCust.map(BigInt(_)).sum
      val ssq = perCust.map(c => BigInt(c) * BigInt(c)).sum
      s -> ((perCust.size.toLong, tot.toLong,
             ((ssq * 1000000) / (tot * tot)).toLong))
    }
    val got = ops.Aggs.queries("agg_hhi")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expect)
    got.values.foreach { case (n, _, h) =>
      assert(h >= 1000000L / n - 1 && h <= 1000000L)
    }
  }

  test("gini equals brute rank-weighted recompute; bounds; HHI coherence") {
    val o = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
    val seg = Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val expect = o.groupBy(t => seg(t._1)).map { case (s, xs) =>
      val perCust = xs.groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .toSeq.sortBy { case (k, c) => (c, k) }
      val n = perCust.size.toLong
      val tot = perCust.map(t => BigInt(t._2)).sum
      val wsum = perCust.zipWithIndex
        .map { case ((_, c), i) => BigInt(i + 1) * BigInt(c) }.sum
      val g = ((wsum * 2000000) / (BigInt(n) * tot)).toLong -
        (n + 1) * 1000000L / n
      s -> ((n, tot.toLong, g))
    }
    val got = ops.Aggs.queries("agg_gini")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expect)
    got.values.foreach { case (_, _, g) =>
      assert(g >= -2L && g < 1000000L)
    }
  }

  test("per-source length quantiles equal brute ceil-rank picks") {
    val d = Tables.documents(spark, sf0001)
      .select(col("source"), col("doc_id"),
              size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = d.groupBy(_._1).map { case (s, xs) =>
      val v = xs.sortBy(x => (x._3, x._2)).map(_._3)
      val n = v.length.toLong
      def pick(q: Long) = v(((n * q + 99) / 100 - 1).toInt)
      s -> ((n, pick(50), pick(90), pick(99)))
    }
    val got = ext.TextOps.queries("text_len_quantiles")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0),
                 (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === expect)
    got.values.foreach { case (_, p50, p90, p99) =>
      assert(p50 <= p90 && p90 <= p99)
    }
  }

  test("2-hop reach equals brute BFS-2 recompute; reach ≥ degree") {
    val mu = ext.Similarity.knnMutual(spark, sf0001)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = mu ++ mu.map(_.swap)
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = adj.map { case (u, n1) =>
      val n2 = n1.flatMap(v => adj(v)) - u
      u -> ((n1.size.toLong, (n1 ++ n2).size.toLong))
    }
    val got = ext.Graph.queries("graph_2hop_reach")(spark, sf0001)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === expect)
    got.values.foreach { case (deg, reach) => assert(reach >= deg) }
    assert(got.values.exists { case (d, r) => r > d },
           "no node reaches beyond its neighbors — vacuous")
  }
}
