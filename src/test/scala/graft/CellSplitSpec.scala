package graft

import org.apache.spark.sql.functions._

/** Occupancy-triggered cell split (Similarity.cellSplit): the report
  * must partition hot cells exactly (children sum to the parent), leave
  * cool cells untouched, and actually shrink the largest shard — the
  * property that keeps in-cell pair candidates out of the occupancy²
  * regime. sf0.01 is the natural fixture: 500 vectors / 16 cells put
  * the mean occupancy AT the 32 threshold, so both branches occur. */
class CellSplitSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  private lazy val rows =
    ext.Similarity.queries("sim_cell_split")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
                 r.getLong(3), r.getLong(4), r.getLong(5)))

  test("split cells partition exactly; cool cells pass through") {
    assert(rows.nonEmpty)
    // totals tie to the home assignment
    val n = ext.Similarity.queries("sim_ivf_assign")(spark, sf001).count()
    assert(rows.map(_._2).sum === n, "occupancies do not partition the corpus")
    // both branches occur on the natural corpus (threshold = the mean)
    assert(rows.exists(_._3 === 1), "no cell split — threshold vacuous")
    assert(rows.exists(_._3 === 0), "every cell split — threshold vacuous")
    rows.foreach { case (cell, before, split, c0, c1, maxAfter) =>
      if (split === 1) {
        assert(before > ext.Similarity.SplitOccupancy)
        assert(c0 + c1 === before, s"cell $cell: children $c0+$c1 != $before")
        assert(c0 >= 1L && c1 >= 1L,
          s"cell $cell: a sub-seed lost its own membership")
        assert(maxAfter === math.max(c0, c1))
        assert(maxAfter < before, s"cell $cell: split bought nothing")
      } else {
        assert(before <= ext.Similarity.SplitOccupancy)
        assert((c0, c1, maxAfter) === ((0L, 0L, before)))
      }
    }
  }

  test("split assignment is the nearest-sub-seed rule, recomputed") {
    // driver recompute of one split cell: members go to the nearer of
    // the two lowest-id members (ties to sub 0), 6-dp cosine
    val hot = rows.filter(_._3 === 1).map(_._1).min
    val home = ext.Similarity.queries("sim_ivf_assign")(spark, sf001)
      .filter(col("cell") === hot).select("vec_id")
      .collect().map(_.getLong(0)).sorted
    val emb = Tables.embeddings(spark, sf001)
      .filter(col("vec_id").isin(home: _*))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val raw = dot / (math.sqrt(a.map(x => x * x).sum) *
                       math.sqrt(b.map(x => x * x).sum))
      // Num.rnd mirror: Spark round() is BigDecimal HALF_UP
      BigDecimal(raw * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
    }
    val Seq(s0, s1) = home.take(2).toSeq
    val expect0 = home.count { v =>
      cos(emb(v), emb(s0)) >= cos(emb(v), emb(s1))
    }
    val got = rows.find(_._1 === hot).get
    assert(got._4 === expect0.toLong,
      s"cell $hot child-0 size ${got._4} != recomputed $expect0")
  }

  test("split serve: probes touching only cool cells get the identical " +
       "top-3 as the unsplit serve") {
    // the ncell mapping is bijective and cool cells keep their members,
    // so a probe whose NProbe probed cells are ALL cool sees the exact
    // same candidate set in both indexes (caps never bind at sf0.01
    // occupancy) — its served top-3 must be bit-identical
    val hotCells = rows.filter(_._3 === 1).map(_._1).toSet
    // driver brute of each probe's NProbe=2 probed cells (500×16 at
    // sf0.01) — the ranking the serve starts from
    val emb = Tables.embeddings(spark, sf001)
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val raw = dot / (math.sqrt(a.map(x => x * x).sum) *
                       math.sqrt(b.map(x => x * x).sum))
      BigDecimal(raw * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
    }
    val cells = (0L until 16L).toSeq
    val probedCells = emb.keys.map { v =>
      v -> cells.map(c => (c, cos(emb(v), emb(c))))
        .sortBy { case (c, s) => (-s, c) }.take(2).map(_._1).toSet
    }.toMap
    val coolProbes = probedCells.collect {
      case (v, pc) if pc.intersect(hotCells).isEmpty => v
    }.toSet
    assert(coolProbes.nonEmpty, "no all-cool probe — vacuous fixture")
    assert(probedCells.exists(_._2.intersect(hotCells).nonEmpty),
      "no probe touches a hot cell — vacuous fixture")
    def served(q: String) =
      ext.Similarity.queries(q)(spark, sf001)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .filter(t => coolProbes.contains(t._1)).toSet
    assert(served("sim_split_topk") === served("sim_ivf_topk"),
      "an all-cool probe's top-3 drifted between the split and unsplit serves")
  }
}
