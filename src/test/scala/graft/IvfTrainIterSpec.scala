package graft

import graft.ext.Similarity
import org.apache.spark.sql.{functions => F}

/** Iterated Lloyd IVF training: convergence behavior of the real
  * trajectory plus the early-stop path on a synthetic corpus.
  *
  * The sf0.01 assertions double as the ORACLE LOCKSTEP GUARD: the DuckDB
  * oracle unrolls exactly `LloydMaxRounds` steps, which matches the
  * adaptive Spark loop only while the early-stop never fires on the
  * verify corpus — every executed round must move at least one centroid.
  */
class IvfTrainIterSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("sf0.01 trajectory: runs all rounds, movement positive and non-increasing") {
    val hist = Similarity.ivfTrainHist(spark, dir)
      .groupBy("iter")
      .agg(F.max("d2").as("mx"), F.sum("d2").as("sm"))
      .orderBy("iter")
      .collect()
    assert(hist.length === Similarity.LloydMaxRounds,
      s"expected ${Similarity.LloydMaxRounds} executed rounds, got " +
        s"${hist.length} — early stop fired at sf0.01, so the static " +
        "unrolled oracle is OUT OF LOCKSTEP; re-derive both")
    hist.foreach { r =>
      assert(r.getDouble(1) > 0,
        s"round ${r.getInt(0)} moved nothing — lockstep guard violated")
    }
    // Lloyd movement contracts on this data by orders of magnitude per
    // round (0.63 → 0.017 → 0.0067 at sf0.01); pin non-increase plus a
    // real overall contraction so a diverging loop fails loudly
    val maxes = hist.map(_.getDouble(1))
    maxes.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"per-round max d2 increased: ${maxes.mkString(", ")}")
    }
    assert(maxes.last < maxes.head / 10,
      s"no real contraction across rounds: ${maxes.mkString(", ")}")
  }

  test("final centroids = last round of the trajectory, one row per (cell, dim)") {
    val fin = Similarity.ivfTrainIter(spark, dir)
    val cells = fin.select("cell").distinct().count()
    assert(fin.count() === cells * 64)
    // trained-once centroids (round 1) must differ from the converged set
    val r1 = Similarity.ivfTrain(spark, dir)
    assert(fin.exceptAll(r1.select("cell", "pos", "m")).count() > 0,
      "iterated training produced exactly the one-step centroids")
  }

  test("early stop: a corpus already at its centroids converges before the cap") {
    import spark.implicits._
    val v0 = Array(0.1f, 0.7f, 0.3f, 0.9f)
    val v1 = Array(0.9f, 0.2f, 0.8f, 0.1f)
    val emb = Seq(
      0L -> v0, 1L -> v1, 2L -> v0, 3L -> v1, 4L -> v0, 5L -> v1
    ).toDF("vec_id", "embedding")
    val traj = Similarity.lloydTrajectoryOf(emb, cells = 2, round1 = None)
    val lastIter = traj.agg(F.max("iter")).head().getInt(0)
    // round 1 moves (raw float seeds → 6-dp-rounded means), round 2
    // reproduces round 1 exactly (same assignment over identical copies)
    // → movement 0 → stop with the round budget unspent
    assert(lastIter === 2,
      s"expected convergence at round 2 (cap ${Similarity.LloydMaxRounds}), got $lastIter")
    val last = traj.filter(F.col("iter") === lastIter)
      .withColumnRenamed("m", "lm")
    val prev = traj.filter(F.col("iter") === lastIter - 1)
    val movedRows = last.join(prev, Seq("cell", "pos"))
      .filter(F.col("lm") =!= F.col("m")).count()
    assert(movedRows === 0, "stop fired while centroids still moved")
  }

  test("outlier report ties out against a driver-side recompute of the assignment") {
    val asg = Similarity.ivfAssignTrained(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = asg.groupBy(_._2).map { case (cell, ms) =>
      val worst = ms.minBy(m => (m._3, m._1))
      (cell, ms.length.toLong,
       ms.map(m => math.round(m._3 * 1e6)).sum, worst._1, worst._3)
    }.toSet
    val got = Similarity.outlierReport(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                 r.getLong(3), r.getDouble(4))).toSet
    assert(got === expected)
    // every vector appears in exactly one cell's membership count
    assert(got.toSeq.map(_._2).sum === asg.length.toLong)
    // non-vacuous: the worst member coheres no better than its cell's
    // mean (n·min ≤ Σ, exact in micro units)
    got.foreach { case (cell, n, sm, _, worst) =>
      assert(math.round(worst * 1e6) * n <= sm,
        s"cell $cell worst member above the cell mean")
    }
  }
}
