package graft

/** sim_nprobe_sweep invariants: monotone recall and candidate volume in
  * nprobe, and the nprobe=2 row must reproduce sim_ivf_recall_eval's
  * numbers exactly (same probe sample, same cap, same index — the sweep
  * is the production configuration's own row, not a parallel
  * implementation that can drift). */
class NprobeSweepSpec extends SparkSpec {

  private lazy val rows =
    ext.Similarity.nprobeSweep(spark, sf0001).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
                                r.getLong(4), r.getLong(5))).toMap

  test("recall and candidate volume are monotone in nprobe") {
    assert(rows.keySet === Set(1, 2, 4))
    val Seq(r1, r2, r4) = Seq(1, 2, 4).map(rows)
    assert(r1._1 <= r2._1 && r2._1 <= r4._1, "candidate volume not monotone")
    assert(r1._5 <= r2._5 && r2._5 <= r4._5, "recall not monotone")
    assert(r1._2 === r2._2 && r2._2 === r4._2, "ground truth differs across k")
    assert(r4._5 > 0, "zero recall at nprobe=4 — sweep vacuous")
  }

  test("nprobe=2 row reproduces the production recall eval") {
    val eval = ext.Similarity.ivfRecallEval(spark, sf0001).head()
    val (_, nTruth, nScreen, nHit, recall) = rows(2)
    assert(nTruth === eval.getAs[Long]("n_truth"))
    assert(nScreen === eval.getAs[Long]("n_screen"))
    assert(nHit === eval.getAs[Long]("n_hit"))
    assert(recall === eval.getAs[Long]("recall_micro"))
  }
}
