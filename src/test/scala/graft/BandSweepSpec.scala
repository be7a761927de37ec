package graft

/** dedup_band_sweep invariants: candidate volume and recall are
  * monotone in the band count (the S-curve direction), ground truth is
  * configuration-independent, and the production 8×4 row reproduces
  * dedup_minhash_eval exactly. */
class BandSweepSpec extends SparkSpec {

  private lazy val rows =
    ext.Dedup.bandSweep(spark, sf0001).collect()
      .map(r => r.getInt(0) -> (r.getInt(1), r.getLong(2), r.getLong(3),
                                r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap

  test("candidate volume and recall are monotone in band count") {
    assert(rows.keySet === Set(4, 8, 16))
    assert(rows(4)._1 === 8 && rows(8)._1 === 4 && rows(16)._1 === 2)
    val Seq(c4, c8, c16) = Seq(4, 8, 16).map(rows(_)._3)
    assert(c4 <= c8 && c8 <= c16, "candidate volume not monotone in bands")
    val Seq(r4, r8, r16) = Seq(4, 8, 16).map(rows(_)._5)
    assert(r4 <= r8 && r8 <= r16, "recall not monotone in bands")
    val truths = Seq(4, 8, 16).map(rows(_)._2).toSet
    assert(truths.size === 1, "ground truth depends on banding — bug")
  }

  test("the production 8x4 row reproduces dedup_minhash_eval") {
    val eval = ext.Dedup.minhashEval(spark, sf0001).head()
    val (_, nTruth, nCand, nHit, recall, precision) = rows(8)
    assert(nTruth === eval.getAs[Long]("n_truth"))
    assert(nCand === eval.getAs[Long]("n_cand"))
    assert(nHit === eval.getAs[Long]("n_hit"))
    assert(recall === eval.getAs[Long]("recall_micro"))
    assert(precision === eval.getAs[Long]("precision_micro"))
  }
}
