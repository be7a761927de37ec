package graft

/** kNN majority-vote label eval (Similarity.knnLabelEval): per-label
  * rows must equal a driver-side majority-vote recompute from the
  * production top-k and the label column.
  */
class KnnLabelEvalSpec extends SparkSpec {

  test("per-label accuracy equals brute majority-vote recompute") {
    val topk = ext.Similarity.queries("sim_ivf_topk")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val lbl = Tables.embeddings(spark, sf0001)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pred = topk.groupBy(_._1).map { case (a, ns) =>
      val votes = ns.map(n => lbl(n._2))
        .groupBy(identity).map { case (l, xs) => (l, xs.size) }
      // majority, ties label-ascending
      a -> votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
    }
    val expect = pred.toSeq
      .map { case (a, p) => (lbl(a), p) }
      .groupBy(_._1).map { case (gold, xs) =>
        val n = xs.size.toLong
        val c = xs.count { case (g, p) => g == p }.toLong
        gold -> ((n, c, math.round(100.0 * c / n * 100) / 100.0))
      }
    val got = ext.Similarity.queries("emb_knn_label_eval")(spark, sf0001)
      .collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (l, (n, c, _)) =>
      assert((n, c) === (expect(l)._1, expect(l)._2), s"label $l")
    }
    // the eval is non-vacuous: some label beats chance, none exceeds 100
    assert(got.values.forall(v => v._3 >= 0.0 && v._3 <= 100.0))
    assert(got.values.map(_._2).sum > 0)
  }
}
