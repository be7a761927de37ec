package graft

/** Pins sim_recall_at_k: the k=3 row must reproduce sim_ivf_recall_eval
  * cell for cell (one truth/screen definition — the curve and the
  * single-point eval can never diverge), hits are monotone
  * non-decreasing in k (prefix-superset property), and truth counts are
  * exactly probeN·k (corpus is far deeper than TruthDepth). */
class RecallAtKSpec extends SparkSpec {

  test("k=3 row ≡ sim_ivf_recall_eval; hits monotone; truth = probeN·k") {
    val curve = ext.Similarity.recallAtK(spark, sf0001).collect().map { r =>
      r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
                       r.getLong(4), r.getLong(5)))
    }.toMap
    assert(curve.keySet === Set(1, 3, 5, 10))

    val eval3 = ext.Similarity.ivfRecallEval(spark, sf0001).collect().head
    val (t3, s3, h3, r3, p3) = (eval3.getLong(0), eval3.getLong(1),
      eval3.getLong(2), eval3.getLong(3), eval3.getLong(4))
    assert(curve(3) === ((t3, s3, h3, r3, p3)),
      "k=3 row diverged from sim_ivf_recall_eval")

    val ks = Seq(1, 3, 5, 10)
    val hits = ks.map(curve(_)._3)
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
      s"hits not monotone in k: $hits")
    val nProbes = Tables.embeddings(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("vec_id") < 100).count()
    ks.foreach { k =>
      assert(curve(k)._1 === nProbes * k, s"n_truth at k=$k")
    }
    // non-degenerate: deeper k surfaces strictly more hits on this corpus
    assert(hits.last > hits.head, s"flat hit curve: $hits")
  }
}
