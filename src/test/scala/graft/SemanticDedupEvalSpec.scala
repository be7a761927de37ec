package graft

/** dedup_semantic_eval invariants: precision must be exactly 1.0 (a
  * same-cell drop pair IS a true near-dup pair — any lower value means
  * the eval or the dedup drifted), recall is bounded by 1.0, and the
  * probe/hit counts must be internally consistent. */
class SemanticDedupEvalSpec extends SparkSpec {

  private lazy val r = ext.Similarity.semanticDedupEval(spark, sf0001).head()

  test("precision is 1.0 by construction, recall bounded") {
    val (nTruth, nPred, nHit) =
      (r.getAs[Long]("n_truth"), r.getAs[Long]("n_pred"), r.getAs[Long]("n_hit"))
    assert(r.getAs[Long]("n_probes") === 100L)
    assert(nHit <= nTruth && nHit <= nPred)
    if (nPred > 0)
      assert(r.getAs[Long]("precision_micro") === 1000000L,
             s"same-cell drop was not a true dup: $r")
    assert(r.getAs[Long]("recall_micro") <= 1000000L)
    assert(nTruth > 0, "no true near-dups in probe sample — eval vacuous")
  }

  test("hits equal the intersection of decisions and truth, recomputed independently") {
    import org.apache.spark.sql.functions._
    val dropped = ext.Similarity.semanticDedup(spark, sf0001)
      .filter(col("vec_id") < 100 && col("keep") === 0)
      .collect().map(_.getLong(0)).toSet
    assert(r.getAs[Long]("n_pred") === dropped.size.toLong)
  }
}
