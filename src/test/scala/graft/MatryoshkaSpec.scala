package graft

import org.apache.spark.sql.functions._

/** emb_matryoshka_recall invariants: the prefix ranking must agree with
  * a driver-side recompute from the raw vectors, and recall must be
  * meaningfully between zero and perfect on the untrained synthetic
  * corpus (a degenerate 0 or 1 would make the harness vacuous). */
class MatryoshkaSpec extends SparkSpec {

  test("recall matches a driver-side prefix-cosine recompute") {
    val r = ext.Similarity.matryoshkaRecallEval(spark, sf0001).head()
    val vecs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(row => row.getLong(0) ->
        row.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      // HALF_UP like Num.rnd / DuckDB round — rint would be half-even
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def top3(m: Map[Long, Array[Double]], a: Long): Set[Long] =
      m.keys.filter(_ != a).toSeq
        .map(b => (cos(m(a), m(b)), b))
        .sortBy { case (s, b) => (-s, b) }.take(3).map(_._2).toSet
    val pre = vecs.map { case (k, v) => k -> v.take(16) }
    val probes = vecs.keys.filter(_ < 100).toSeq
    var truthN = 0L; var hitN = 0L
    for (a <- probes) {
      val t = top3(vecs, a); val p = top3(pre, a)
      truthN += t.size; hitN += t.intersect(p).size
    }
    assert(r.getAs[Long]("n_truth") === truthN)
    assert(r.getAs[Long]("n_hit") === hitN)
    assert(r.getAs[Long]("recall_micro") === hitN * 1000000L / truthN)
  }

  test("prefix recall is non-degenerate on the synthetic corpus") {
    val r = ext.Similarity.matryoshkaRecallEval(spark, sf0001).head()
    val recall = r.getAs[Long]("recall_micro")
    assert(recall > 0L, "prefix ranking found nothing — harness vacuous")
    assert(recall < 1000000L,
      "prefix ranking perfect on untrained vectors — suspicious")
  }
}
