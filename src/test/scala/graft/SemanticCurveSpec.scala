package graft

import org.apache.spark.sql.functions._

/** Pins dedup_semantic_curve: every cell matches a driver-side brute
  * sweep over the trained home-cell assignment (all in-cell pairs,
  * 6-dp cosine, grid cuts), the τ=0.4 row's n_drop equals
  * dedup_semantic's keep=0 count (the dedup and its tuning curve can
  * never diverge), and the curve is monotone in τ. */
class SemanticCurveSpec extends SparkSpec {

  private def rnd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("semantic threshold curve ≡ brute sweep; τ=0.4 ties to dedup_semantic") {
    val emb = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nrm = emb.map { case (k, v) => k -> math.sqrt(dot(v, v)) }
    val cell = ext.Similarity.ivfAssignTrained(spark, sf0001)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val pairs = cell.groupBy(_._2).values.flatMap { members =>
      val ids = members.keys.toSeq.sorted
      for {
        i <- ids.indices; j <- (i + 1) until ids.length
        a = ids(i); b = ids(j)
      } yield (a, b, rnd6(dot(emb(a), emb(b)) / (nrm(a) * nrm(b))))
    }.toSeq

    val grid = Seq(200000L, 300000L, 400000L, 500000L, 600000L, 700000L)
    val nVec = emb.size.toLong
    val expect = grid.map { tm =>
      val tau = tm.toDouble / 1e6
      val surv = pairs.filter(_._3 >= tau)
      val drop = surv.map(_._2).distinct.size.toLong
      tm -> ((surv.size.toLong, drop, drop * 1000000L / nVec))
    }.toMap

    val got = ext.Similarity.semanticCurve(spark, sf0001).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
    }.toMap
    assert(got.keySet === grid.toSet)
    grid.foreach(t => assert(got(t) === expect(t), s"tau $t diverged"))

    // the τ=0.4 row IS the production dedup decision
    val dropAt04 = ext.Similarity.semanticDedup(spark, sf0001)
      .filter(col("keep") === 0).count()
    assert(got(400000L)._2 === dropAt04,
      "τ=0.4 n_drop must equal dedup_semantic's keep=0 count")

    // monotone non-increasing in τ, and the sweep is non-degenerate
    val ps = grid.map(got(_)._1)
    val ds = grid.map(got(_)._2)
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b }, s"pairs: $ps")
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b }, s"drops: $ds")
    assert(ps.head > ps.last, s"flat curve: $ps")
  }
}
