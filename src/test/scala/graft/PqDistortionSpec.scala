package graft

/** PQ distortion report (Similarity.pqDistortion): must be exactly the
  * per-sub micronized aggregate of the memoized codes frame, with every
  * subspace covering every vector.
  */
class PqDistortionSpec extends SparkSpec {

  test("rows equal a recompute from pq codes; full per-sub coverage") {
    val codes = ext.Similarity.queries("sim_pq_codes")(spark, sf0001)
      .collect().map(r => (r.getInt(1), math.round(r.getDouble(3) * 1e6)))
    val expect = codes.groupBy(_._1).map { case (s, xs) =>
      val us = xs.map(_._2)
      s -> ((us.length.toLong, us.sum, us.max, us.sum / us.length))
    }
    val got = ext.Similarity.queries("sim_pq_distortion")(spark, sf0001)
      .collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === expect)
    val nVecs = Tables.embeddings(spark, sf0001).count()
    assert(got.size === 8)
    assert(got.values.forall(_._1 === nVecs))
    // distortion is non-vacuous: some subspace has real error
    assert(got.values.exists(_._2 > 0))
  }
}
