package graft

/** Degree assortativity (Graph.degreeAssort): co-moment sums must equal
  * a brute recompute over both edge orientations, and the sqrt-free
  * rational form must equal the classic Pearson formula on the same
  * data (coincident marginals make them identical).
  */
class AssortSpec extends SparkSpec {

  test("co-moments and r_micro equal brute recompute; r within [-1, 1]") {
    val edges = ext.Similarity.queries("sim_knn_mutual")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (u, xs) => u -> xs.size.toLong }
    val dir = edges.flatMap(e => Seq((e._1, e._2), (e._2, e._1)))
    val xs = dir.map { case (u, v) => (deg(u), deg(v)) }
    val n = xs.length.toLong
    val sumX = xs.map(_._1).sum
    val sumXY = xs.map { case (x, y) => x * y }.sum
    val sumX2 = xs.map { case (x, _) => x * x }.sum
    val den = n * sumX2 - sumX * sumX
    val num = n * sumXY - sumX * sumX
    val rMicro =
      if (den == 0) 0L else (BigInt(1000000) * num / den).toLong
    val row = ext.Graph.queries("graph_degree_assort")(spark, sf0001)
      .collect()
    assert(row.length === 1)
    val r = row.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((n, sumX, sumXY, sumX2, rMicro)))
    assert(math.abs(rMicro) <= 1000000)
    // Pearson cross-check: the rational form equals covariance over
    // variance (identical marginals), within float tolerance
    if (den != 0) {
      val mx = sumX.toDouble / n
      val cov = sumXY.toDouble / n - mx * mx
      val vr = sumX2.toDouble / n - mx * mx
      assert(math.abs(cov / vr - rMicro / 1e6) < 1e-5)
    }
  }
}
