package graft

import org.apache.spark.sql.functions._

/** Eigenvector centrality (Graph.eigenCentrality): must equal a brute
  * driver-side power iteration with the same integer normalization, and
  * each round's max must pin the 1e6 ceiling.
  */
class EigenCentralitySpec extends SparkSpec {

  test("centrality equals brute normalized power iteration") {
    val mu = ext.Similarity.knnMutual(spark, sf0001)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = mu ++ mu.map(_.swap)
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var x: Map[Long, Long] = adj.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val s = adj.keys.map { v =>
        v -> adj(v).map(u => x(u)).sum
      }.toMap
      val mx = s.values.max
      x = s.view.mapValues(sv => sv * 1000000L / mx).toMap
    }
    val expect = adj.map { case (n, vs) => n -> ((vs.size.toLong, x(n))) }
    val got = ext.Graph.queries("graph_eigen_centrality")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === expect)
    got.values.foreach { case (_, ec) => assert(ec >= 0L && ec <= 1000000L) }
    assert(got.values.exists(_._2 == 1000000L), "no node at the ceiling")
    assert(got.values.map(_._2).toSet.size > 1, "constant centrality — vacuous")
  }
}
