package graft

/** Local clustering coefficient (Graph.clusteringCoeff): per-node
  * triangle counts must tie out against graph_triangles (each triangle
  * contributes to exactly 3 nodes), and the whole frame must equal a
  * brute-force driver-side recompute from the mutual edge list.
  */
class ClusteringCoeffSpec extends SparkSpec {

  private lazy val edges = ext.Similarity.queries("sim_knn_mutual")(spark, sf0001)
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  private lazy val got = ext.Graph.queries("graph_clustering_coeff")(spark, sf0001)
    .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
    .toMap

  test("triangle counts tie out: sum over nodes = 3 x |triangle list|") {
    val nTri = ext.Graph.queries("graph_triangles")(spark, sf0001).count()
    assert(got.values.map(_._2).sum === 3 * nTri)
    assert(nTri > 0, "fixture has no triangles — cc vacuous")
  }

  test("frame equals brute-force recompute from the mutual edge list") {
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val expect = adj.map { case (u, ns) =>
      val deg = ns.size.toLong
      val tri = ns.toSeq.combinations(2)
        .count { case Seq(x, y) =>
          edges.contains((math.min(x, y), math.max(x, y)))
        }.toLong
      val cc = if (deg < 2) 0L else 2 * tri * 1000000L / (deg * (deg - 1))
      u -> ((deg, tri, cc))
    }.toMap
    assert(got === expect)
    assert(got.values.forall { case (_, _, cc) => cc >= 0 && cc <= 1000000 })
    // non-degenerate fixture: some node strictly between 0 and 1
    assert(got.values.exists { case (_, _, cc) => cc > 0 && cc < 1000000 })
  }
}
