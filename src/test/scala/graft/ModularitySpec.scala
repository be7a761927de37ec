package graft

/** Cell modularity (Graph.cellModularity): accounting identities against
  * the edge list and home assignment it composes, plus a brute-force
  * recompute of every per-cell row.
  */
class ModularitySpec extends SparkSpec {

  private lazy val edges = ext.Similarity.queries("sim_knn_mutual")(spark, sf0001)
    .collect().map(r => (r.getLong(0), r.getLong(1)))
  private lazy val home = ext.Similarity.queries("sim_ivf_assign")(spark, sf0001)
    .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
  private lazy val rows = ext.Graph.queries("graph_cell_modularity")(spark, sf0001)
    .collect()
    .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
                              r.getLong(4), r.getLong(5))))
    .toMap

  test("accounting identities: Σd_tot = 2m, Σe_in ≤ m, node partition") {
    val m = edges.length.toLong
    assert(rows.values.map(_._2).sum === 2 * m)
    assert(rows.values.map(_._3).sum <= m)
    val graphNodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.length.toLong
    assert(rows.values.map(_._1).sum === graphNodes)
    // total Q in (-0.5, 1] and the cell partition is non-trivial
    val q = rows.values.map(_._4).sum.toDouble / (4.0 * m * m)
    assert(q > -0.5 && q <= 1.0, s"Q=$q out of range")
    assert(rows.size > 1)
  }

  test("per-cell rows equal a brute-force recompute") {
    val m = edges.length.toLong
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (u, xs) => u -> xs.size.toLong }
    val expect = deg.groupBy { case (u, _) => home(u) }.map { case (c, ds) =>
      val dTot = ds.values.sum
      val eIn = edges.count(e => home(e._1) == c && home(e._2) == c).toLong
      val qNum = 4 * m * eIn - dTot * dTot
      c -> ((ds.size.toLong, dTot, eIn, qNum,
             // Spark `div` truncates toward zero
             BigInt(1000000) * qNum / (4 * m * m) match {
               case x => x.toLong
             }))
    }
    assert(rows === expect)
  }
}
