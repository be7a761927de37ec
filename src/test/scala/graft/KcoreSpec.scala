package graft

/** k-core peeling vs an independent driver-side reference: the 3-round
  * relational peel must equal a from-scratch Scala peel of the same
  * mutual-kNN edges, the converged core must be contained in the
  * 3-round survivor set, and degree-<k nodes must be gone after
  * round 1. */
class KcoreSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  private lazy val edges: Seq[(Long, Long)] =
    ext.Similarity.knnMutual(spark, sf001).select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def und: Seq[(Long, Long)] = edges ++ edges.map(_.swap)

  private def degIn(surv: Set[Long]): Map[Long, Int] =
    und.filter { case (u, v) => surv(u) && surv(v) }
      .groupBy(_._1).view.mapValues(_.size).toMap

  private def peel(survIn: Set[Long], rounds: Int): Set[Long] = {
    var surv = survIn
    for (_ <- 1 to rounds)
      surv = degIn(surv).filter(_._2 >= 2).keySet
    surv
  }

  test("3-round kcore equals the driver reference; converged core contained") {
    val all = und.map(_._1).toSet
    val ref3 = peel(all, 3)
    // run the driver peel to convergence
    var conv = all
    var prev = Set.empty[Long]
    while (conv != prev) { prev = conv; conv = peel(conv, 1) }
    assert(conv.subsetOf(ref3), "converged core must survive any fixed peel")

    val got = ext.Graph.kcore(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got.keySet == all, "kcore must cover every graph node")
    val refDeg = degIn(ref3)
    got.foreach { case (id, (ic, cd)) =>
      assert((ic == 1) == ref3(id), s"in_core mismatch on $id")
      assert(cd == refDeg.getOrElse(id, 0).toLong, s"core_deg mismatch on $id")
    }
    // the screen must actually do something, and keep something
    assert(ref3.nonEmpty && ref3.size < all.size,
      "fixture peels nothing (or everything) — test vacuous")
  }

  test("degree-deficient nodes never survive round 1") {
    val d0 = degIn(und.map(_._1).toSet)
    val got = ext.Graph.kcore(spark, sf001).collect()
      .filter(_.getInt(1) == 1).map(_.getLong(0)).toSet
    got.foreach(id => assert(d0(id) >= 2))
  }
}
