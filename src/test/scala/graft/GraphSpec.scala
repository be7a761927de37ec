package graft

import org.apache.spark.sql.functions._

/** Integer PageRank over the purchase graph: structural invariants the
  * oracle's value-hash can't articulate — degree/rank monotonic
  * tendency, exact rerun determinism, and bipartite node accounting. */
class GraphSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  private lazy val ranks = ext.Graph.pagerank(spark, sf001).collect()

  test("pagerank covers every node of both partitions, all ranks positive") {
    val (cs, ss) = ranks.partition(_.getString(0).startsWith("c"))
    assert(cs.nonEmpty && ss.nonEmpty, "one bipartite side is empty")
    assert(ranks.forall(_.getLong(2) > 0L), "non-positive rank")
    // every node came from an edge, so degree >= 1
    assert(ranks.forall(_.getLong(1) >= 1L))
  }

  test("suppliers out-rank customers (they aggregate many customers' mass)") {
    val (cs, ss) = ranks.partition(_.getString(0).startsWith("c"))
    val avgS = ss.map(_.getLong(2)).sum / ss.length
    val avgC = cs.map(_.getLong(2)).sum / cs.length
    assert(avgS > avgC * 5,
           s"supplier avg rank $avgS not dominating customer avg $avgC")
    // and within suppliers, the max-degree one is at or near the top:
    // with uniform edge semantics rank is degree-driven
    val topByRank = ss.maxBy(_.getLong(2)).getString(0)
    val maxDeg = ss.map(_.getLong(1)).max
    val topDeg = ss.filter(_.getString(0) == topByRank).head.getLong(1)
    assert(topDeg >= (maxDeg * 9) / 10,
           s"top-ranked supplier has degree $topDeg vs max $maxDeg")
  }

  test("pagerank is exactly rerun-deterministic (pure integer rounds)") {
    val again = ext.Graph.pagerank(spark, sf001).collect()
    val a = ranks.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = again.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.sameElements(b), "integer pagerank differed across reruns")
  }

  test("a round conserves at most the injected mass (floor-division leaks down)") {
    // every contribution floors, every damped sum floors: total mass
    // after a round can never exceed n*150000 + 0.85 * previous mass
    val n = ranks.length.toLong
    val mass = ranks.map(_.getLong(2)).sum
    val bound = n * 150000L + (85L * n * 1000000L) / 100L
    assert(mass <= bound, s"mass $mass exceeds damping bound $bound")
  }
}
