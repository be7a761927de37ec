package graft

import org.apache.spark.sql.functions._

/** Invariants for graph_components (hash-min + pointer-jumping CC over
  * the mutual-kNN graph): the label assignment must be a valid
  * connected-component partition of the `mu` edge set, with the min
  * member as each component's label.
  */
class GraphComponentsSpec extends SparkSpec {

  private lazy val comp =
    ext.Graph.components(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val edges =
    ext.Similarity.knnMutual(spark, sf0001).select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("every node is labeled exactly once") {
    val n = Tables.embeddings(spark, sf0001).count()
    assert(comp.size === n)
  }

  test("edge endpoints always share a component") {
    assert(edges.nonEmpty, "no mutual edges — invariants vacuous")
    for ((a, b) <- edges)
      assert(comp(a) === comp(b), s"edge ($a,$b) split across components")
  }

  test("component label is the minimum member id") {
    comp.groupBy(_._2).foreach { case (lab, members) =>
      assert(lab === members.keys.min,
             s"component $lab labeled above its min member")
    }
  }

  test("labels match a driver-side union-find ground truth") {
    // independent reference: classic union-find over the same edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    for ((v, lab) <- comp) {
      val expect = if (parent.contains(v)) find(v) else v
      assert(lab === expect, s"node $v: got $lab, union-find says $expect")
    }
  }
}
