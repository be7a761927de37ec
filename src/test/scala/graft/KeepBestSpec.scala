package graft

import org.apache.spark.sql.functions._

/** Quality-aware survivor selection (Dedup.keepBest): one survivor per
  * cluster, the survivor is the cluster's max-score member (ties to
  * the lower id), and the changed_pick cell is exactly the disagreement
  * with the min-id rule. */
class KeepBestSpec extends SparkSpec {

  test("survivor = max-score member per cluster; ties and flags exact") {
    val lab = ext.Dedup.queries("dedup_clusters")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sc = ext.TextOps.queries("text_quality_score_trained")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expect = lab.groupBy(_._2).map { case (cluster, members) =>
      val ids = members.keys.toSeq
      val best = ids.map(d => (d, sc(d)))
        .sortBy { case (d, s) => (-s, d) }.head
      cluster -> (best._1, best._2, ids.size.toLong, ids.min)
    }
    val got = ext.Dedup.queries("dedup_keep_best")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toMap
    assert(got.keySet === expect.keySet, "cluster universe drifted")
    got.foreach { case (cluster, (doc, score, size, changed)) =>
      val (eDoc, eScore, eSize, minId) = expect(cluster)
      assert(doc === eDoc, s"cluster $cluster survivor $doc != $eDoc")
      assert(score === eScore)
      assert(size === eSize)
      assert(changed === (if (eDoc != minId) 1 else 0))
    }
    // one survivor per cluster == dedup_keep's cluster count
    val keepN = ext.Dedup.queries("dedup_keep")(spark, sf0001).count()
    assert(got.size.toLong === keepN)
  }
}
