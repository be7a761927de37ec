package graft

import org.apache.spark.sql.functions._

/** TTR / hapax share (TextOps.ttr) and the shard plan
  * (TextOps.shardPlan): brute recomputes + structural invariants.
  */
class CorpusExtrasSpec extends SparkSpec {

  test("ttr equals brute recompute; hapax ≤ types ≤ tokens") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.map { case (id, t) =>
      val cs = t.split(" ").groupBy(identity).map(_._2.length.toLong)
      val n = cs.sum; val ty = cs.size.toLong; val hp = cs.count(_ == 1L).toLong
      id -> ((n, ty, hp, ty * 1000000L / n, hp * 1000000L / n))
    }.toMap
    val got = ext.TextOps.queries("text_ttr")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
                                r.getLong(4), r.getLong(5))))
      .toMap
    assert(got === expect)
    got.values.foreach { case (n, ty, hp, ttr, hpx) =>
      assert(hp <= ty && ty <= n)
      assert(ttr <= 1000000L && hpx <= ttr)
    }
    assert(got.values.map(_._4).toSet.size > 1, "constant TTR — vacuous")
  }

  test("shard plan covers every doc; shares sum to ~1e6; dev consistent") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def saltOrd(id: Long): Long =
      math.floorMod(math.floorMod(id, 2147483648L) * 2654435761L, 2147483648L)
    val expect = docs.groupBy { case (id, _) => (saltOrd(id) % 32L).toInt }
      .map { case (s, xs) => s -> ((xs.size.toLong, xs.map(_._2).sum)) }
    val tot = docs.map(_._2).sum
    val got = ext.TextOps.queries("corpus_shard_plan")(spark, sf0001)
      .collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3),
                               r.getLong(4))))
      .toMap
    assert(got.view.mapValues(v => (v._1, v._2)).toMap === expect)
    assert(got.values.map(_._1).sum === docs.length.toLong)
    assert(got.values.map(_._2).sum === tot)
    val shareSum = got.values.map(_._3).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - got.size)
    got.foreach { case (_, (_, st, _, dev)) =>
      assert(dev === (st * 32000000L - tot * 1000000L) / tot)
    }
  }
}
