package graft

import org.apache.spark.sql.functions._

/** JL random projection (Similarity.randProj / jlRecallEval): the
  * codegen'd ArrayDot projection must equal an independent HOF-fold
  * recompute against the same ±1 plane literals, and the eval metrics
  * must satisfy their integer identities. */
class RandProjSpec extends SparkSpec {

  test("projection == independent HOF zip_with/aggregate recompute") {
    val got = ext.Similarity.randProj(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    // independent path: interpreted HOF fold (same left-to-right double
    // accumulation ArrayDot guarantees), per plane index 100+k
    val expect = (0 until 16).flatMap { k =>
      val h = array(ext.Similarity.plane(100 + k).map(lit): _*)
      val dot = aggregate(zip_with(col("embedding"), h,
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (s, x) => s + x)
      Tables.embeddings(spark, sf0001)
        .select(col("vec_id"), round(dot * 1e6).cast("long").as("p"))
        .collect().map(r => (r.getLong(0), k) -> r.getLong(1))
    }.toMap
    assert(got == expect)
    // 64 elements in [-1, 1]-ish range: micro-coordinates stay far from
    // the 2^63 envelope the docstring claims (|p| <= 24e6)
    assert(got.values.forall(p => math.abs(p) <= 24000000L))
  }

  test("every vector gets exactly 16 coordinates, k = 0..15") {
    val byVec = ext.Similarity.randProj(spark, sf0001).collect()
      .groupBy(_.getLong(0))
    val n = Tables.embeddings(spark, sf0001).count()
    assert(byVec.size == n)
    byVec.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (0 until 16))
    }
  }

  test("recall eval metric identities on the probe sample") {
    val r = ext.Similarity.jlRecallEval(spark, sf0001, probeN = 10)
      .collect().head
    val (nTruth, nHit, recall) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nTruth == 30)
    assert(nHit >= 0L && nHit <= nTruth)
    assert(recall == nHit * 1000000L / nTruth)
  }
}
