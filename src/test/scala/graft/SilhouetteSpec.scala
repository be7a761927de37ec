package graft

import graft.ext.Similarity

/** Simplified silhouette (Similarity.silhouette): per-cell rows must
  * equal a driver-side recompute from raw embeddings (stub quantizer =
  * first ivfCells(n) vectors, 6-dp cosine ranking, integer micro out),
  * and every per-vector score must sit in [0, 1e6] (home = argmax ⇒
  * a ≤ b by construction).
  */
class SilhouetteSpec extends SparkSpec {

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }
  /** Num.rnd's half-away-from-zero at 6 dp. */
  private def rnd6(x: Double): Double = {
    val y = x * 1e6
    (if (y < 0) -math.floor(-y + 0.5) else math.floor(y + 0.5)) / 1e6
  }

  test("per-cell silhouette equals brute recompute; scores in [0, 1e6]") {
    val embs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val cells = Similarity.ivfCells(embs.size.toLong)
    val cents = embs.filter { case (id, _) => id < cells }
    val perVec = embs.toSeq.map { case (id, v) =>
      val nrm = math.sqrt(dot(v, v))
      val ranked = cents.toSeq.map { case (c, cv) =>
        c -> rnd6(dot(v, cv) / (nrm * math.sqrt(dot(cv, cv))))
      }.sortBy { case (c, csim) => (-csim, c) }
      val (home, c1) = ranked.head
      val (_, c2) = ranked(1)
      (home, math.floor((c1 - c2) / (1.0 - c2) * 1e6 + 0.5).toLong)
    }.filter(_ => true) // every sf0.001 runner-up csim < 1 (asserted below)
    val expect = perVec.groupBy(_._1).map { case (cell, xs) =>
      val ss = xs.map(_._2)
      cell -> ((ss.size.toLong, ss.sum / ss.size, ss.min))
    }
    val got = Similarity.silhouette(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expect)
    assert(got.values.map(_._1).sum === embs.size.toLong,
      "every vector must be scored — the c2=1 gate fired on real data")
    perVec.foreach { case (_, s) =>
      assert(s >= 0L && s <= 1000000L, s"s_micro out of [0,1e6]: $s")
    }
    // the eval discriminates: not every cell equally tight
    assert(got.values.map(_._2).toSet.size > 1, "all cells identical — vacuous")
  }
}
