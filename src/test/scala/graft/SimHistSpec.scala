package graft

import graft.ext.Similarity

/** Probe-pair cosine histogram (Similarity.simHist): bins must equal a
  * driver-side recompute (6-dp cosine, the exact bin arithmetic), all
  * ten bins must emit, and mass must conserve to 100·(n−1)+…: every
  * (probe, other) pair lands in exactly one bin.
  */
class SimHistSpec extends SparkSpec {

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }
  private def rnd6(x: Double): Double = {
    val y = x * 1e6
    (if (y < 0) -math.floor(-y + 0.5) else math.floor(y + 0.5)) / 1e6
  }

  test("histogram equals brute recompute; all bins emit; mass conserves") {
    val embs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val probes = embs.filter(_._1 < 100)
    val sims = for {
      (a, va) <- probes
      (v, ve) <- embs if v != a
    } yield rnd6(dot(va, ve) / (math.sqrt(dot(va, va)) * math.sqrt(dot(ve, ve))))
    val brute = sims
      .map(s => math.min(math.floor((s + 1.0) * 5).toInt, 9))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = sims.length.toLong
    val got = Similarity.simHist(spark, sf0001).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === (0 until 10).toSet, "all ten bins must emit")
    (0 until 10).foreach { b =>
      assert(got(b)._1 === brute.getOrElse(b, 0L), s"count at bin $b")
      assert(got(b)._2 === got(b)._1 * 1000000L / n, s"share at bin $b")
    }
    assert(got.values.map(_._1).sum === n, "pair mass not conserved")
    assert(got.values.count(_._1 > 0L) > 1, "degenerate one-bin histogram")
  }
}
