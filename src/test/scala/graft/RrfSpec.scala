package graft

import org.apache.spark.sql.functions._

/** Pins `sim_rrf_fusion` against a Scala re-derivation of the FUSION
  * stage at sf0.001. Two production outputs are deliberately reused as
  * inputs rather than re-derived — the packed sign words
  * (`Similarity.signBits`; independence for packWord lives in
  * SignBitsSpec) and the IVF home assignment (only to discover the cell
  * count; assignment independence lives in IvfRecallSpec) — everything
  * downstream is brute: IVF multi-probe ranks (top-2 cells by 6-dp
  * cosine, candidates = probe-cell ∩ home-cell members),
  * brute sign-bit Hamming ranks (xor+popcount over the packed words),
  * integer RRF scores 1e6/(60+r) summed per pair, top-3 under
  * (score desc, b_id asc). Full-table equality — any drift in the leg
  * depth, K, the FULL OUTER join's coalesce, or either leg's tie rule
  * fails the set compare. The frontier cell-tie for the rrf leg lives in
  * GraphSearchSpec (the leg-list lockstep rule). */
class RrfSpec extends SparkSpec {

  private def rnd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("sim_rrf_fusion equals the brute-force fused reference at sf0.001") {
    val emb: Map[Long, Array[Double]] = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nrm = emb.map { case (k, v) => k -> math.sqrt(dot(v, v)) }
    def cos(a: Long, b: Long): Double =
      rnd6(dot(emb(a), emb(b)) / (nrm(a) * nrm(b)))

    // ---- leg A: brute IVF multi-probe ranking (depth 8) ----
    // centroid count rediscovered: every centroid is its own home cell
    // (self-cosine 1), so max(cell) + 1 = C
    val cellCount = ext.Similarity.ivfAssign(spark, sf0001)
      .agg(max("cell")).collect().head.getLong(0) + 1
    val ids = emb.keys.toSeq.sorted
    val cents = ids.filter(_ < cellCount)
    def cellRanks(v: Long): Seq[Long] =
      cents.map(c => (c, cos(v, c))).sortBy { case (c, s) => (-s, c) }
        .map(_._1)
    val probes = ids.map(v => v -> cellRanks(v).take(2)).toMap
    val home = ids.map(v => v -> probes(v).head).toMap
    val legA: Map[Long, Seq[Long]] = ids.filter(_ < 100L).map { a =>
      val cand = for {
        cell <- probes(a)
        b <- ids if b != a && home(b) == cell
      } yield (b, cos(a, b))
      a -> cand.sortBy { case (b, s) => (-s, b) }.take(8).map(_._1)
    }.toMap

    // ---- leg B: brute sign-bit Hamming ranking (depth 8) ----
    val words = ext.Similarity.signBits(spark, sf0001)
      .select("vec_id", "w1", "w2").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def hd(a: Long, b: Long): Int = {
      val (a1, a2) = words(a); val (b1, b2) = words(b)
      java.lang.Long.bitCount(a1 ^ b1) + java.lang.Long.bitCount(a2 ^ b2)
    }
    val legB: Map[Long, Seq[Long]] = ids.filter(_ < 100L).map { a =>
      a -> ids.filter(_ != a).map(b => (b, hd(a, b)))
        .sortBy { case (b, h) => (h, b) }.take(8).map(_._1)
    }.toMap

    // ---- fuse: score = Σ 1e6/(60+rank), top-3 (score desc, b asc) ----
    val expected = (for {
      a <- ids.filter(_ < 100L)
      ra = legA(a).zipWithIndex.map { case (b, i) => b -> (i + 1) }.toMap
      rb = legB(a).zipWithIndex.map { case (b, i) => b -> (i + 1) }.toMap
      scored = (ra.keySet ++ rb.keySet).toSeq.map { b =>
        val s = ra.get(b).map(r => 1000000L / (60 + r)).getOrElse(0L) +
                rb.get(b).map(r => 1000000L / (60 + r)).getOrElse(0L)
        (b, s)
      }
      ((b, s), i) <- scored.sortBy { case (b, s) => (-s, b) }.take(3).zipWithIndex
    } yield (a, b, s, i + 1)).toSet

    val got = ext.Similarity.rrfFusion(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(got === expected,
      s"fusion drifted: missing=${(expected -- got).take(5)} " +
        s"extra=${(got -- expected).take(5)}")
  }
}
