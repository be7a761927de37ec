package graft

import org.apache.spark.sql.functions._

/** Corpus anisotropy (Similarity.isotropy): the single row must equal a
  * driver-side BigInt recompute under the dimStats quantization, and
  * Jensen's inequality must hold exactly on the quantized integers:
  * ‖Σx‖² ≤ n·Σ‖x‖² ⇒ aniso_micro ∈ [0, 1e6].
  */
class IsotropySpec extends SparkSpec {

  test("anisotropy equals brute BigInt recompute; Jensen bound holds") {
    val embs = Tables.embeddings(spark, sf0001)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dims = embs.head.length
    val n = embs.length.toLong
    def q(x: Double, s: Double): Long =
      BigDecimal(x * s).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val s1 = Array.tabulate(dims)(d => embs.map(v => q(v(d), 1e6)).sum)
    val s2 = Array.tabulate(dims)(d => embs.map(v => q(v(d) * v(d), 1e12)).sum)
    val num = s1.map(x => BigInt(x) * BigInt(x)).sum
    val den = s2.map(BigInt(_)).sum
    val expect = (n, dims.toLong,
      (den / (BigInt(n) * 1000000)).toLong,
      (num / (BigInt(n) * BigInt(n) * 1000000)).toLong,
      ((num * 1000000) / (BigInt(n) * den)).toLong)
    val r = ext.Similarity.isotropy(spark, sf0001).collect()
    assert(r.length === 1)
    val got = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
               r(0).getLong(3), r(0).getLong(4))
    assert(got === expect)
    // Jensen on the exact integers: ‖Σx‖² ≤ n·Σ‖x‖² (Cauchy–Schwarz
    // against the all-ones vector) — aniso is a true ratio in [0, 1e6]
    assert(num <= BigInt(n) * den, "Jensen bound broken on quantized sums")
    assert(got._5 >= 0L && got._5 <= 1000000L, s"aniso ${got._5}")
    // anisotropy is real but partial on this corpus: strictly positive
    assert(got._5 > 0L, "zero anisotropy — vacuous fixture")
  }
}
