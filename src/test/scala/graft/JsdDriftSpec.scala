package graft

import org.apache.spark.sql.functions._

/** JSD drift (TextOps.jsdDrift): must equal a brute driver-side
  * recompute of the exact integer pipeline (Laplace smoothing, each ln
  * micronized FIRST, mixture from integer rationals), and respect the
  * JSD bounds (0 ≤ JSD ≤ ln 2, modulo ±1 µ rounding slack per division).
  */
class JsdDriftSpec extends SparkSpec {

  test("jsd equals brute integer recompute; bounds hold") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val toks = docs.flatMap { case (s, t) => t.split(" ").map(tok => (s, tok)) }
    val cr = toks.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val v = cr.size.toLong
    val nr = cr.values.sum
    val ns = toks.groupBy(_._1).map { case (s, xs) => s -> xs.length.toLong }
    val cs = toks.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    def lnM(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val bb = nr + v
    val expect = ns.map { case (src, n) =>
      val aa = n + v
      var numPm = 0L; var numQm = 0L
      cr.foreach { case (tok, crc) =>
        val a = cs.getOrElse((src, tok), 0L) + 1L
        val b = crc + 1L
        val lnmd = lnM(a * bb + b * aa) - lnM(2L * aa * bb)
        numPm += a * (lnM(a) - lnM(aa) - lnmd)
        numQm += b * (lnM(b) - lnM(bb) - lnmd)
      }
      val kpm = numPm / aa; val kqm = numQm / bb
      src -> ((n, v, numPm, numQm, kpm, kqm, (kpm + kqm) / 2))
    }
    val got = ext.TextOps.queries("text_jsd_drift")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
                                  r.getLong(4), r.getLong(5), r.getLong(6),
                                  r.getLong(7))))
      .toMap
    assert(got === expect)
    // JSD ∈ [0, ln2] in micro-nats, ±2 µ rounding slack
    got.values.foreach { case (_, _, _, _, kpm, kqm, jsd) =>
      assert(kpm >= -2L && kqm >= -2L)
      assert(jsd >= -2L && jsd <= 693150L)
    }
    assert(got.values.exists(_._7 > 0L), "all-zero JSD — vacuous fixture")
  }
}
