package graft

import org.apache.spark.sql.functions._

/** Per-source KL drift (TextOps.klDrift): rows must equal a driver-side
  * recompute with the same Laplace smoothing and micronized-ln
  * discipline, and Gibbs' inequality must survive the rounding: true
  * KL ≥ 0, so the micronized numerator can dip at most |V|·half-ulp
  * below zero.
  */
class KlDriftSpec extends SparkSpec {

  private def rnd(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("per-source KL equals brute recompute; near-nonneg under rounding") {
    val docs = Tables.documents(spark, sf0001)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = docs.flatMap { case (s, t) => t.split(" ", -1).map(s -> _) }
    val corpus = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val v = corpus.size.toLong
    val nr = corpus.values.sum
    val bySrc = toks.groupBy(_._1)
    val expect = bySrc.map { case (src, xs) =>
      val cs = xs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val ns = xs.length.toLong
      val num = corpus.toSeq.map { case (tok, cr) =>
        val csp = cs.getOrElse(tok, 0L) + 1L
        val dlt = rnd(math.log(csp.toDouble / (ns + v)) * 1e6) -
                  rnd(math.log((cr + 1).toDouble / (nr + v)) * 1e6)
        csp * dlt
      }.sum
      // Spark `div` truncates toward zero (sign-split floor in DuckDB)
      val kl = if (num < 0) -((-num) / (ns + v)) else num / (ns + v)
      src -> ((ns, v, num, kl))
    }
    val got = ext.TextOps.queries("text_kl_drift")(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === expect)
    assert(got.size > 1, "one source — drift is vacuous")
    got.values.foreach { case (_, vv, num, kl) =>
      // Gibbs: exact KL >= 0; each micronized ln carries < 0.5 µ error
      // weighted by csp, so num > -(mass)·0.5... bound via the smoothed
      // mass: |error| < (n_s + |V| + |V|)·0.5 µ — use the loose 1·mass
      assert(num >= -(vv + got.values.map(_._1).max), s"num $num far below 0")
      assert(kl >= -1L, s"kl_micro $kl below rounding floor")
    }
  }
}
