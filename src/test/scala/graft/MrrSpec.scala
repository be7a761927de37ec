package graft

import org.apache.spark.sql.functions._

/** MRR eval (Similarity.mrrEval): the row must equal a driver-side
  * recompute from the brute exact NN and the served top-3, and respect
  * the metric's arithmetic bounds. */
class MrrSpec extends SparkSpec {

  private def rnd6(x: Double): Double = math.round(x * 1e6) / 1e6

  test("mrr row equals the brute recompute; bounds hold") {
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val nrm = emb.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    // brute exact NN per probe (sim desc, id asc)
    val probes = emb.keys.filter(_ < 100).toSeq.sorted
    val nn = probes.map { p =>
      p -> emb.keys.filter(_ != p).toSeq
        .map(b => (b, rnd6(dot(emb(p), emb(b)) / (nrm(p) * nrm(b)))))
        .sortBy { case (b, s) => (-s, b) }.head._1
    }.toMap
    // served cut: ivfTopK restricted to the probes
    val served = ext.Similarity.queries("sim_ivf_topk")(spark, sf0001)
      .filter(col("a_id") < 100)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
      .toMap
    val rrs = probes.map(p => served.get((p, nn(p))).map(1000000L / _).getOrElse(0L))
    val expProbes = probes.size.toLong
    val expFound = rrs.count(_ > 0L).toLong
    val expSum = rrs.sum
    val row = ext.Similarity.queries("sim_mrr_eval")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) === expProbes)
    assert(row.getLong(1) === expFound)
    assert(row.getLong(2) === expSum)
    assert(row.getLong(3) === expSum / expProbes)
    // bounds: each found probe contributes between 1e6/3 and 1e6
    assert(expSum >= expFound * (1000000L / 3))
    assert(expSum <= expFound * 1000000L)
    assert(row.getLong(3) <= 1000000L)
    assert(expFound > 0L, "no probe's exact NN is ever served — vacuous eval")
  }
}
