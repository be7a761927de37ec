package graft

import org.apache.spark.sql.functions._

/** agg_hist_quantile invariants: the log-histogram estimate must sit
  * within one bucket width (≤12.5% relative) BELOW the true positional
  * quantile, and the shard-merge path must agree with the direct build
  * (the mergeability contract the sketch exists for). */
class HistQuantileSpec extends SparkSpec {

  private lazy val rows =
    ops.Aggs.histQuantile(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getInt(4)))

  private lazy val sortedMicro = Tables.lineitem(spark, sf0001)
    .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("vm"))
    .collect().map(_.getLong(0)).sorted

  test("reagg path agrees with the direct build at every q") {
    assert(rows.nonEmpty)
    for ((q, _, d, r, agree) <- rows) {
      assert(agree === 1, s"q=$q merge disagreement")
      assert(d === r, s"q=$q direct $d != reagg $r")
    }
  }

  test("estimate is the bucket floor of the true positional quantile") {
    val n = sortedMicro.length
    for ((q, nRows, est, _, _) <- rows) {
      assert(nRows === n.toLong)
      // true quantile: value at rank ceil(q*n/100) (1-based)
      val rank = (q.toLong * n + 99) / 100
      val truth = sortedMicro(rank.toInt - 1)
      // bucket floor property: est <= truth, and truth < est + width
      // where width = 2^(bitlen-4) (est keeps the top 4 bits)
      assert(est <= truth, s"q=$q est $est above truth $truth")
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(est)
      val width = if (bl > 4) 1L << (bl - 4) else 1L
      assert(truth < est + width,
             s"q=$q truth $truth outside bucket [$est, ${est + width})")
      // ≤12.5% relative error for bl > 4 (width/est <= 1/8 within bucket)
      if (bl > 4)
        assert((truth - est).toDouble / truth <= 0.125 + 1e-9,
               s"q=$q relative error above bucket bound")
    }
  }
}
