package graft

import org.apache.spark.sql.functions._

/** Pins text_quality_roc: the cut=0 row IS the production gate (its
  * n_pred equals text_quality_score_trained's keep count — the tie the
  * round-12 verdict asked for), the curve is monotone in the cut, and
  * every cell matches a driver-side recompute from the scored docs and
  * gopher labels at sf0.001. */
class QualityRocSpec extends SparkSpec {

  test("roc curve matches a driver-side recompute; cut 0 ties to the gate") {
    val scored = ext.TextOps.qualityScoreTrained(spark, sf0001)
      .select("doc_id", "n_tok", "score_micro", "keep").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    val labels = ext.TextOps.gopherGates(spark, sf0001)
      .select("doc_id", "gopher_ok").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(scored.keySet === labels.keySet)

    val cuts = Seq(-200000L, -100000L, -50000L, -20000L, -10000L, 0L,
                   10000L, 20000L, 50000L, 100000L, 200000L)
    val expect = cuts.map { c =>
      val rows = scored.toSeq.map { case (id, (nTok, sc, _)) =>
        (sc > c * nTok, labels(id) == 1)
      }
      val nPred = rows.count(_._1).toLong
      val tp = rows.count(r => r._1 && r._2).toLong
      val fp = rows.count(r => r._1 && !r._2).toLong
      val nPos = rows.count(_._2).toLong
      val prec = if (nPred == 0) 1000000L else tp * 1000000L / nPred
      val rec = if (nPos == 0) 1000000L else tp * 1000000L / nPos
      c -> ((nPred, tp, fp, nPos, prec, rec))
    }.toMap

    val got = ext.TextOps.qualityRoc(spark, sf0001).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    }.toMap
    assert(got.keySet === cuts.toSet)
    cuts.foreach { c => assert(got(c) === expect(c), s"cut $c diverged") }

    // cut 0 row IS the production gate: n_pred == keep count
    val keepCount = scored.values.count(_._3 == 1).toLong
    assert(got(0L)._1 === keepCount,
      "cut=0 n_pred must equal text_quality_score_trained's keep count")

    // accept volume is monotone non-increasing as the cut rises
    val preds = cuts.map(got(_)._1)
    assert(preds.zip(preds.tail).forall { case (a, b) => a >= b },
      s"n_pred not monotone across cuts: $preds")
    // and the curve is non-degenerate: the extremes differ
    assert(preds.head > preds.last,
      "curve is flat — the cut grid does not span the score distribution")
  }
}
