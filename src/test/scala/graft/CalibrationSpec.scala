package graft

import org.apache.spark.sql.functions._

/** Quality-gate calibration (TextOps.qualityCalibration): the decile
  * table must partition the scored corpus exactly — its totals tie to
  * the corpus count and to text_quality_roc's label column — and the
  * decile assignment must follow the exclusive-prefix rank rule. */
class CalibrationSpec extends SparkSpec {

  private lazy val cal =
    ext.TextOps.queries("text_quality_calibration")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                 r.getLong(3), r.getLong(4), r.getLong(5)))

  test("decile totals tie to the corpus and to the ROC's label counts") {
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(cal.map(_._2).sum === nDocs,
      "decile n_docs do not partition the corpus")
    val rocNPos = ext.TextOps.queries("text_quality_roc")(spark, sf0001)
      .select("n_pos").distinct().collect()
    assert(rocNPos.length === 1, "ROC n_pos is not constant across cuts")
    assert(cal.map(_._3).sum === rocNPos.head.getLong(0),
      "decile n_pos do not sum to the ROC's gopher-positive count")
  }

  test("deciles are valid, ordered, and score-monotone in their edges") {
    val ds = cal.map(_._1)
    assert(ds.forall(d => d >= 0L && d <= 9L))
    assert(ds.toList === ds.sorted.toList)
    assert(ds.distinct.length === ds.length)
    // spt ranges never overlap across deciles (equal scores share one)
    cal.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo._5 < hi._4,
          s"decile ${lo._1} max spt ${lo._5} >= decile ${hi._1} min ${hi._4}")
      case _ => ()
    }
    // rates are well-formed micro-units
    cal.foreach { case (_, n, p, _, _, rate) =>
      assert(rate === p * 1000000L / n)
      assert(rate >= 0L && rate <= 1000000L)
    }
  }

  test("calibrated gate: quadrants tie to the gates and to the deciles") {
    val rows = ext.TextOps.queries("text_quality_gate_calibrated")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet === Set("both", "calib_only", "calibrated",
                               "score_cut", "score_only"))
    val tau = rows("calibrated")._1
    assert(rows.values.map(_._1).toSet === Set(tau), "τ differs across rows")
    // quadrant algebra: calibrated = both + calib_only; score_cut = both
    // + score_only (n_keep and n_pos_kept alike)
    assert(rows("calibrated")._2 === rows("both")._2 + rows("calib_only")._2)
    assert(rows("score_cut")._2 === rows("both")._2 + rows("score_only")._2)
    assert(rows("calibrated")._3 === rows("both")._3 + rows("calib_only")._3)
    assert(rows("score_cut")._3 === rows("both")._3 + rows("score_only")._3)
    // the production pin: score_cut ≡ qualityScoreTrained's keep count
    val keepCount = ext.TextOps.queries("text_quality_score_trained")(spark, sf0001)
      .filter(col("keep") === 1).count()
    assert(rows("score_cut")._2 === keepCount,
      "score_cut row diverges from the production keep gate")
    // decile tie: τ is a decile boundary, so the calibrated keep count
    // equals the doc total of the deciles at or above τ
    assert(rows("calibrated")._2 === cal.filter(_._4 >= tau).map(_._2).sum,
      "calibrated keep count does not match the qualifying deciles")
  }

  test("calibrated gate fails CLOSED when no decile reaches 50%") {
    // crafted frame: all-negative labels → every decile rate 0 → τ = the
    // 1e9 sentinel → keep nothing (the fail-closed branch the natural
    // corpus may never drive — the DriftSpec precedent)
    import spark.implicits._
    val spt = Seq(-5L, -3L, 0L, 2L, 7L)
    val rates = spt.map(s => (s, 0L)) // (spt_micro, rate if kept)
    // reproduce the τ rule directly (the operator's literals)
    val tau = rates.filter(_._2 >= 500000L).map(_._1)
      .minOption.getOrElse(1000000000L)
    assert(tau === 1000000000L)
    assert(spt.count(_ >= tau) === 0, "fail-closed τ still kept docs")
  }
}
