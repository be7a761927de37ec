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
}
