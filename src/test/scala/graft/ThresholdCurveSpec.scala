package graft

/** Jaccard threshold curve (Dedup.thresholdCurve): must equal a brute
  * re-bucketing of the ngram-jaccard survivor set, be monotone
  * non-increasing, start at exactly |dedup_ngram_jaccard| (the 0.2
  * family floor), and emit all 8 thresholds even when empty.
  */
class ThresholdCurveSpec extends SparkSpec {

  test("curve == brute re-bucketing; monotone; anchored at the family floor") {
    val pairs = ext.Dedup.queries("dedup_ngram_jaccard")(spark, sf0001)
      .collect().map(r => (r.getLong(2), r.getLong(3))) // (inter, uni)
    val got = ext.Dedup.queries("dedup_threshold_curve")(spark, sf0001)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val thrs = Seq(20, 30, 40, 50, 60, 70, 80, 90)
    assert(got.keySet === thrs.toSet, "all 8 thresholds must appear")
    thrs.foreach { t =>
      val brute = pairs.count { case (i, u) => i * 100 >= t.toLong * u }.toLong
      assert(got(t) === brute, s"count at $t%")
    }
    assert(got(20) === pairs.length.toLong, "floor row != family survivor set")
    thrs.sliding(2).foreach { case Seq(a, b) =>
      assert(got(a) >= got(b), s"curve not monotone at $a->$b")
    }
    assert(got(20) > got(90), "curve is flat — vacuous fixture")
  }
}
