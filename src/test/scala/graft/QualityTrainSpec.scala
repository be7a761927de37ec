package graft

/** NB quality trainer (TextOps.qualityTrain) vs a from-scratch driver
  * reference: hash-bucket counting + Laplace log-odds recomputed with
  * plain Scala collections over the collected corpus, labels taken from
  * the (independently pinned, GopherGatesSpec) gopher gate outcomes.
  * Then the apply half: per-doc score must equal the sum of learned
  * weights over that doc's token buckets. */
class QualityTrainSpec extends SparkSpec {

  private val P1 = 1000000007L
  private def bucket(tok: String): Long = {
    var acc = 0L
    tok.foreach { c => acc = (acc * 31 + c.toLong) % P1 }
    acc % 64
  }

  private lazy val docs = Tables.documents(spark, sf0001)
    .select("doc_id", "text").collect()
    .map(r => r.getLong(0) -> r.getString(1)).toMap

  private lazy val labels = ext.TextOps.gopherGates(spark, sf0001)
    .select("doc_id", "gopher_ok").collect()
    .map(r => r.getLong(0) -> r.getInt(1)).toMap

  private lazy val refWeights: Map[Long, (Long, Long, Long)] = {
    val counts = Array.fill(64)((0L, 0L))
    docs.foreach { case (id, text) =>
      val y = labels(id)
      text.split(" ").foreach { tok =>
        val b = bucket(tok).toInt
        val (p, n) = counts(b)
        counts(b) = if (y == 1) (p + 1, n) else (p, n + 1)
      }
    }
    val tp = counts.map(_._1).sum
    val tn = counts.map(_._2).sum
    def lnMicro(x: Long): Long = Math.round(math.log(x.toDouble) * 1e6)
    (0 until 64).map { b =>
      val (p, n) = counts(b)
      val w = lnMicro(p + 1) - lnMicro(tp + 64) - lnMicro(n + 1) + lnMicro(tn + 64)
      b.toLong -> ((p, n, w))
    }.toMap
  }

  test("trained weights == driver-side NB log-odds, all 64 buckets") {
    assert(labels.values.toSet === Set(0, 1), "vacuous: labels one-sided")
    val got = ext.TextOps.qualityTrain(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet === (0L until 64L).toSet, "64-bucket scaffold")
    refWeights.foreach { case (b, expect) =>
      assert(got(b) === expect, s"bucket $b (n_pos, n_neg, w_micro)")
    }
  }

  test("trained score == sum of learned weights over doc token buckets; keep = score>0") {
    val w = refWeights.map { case (b, t) => b -> t._3 }
    val got = ext.TextOps.qualityScoreTrained(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.map(_._1).toSet === docs.keySet)
    got.foreach { case (id, nTok, score, keep) =>
      val toks = docs(id).split(" ")
      assert(nTok === toks.length.toLong, s"doc $id n_tok")
      assert(score === toks.map(t => w(bucket(t))).sum, s"doc $id score")
      assert(keep === (if (score > 0) 1 else 0), s"doc $id keep")
    }
    // the learned classifier must actually separate something: both
    // keep outcomes occur on the corpus
    assert(got.map(_._4).toSet === Set(0, 1), "vacuous: classifier one-sided")
  }
}
