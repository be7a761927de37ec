package graft

import org.apache.spark.sql.functions._

/** Sign-bit binary quantization (Similarity.signBits / hammingTopK /
  * signRecallEval): the packed words must encode exactly the per-dim
  * sign pattern, the Hamming distances scored on packed words must equal
  * an independent per-dimension disagreement count, and the serving path
  * must stay inside its own shortlist. */
class SignBitsSpec extends SparkSpec {

  private def signSets(): Map[Long, Seq[Boolean]] =
    Tables.embeddings(spark, sf0001).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(v => v >= 0f).toSeq).toMap

  test("packed words round-trip the per-dimension sign pattern exactly") {
    val signs = signSets()
    val packed = ext.Similarity.signBits(spark, sf0001).collect()
    assert(packed.length == signs.size)
    packed.foreach { r =>
      val (id, w1, w2, nbits) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))
      val s = signs(id)
      val expect1 = (0 until 32).map(i => if (s(i)) 1L << i else 0L).sum
      val expect2 = (0 until 32).map(i => if (s(32 + i)) 1L << i else 0L).sum
      assert(w1 == expect1 && w2 == expect2, s"vec $id word mismatch")
      assert(nbits == s.count(identity), s"vec $id popcount mismatch")
    }
  }

  test("hamming shortlist distance equals independent per-dim sign disagreement") {
    val signs = signSets()
    val top = ext.Similarity.hammingTopK(spark, sf0001, probeN = 10).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      val (a, b, hd) = (r.getLong(0), r.getLong(1), r.getInt(3))
      val expect = signs(a).zip(signs(b)).count { case (x, y) => x != y }
      assert(hd == expect, s"pair ($a,$b) hamming mismatch")
    }
  }

  test("rerank output: 3 rows per probe, ranks 1..3, sim non-increasing") {
    val top = ext.Similarity.hammingTopK(spark, sf0001, probeN = 10)
      .collect().groupBy(_.getLong(0))
    assert(top.size == 10)
    top.foreach { case (a, rows) =>
      val byRank = rows.sortBy(_.getInt(2))
      assert(byRank.map(_.getInt(2)).toSeq == Seq(1, 2, 3), s"probe $a ranks")
      val sims = byRank.map(_.getDouble(4)).toSeq
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y },
        s"probe $a sims not sorted: $sims")
    }
  }

  test("recall eval is internally consistent and the screen catches something") {
    val r = ext.Similarity.signRecallEval(spark, sf0001, probeN = 10).collect().head
    val (nTruth, nScreen, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nTruth == 30) // 3 exact neighbors per probe
    assert(nScreen == 80) // SignShortlist=8 per probe
    assert(nHit <= math.min(nTruth, nScreen))
    assert(r.getLong(3) == nHit * 1000000L / nTruth)
    assert(r.getLong(4) == nHit * 1000000L / nScreen)
    // 64 sign bits on 64-dim zero-centered data: an 8-wide screen that
    // caught nothing would mean the quantizer is broken, not just lossy
    assert(nHit > 0, "sign screen caught zero exact neighbors")
  }
}
