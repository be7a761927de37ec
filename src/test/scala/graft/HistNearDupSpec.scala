package graft

import org.apache.spark.sql.functions._

/** 256-bin byte-histogram near-dup (Multimodal.histNearDup): the pair
  * set must equal a brute all-pairs L1 recompute over per-byte counts
  * (proving the banded length blocking is lossless for the τ=20
  * threshold), with the triangle bound |len_a − len_b| ≤ L1 on every
  * emitted pair.
  */
class HistNearDupSpec extends SparkSpec {

  test("banded near-dup pairs == brute all-pairs L1 at tau=20") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val hist = docs.map { case (id, t) =>
      val c = new Array[Long](256)
      t.getBytes("UTF-8").foreach(b => c(b & 0xff) += 1)
      id -> c
    }.toMap
    val len = hist.view.mapValues(_.sum).toMap
    val brute = (for {
      (a, ha) <- hist.toSeq
      (b, hb) <- hist.toSeq
      if a < b
      l1 = (0 until 256).map(i => math.abs(ha(i) - hb(i))).sum
      if l1 <= 20L
    } yield (a, b, len(a), len(b), l1)).toSet
    val got = ext.Multimodal.queries("mm_hist_near_dup")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4)))
      .toSet
    assert(got === brute,
      s"banded blocking diverged from brute: got ${got.size}, brute ${brute.size}")
    assert(got.nonEmpty, "no near-dup pairs at sf0.001 — vacuous")
    got.foreach { case (a, b, la, lb, l1) =>
      assert(math.abs(la - lb) <= l1, s"triangle bound broken at ($a,$b)")
      assert(l1 <= 20L)
    }
    // the signature discriminates: the threshold keeps only a tiny
    // fraction of the length-band candidates (the 256-vs-16-bin point)
    val ids = len.keys.toSeq
    val cands = (for {
      a <- ids; b <- ids
      if a < b && math.abs(len(a) - len(b)) <= 20L
    } yield (a, b)).size
    assert(got.size * 10 < cands,
      s"threshold kept ${got.size} of $cands candidates — not discriminative")
  }

  test("hot-band cap: pairs restricted to the saltOrd-first docs, deterministic") {
    val spk = spark
    import spk.implicits._
    // 40 identical-length docs in ONE band; cap 16 → only the 16
    // saltOrd-first survive the guardrail, and every kept pair scores
    val docs = (0L until 40L).map(i => (i, "x " * 50 + s"tail$i"))
      .toDF("doc_id", "text")
    def scramble(id: Long): Long =
      ((id % 2147483648L) * 2654435761L) % 2147483648L
    val keptIds = (0L until 40L).sortBy(i => (scramble(i), i)).take(16).toSet
    val got = ext.Multimodal.histNearDupOf(spark, docs, tau = 20L, cap = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty, "crafted near-dups not found")
    got.foreach { case (a, b) =>
      assert(keptIds(a) && keptIds(b),
        s"pair ($a,$b) includes a doc the band cap should have dropped")
    }
    // cap off (cap > n) → strictly more pairs, superset of the capped set
    val full = ext.Multimodal.histNearDupOf(spark, docs, tau = 20L, cap = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(full) && full.size > got.size)
  }
}
