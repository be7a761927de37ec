package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking: (1) the O(n) rolling-hash Expression must
  * equal an independent O(n·W) per-window re-hash reference, (2) the
  * shift-resistance guarantee — a 1-char prepend preserves every chunk
  * digest strictly between surviving boundaries (the property CDC
  * exists for), while fixed-size 128-blocking shares nothing — and
  * (3) exact-duplicate docs share ALL chunk digests. */
class MmCdcSpec extends SparkSpec {

  private val W = 16
  private val B = 131L
  private val M = 1000003L
  private val D = 32L

  /** Independent reference: hash each window from scratch via
    * PolyHashMod.hashString over the substring (the IvfRecallSpec
    * keep-a-naive-copy pattern). */
  private def refBoundaries(s: String): Seq[Int] =
    (W to s.length).filter { i =>
      graft.functions.PolyHashMod.hashString(
        UTF8String.fromString(s.substring(i - W, i)), B, M) % D == 0
    }

  private def chunksOf(s: String): Seq[String] = {
    val ends = refBoundaries(s).filter(_ < s.length) :+ s.length
    ends.zip(1 +: ends.dropRight(1).map(_ + 1))
      .map { case (e, st) => s.substring(st - 1, e) }
  }

  private lazy val texts: Seq[(Long, String)] =
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  test("rolling-hash Expression equals the per-window re-hash reference") {
    val got = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        graft.functions.CdcBoundaries.col(col("text"), W, B, M, D).as("bs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(texts.nonEmpty)
    texts.foreach { case (id, t) =>
      assert(got(id) == refBoundaries(t),
        s"boundary mismatch on doc $id")
    }
    // at least one doc must actually have interior boundaries, or the
    // whole test is vacuous
    assert(texts.count { case (id, _) => got(id).nonEmpty } > texts.size / 2)
  }

  test("1-char prepend: CDC preserves interior chunks; 128-blocking shares none") {
    val eligible = texts.filter { case (_, t) => refBoundaries(t).size >= 2 }
    assert(eligible.size > 10, "fixture too small for shift test")
    eligible.foreach { case (id, t) =>
      val cdcA = chunksOf(t).toSet
      val cdcB = chunksOf("X" + t).toSet
      // every orig boundary i >= W survives at i+1 (same window bytes),
      // so any chunk BETWEEN two orig boundaries is byte-identical in
      // the shifted doc — with >= 2 boundaries at least one such chunk
      // exists and must be shared
      assert((cdcA intersect cdcB).nonEmpty,
        s"doc $id: no CDC chunk survived a 1-char prepend")
      val fixA = t.grouped(128).toSet
      val fixB = ("X" + t).grouped(128).toSet
      assert((fixA intersect fixB).isEmpty,
        s"doc $id: fixed blocking unexpectedly aligned after a prepend")
    }
  }

  test("cdc pairs flag a 1-char-prepended near-copy that fixed blocking misses") {
    import spark.implicits._
    val t = texts.filter { case (_, s) => refBoundaries(s).size >= 3 }
      .maxBy(_._2.length)._2
    val docs = Seq((1L, t), (2L, "X" + t)).toDF("doc_id", "text")
    val cdcP = graft.ext.Multimodal.cdcPairsOfForTest(docs).collect()
    assert(cdcP.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "CDC pairing missed the shifted near-copy")
    val fixP = graft.ext.Multimodal.mediaChunkDedupOf(docs)
      .filter(col("a_id") === 1L && col("b_id") === 2L).count()
    assert(fixP === 0L, "fixed blocking unexpectedly matched a shifted copy")
  }

  test("mm_cdc_chunks: exact-duplicate docs share every chunk digest") {
    // construct a two-doc frame: a doc and its byte-identical copy —
    // every chunk digest must appear in both docs
    import spark.implicits._
    val t = texts.maxBy(_._2.length)._2
    val both = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val rep = graft.ext.Multimodal.cdcChunksOf(both)
      .groupBy("chunk").agg(countDistinct("doc_id").as("n"))
    assert(rep.filter(col("n") =!= 2).count() === 0)
    assert(rep.count() === chunksOf(t).distinct.size.toLong)
  }
}
