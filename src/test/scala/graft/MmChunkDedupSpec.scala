package graft

import graft.ext.Multimodal

/** Chunk-digest media near-dup (mm_dedup_chunks): the fixture pins the
  * operator's reason to exist — an appended-trailer copy shares its
  * block-aligned prefix chunks and is caught, while the whole-payload
  * digest (mm_dedup_media's shape) sees two different files. Also pins
  * the empty-payload edge (one empty chunk, no spurious pairs — the
  * `greatest(len, 1)` guard both engines apply).
  */
class MmChunkDedupSpec extends SparkSpec {

  // non-periodic-at-128 content so every block of a doc is distinct
  private def s(n: Int, seed: Int): String =
    (0 until n).map(i => ('a' + ((i * 7 + seed) % 26)).toChar).mkString

  test("appended-trailer copy caught via shared prefix chunks") {
    import spark.implicits._
    val base = s(400, 0)                  // 4 chunks (3×128 + 16)
    val docs = Seq(
      (1L, base),
      (2L, base + s(200, 13)),            // 5 chunks, first 3 == doc 1's
      (3L, s(400, 5)),                    // unrelated
      (4L, "")                            // empty payload edge
    ).toDF("doc_id", "text")
    val got = Multimodal.mediaChunkDedupOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                 r.getLong(3), r.getLong(4))).toSet
    assert(got === Set((1L, 2L, 3L, 4L, 5L)),
      s"expected exactly the prefix-sharing pair (1,2,inter=3,4,5), got $got")
  }
}
