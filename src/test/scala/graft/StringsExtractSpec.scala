package graft

import org.apache.spark.sql.functions._

/** `strings` extraction (Multimodal.stringsExtract): top-20 letter runs
  * must equal a brute regex recompute over the raw text (payload
  * round-trip ≡ text under the ASCII invariant).
  */
class StringsExtractSpec extends SparkSpec {

  test("top runs equal brute regex recompute; rank order correct") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val re = "[A-Za-z]{6,}".r
    val occ = docs.flatMap { case (id, t) => re.findAllIn(t).map(s => (id, s)) }
    val expect = occ.groupBy(_._2).map { case (s, xs) =>
      s -> ((xs.length.toLong, xs.map(_._1).distinct.length.toLong))
    }.toSeq.sortBy { case (s, (c, _)) => (-c, s) }.take(20)
      .zipWithIndex.map { case ((s, (c, nd)), i) => (i + 1, s, c, nd) }
    val got = ext.Multimodal.queries("mm_strings_extract")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expect)
    assert(got.nonEmpty && got.head._3 >= got.last._3)
  }
}
