package graft

import org.apache.spark.sql.functions._

/** text_fertility_by_source must equal the per-source aggregation of
  * text_tokens' two segmentations (independent path: join the per-doc
  * token counts to sources and fold driver-side). */
class FertilitySpec extends SparkSpec {

  test("fertility report equals the text_tokens rollup") {
    val rep = ext.TextOps.fertilityBySource(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
                                   r.getLong(4))).toMap
    val perDoc = ext.TextOps.tokens(spark, sf0001)
      .join(Tables.documents(spark, sf0001).select("doc_id", "source"),
            Seq("doc_id"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("n_ws").toLong,
                 r.getAs[Int]("n_bpe").toLong))
    val bySrc = perDoc.groupBy(_._1)
    assert(rep.keySet === bySrc.keySet)
    for ((src, docs) <- bySrc) {
      val (nDocs, nWords, nToks, fert) = rep(src)
      val (ws, bpe) = (docs.map(_._2).sum, docs.map(_._3).sum)
      assert(nDocs === docs.length.toLong, s"$src n_docs")
      assert(nWords === ws, s"$src n_words")
      assert(nToks === bpe, s"$src n_tokens")
      assert(fert === (if (ws > 0) bpe * 1000000L / ws else 0L), s"$src fertility")
      assert(fert >= 1000000L, s"$src fertility below 1.0 — BPE splits can only add tokens")
    }
  }
}
