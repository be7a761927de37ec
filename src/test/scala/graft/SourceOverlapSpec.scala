package graft

/** Cross-source duplication matrix (Dedup.sourceOverlap): the matrix
  * must account for every jaccard pair exactly once and equal a brute
  * recompute from the pair list + doc sources.
  */
class SourceOverlapSpec extends SparkSpec {

  test("matrix totals = |jaccard pairs| and equals brute recompute") {
    val pairs = ext.Dedup.queries("dedup_ngram_jaccard")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val src = Tables.documents(spark, sf0001)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = ext.Dedup.queries("dedup_source_overlap")(spark, sf0001)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(got.values.sum === pairs.length.toLong)
    assert(pairs.nonEmpty, "fixture has no near-dup pairs — matrix vacuous")
    val expect = pairs
      .map { case (a, b) =>
        val (sa, sb) = (src(a), src(b))
        (if (sa <= sb) (sa, sb) else (sb, sa))
      }
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    assert(got === expect)
    // ordering invariant: src_a <= src_b in every row
    assert(got.keys.forall { case (a, b) => a <= b })
  }
}
