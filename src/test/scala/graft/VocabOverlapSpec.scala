package graft

import org.apache.spark.sql.functions._

/** Source×source vocabulary Jaccard (TextOps.vocabOverlap): the matrix
  * must equal brute distinct-token set arithmetic, cover every
  * unordered source pair (the corpus shares stopwords), and respect
  * the Jaccard bounds.
  */
class VocabOverlapSpec extends SparkSpec {

  test("overlap matrix == brute set arithmetic over every source pair") {
    val docs = Tables.documents(spark, sf0001)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vocab = docs.groupBy(_._1).view
      .mapValues(_.flatMap(_._2.split(" ", -1)).toSet).toMap
    val srcs = vocab.keys.toSeq.sorted
    val brute = (for {
      a <- srcs; b <- srcs if a < b
      inter = (vocab(a) & vocab(b)).size.toLong
      if inter > 0
    } yield (a, b) -> ((vocab(a).size.toLong, vocab(b).size.toLong, inter,
        inter * 1000000L / (vocab(a).size + vocab(b).size - inter)))).toMap
    val got = ext.TextOps.queries("text_vocab_overlap")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got === brute)
    // every unordered pair appears (sources share at least a stopword)
    assert(got.size === srcs.size * (srcs.size - 1) / 2,
      s"missing pairs: ${got.size} of ${srcs.size * (srcs.size - 1) / 2}")
    got.values.foreach { case (va, vb, inter, jac) =>
      assert(inter <= math.min(va, vb))
      assert(jac > 0L && jac <= 1000000L)
    }
  }
}
