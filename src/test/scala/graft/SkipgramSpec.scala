package graft

import org.apache.spark.sql.functions._

/** Windowed skip-gram PMI (TextOps.skipgramPmi): the top-20 must equal
  * a brute windowed-pair recompute (positions, marginals, the exact
  * double ratio order, micronized ln), and the head of the ranking
  * must be a genuinely positive collocation.
  */
class SkipgramSpec extends SparkSpec {

  test("top-20 equals brute windowed recompute; head is positive") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect().map(_.getString(1))
    val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    docs.foreach { t =>
      val toks = t.split(" ", -1)
      for (i <- toks.indices; d <- 1 to 2; if i + d < toks.length)
        pairs((toks(i), toks(i + d))) += 1L
    }
    val total = pairs.values.sum
    val mx = pairs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val my = pairs.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    def pmi(x: String, y: String, cxy: Long): Long =
      BigDecimal(math.log(cxy.toDouble * total.toDouble /
                          (mx(x).toDouble * my(y).toDouble)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expect = pairs.toSeq
      .map { case ((x, y), c) => (x, y, c, pmi(x, y, c)) }
      .sortBy { case (x, y, _, p) => (-p, x, y) }
      .take(20).zipWithIndex
      .map { case ((x, y, c, p), i) => (x, y, c, p, i + 1) }
    val got = ext.TextOps.queries("text_skipgram_pmi")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getInt(4)))
      .toSeq
    assert(got === expect)
    assert(got.head._4 > 0L, "top skip-gram PMI not positive — vacuous")
    assert(got.size === 20)
  }
}
