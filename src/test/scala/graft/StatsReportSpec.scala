package graft

import org.apache.spark.sql.functions._

/** One-row corpus dashboard (Dedup.statsReport): every cell must equal
  * an independent recompute, and the cross-report consistency ties must
  * hold (near-dup pairs = |dedup_ngram_jaccard|, dup docs =
  * docs − |dedup_exact survivors|).
  */
class StatsReportSpec extends SparkSpec {

  test("dashboard cells equal independent recomputes and sibling queries") {
    val r = ext.Dedup.queries("corpus_stats_report")(spark, sf0001).collect()
    assert(r.length === 1)
    val row = r(0)
    val docs = Tables.documents(spark, sf0001)
      .select("source", "text").collect()
      .map(x => (x.getString(0), x.getString(1)))
    val toks = docs.flatMap(_._2.split(" ", -1))
    assert(row.getLong(0) === docs.length.toLong)
    assert(row.getLong(1) === docs.map(_._1).distinct.length.toLong)
    assert(row.getLong(2) === toks.length.toLong)
    assert(row.getLong(3) === toks.distinct.length.toLong)
    assert(row.getLong(4) === toks.length.toLong * 1000000L / docs.length)
    val groups = docs.map(_._2).groupBy(identity).values.filter(_.length > 1)
    assert(row.getLong(5) === groups.size.toLong)
    assert(row.getLong(6) === groups.map(_.length - 1).sum.toLong)
    val nd = ext.Dedup.queries("dedup_ngram_jaccard")(spark, sf0001).count()
    assert(row.getLong(7) === nd, "near-dup cell != |dedup_ngram_jaccard|")
    // exact-dup accounting against the survivor query
    val survivors = ext.Dedup.queries("dedup_exact")(spark, sf0001)
      .select(sum("n_copies")).head().getLong(0)
    assert(survivors === docs.length.toLong, "survivor copies != corpus")
  }
}
