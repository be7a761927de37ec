package graft

/** Winnowing fingerprints (TextOps.winnow / winnowPairs): the packed-key
  * relational selection must equal a literal sequential implementation
  * of the MOSS algorithm (rightmost minimum per window, positions
  * unioned), and the pair screen must equal its brute-force recount. */
class WinnowSpec extends SparkSpec {

  private def polyHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)

  /** Sequential winnowing: per doc, (1-based gram position, hash) set. */
  private def bruteWinnow(ts: Seq[String]): Set[(Long, Long)] = {
    if (ts.length < 4) return Set.empty
    val hs = (0 to ts.length - 4).map(i => polyHash(ts.slice(i, i + 4).mkString(" ")))
    if (hs.length < 4) return Set.empty
    (0 to hs.length - 4).map { s =>
      val m = hs.slice(s, s + 4).min
      (s until s + 4).filter(j => hs(j) == m).max
    }.toSet.map((j: Int) => ((j + 1).toLong, hs(j)))
  }

  private lazy val docs: Map[Long, Seq[String]] =
    Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap

  test("selection == sequential rightmost-min winnowing") {
    val expect = docs.toSeq.flatMap { case (id, ts) =>
      bruteWinnow(ts).map { case (p, h) => (id, p, h) }
    }.toSet
    assert(expect.nonEmpty)
    val got = ext.TextOps.winnow(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("winnowing guarantee: every doc with a full window is fingerprinted") {
    val got = ext.TextOps.winnow(spark, sf0001).collect()
      .map(_.getLong(0)).toSet
    val expect = docs.collect {
      case (id, ts) if ts.length >= 7 => id // >= K+W-1 tokens => >= 1 window
    }.toSet
    assert(expect.subsetOf(got))
  }

  test("pairs == brute-force shared-fingerprint recount with the DF cap") {
    val fp = docs.view.mapValues(ts => bruteWinnow(ts).map(_._2)).toMap
    val df = fp.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val rare = df.collect { case (h, n) if n <= 100 => h }.toSet
    val ids = docs.keys.toSeq.sorted
    val expect = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      shared = (fp(ids(i)) & fp(ids(j)) & rare).size if shared >= 2
    } yield (ids(i), ids(j), shared.toLong)).toSet
    val got = ext.TextOps.winnowPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(expect.nonEmpty, "vacuous: no doc pair shares 2+ fingerprints")
  }
}
