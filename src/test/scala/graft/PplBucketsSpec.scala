package graft

import org.apache.spark.sql.functions._

/** CCNet perplexity bucketing: structural invariants the value-hash
  * can't state — partition accounting, the head≤middle≤tail NLL
  * ordering the bucketing exists to produce, and lockstep with the
  * langid prediction and unigram scorer it composes. */
class PplBucketsSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  private lazy val rows = ext.TextOps.pplBuckets(spark, sf001).collect()

  test("every document lands in exactly one bucket; per-lang thirds") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(rows.length.toLong === docs)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      val byBucket = rs.groupBy(_.getString(5)).view.mapValues(_.length).toMap
      val n = rs.length
      // the integer rank rule: head = floor(n/3), middle = floor(2n/3)-head
      val head = byBucket.getOrElse("head", 0)
      val mid = byBucket.getOrElse("middle", 0)
      assert(head === n / 3, s"$lang head")
      assert(head + mid === 2 * n / 3, s"$lang middle")
      assert(head + mid + byBucket.getOrElse("tail", 0) === n, s"$lang total")
    }
  }

  test("NLL is monotone across buckets within each language") {
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      def nlls(b: String) = rs.filter(_.getString(5) == b).map(_.getDouble(3))
      val (h, m, t) = (nlls("head"), nlls("middle"), nlls("tail"))
      if (h.nonEmpty && m.nonEmpty)
        assert(h.max <= m.min + 1e-9, s"$lang head>middle")
      if (m.nonEmpty && t.nonEmpty)
        assert(m.max <= t.min + 1e-9, s"$lang middle>tail")
    }
  }

  test("composes langid's prediction and unigramLogprob's score exactly") {
    val pred = ext.TextOps.langid(spark, sf001)
      .select("doc_id", "predicted").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val lp = ext.TextOps.unigramLogprob(spark, sf001)
      .select("doc_id", "avg_lp").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == pred(id), s"lang drift on doc $id")
      assert(math.abs(r.getDouble(3) + lp(id)) < 2e-6,
        s"nll != -avg_lp on doc $id")
    }
  }
}
