package graft

import org.apache.spark.sql.functions._

/** PII redaction: after redact, a re-scan must find ZERO matches (the
  * property the operator exists for); injected docs carry the typed
  * placeholders; untouched docs pass through byte-identical. */
class PiiRedactSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  private lazy val rows = ext.TextOps.piiRedact(spark, sf001).collect()

  test("re-scanning redacted text finds zero PII") {
    import spark.implicits._
    val redacted = rows.map(r => (r.getLong(0), r.getString(4)))
      .toSeq.toDF("doc_id", "text")
    val rescan = redacted.select(
      (size(expr(s"regexp_extract_all(text, '${ext.TextOps.PiiEmail}', 0)")) +
       size(expr(s"regexp_extract_all(text, '${ext.TextOps.PiiPhone}', 0)")) +
       size(expr(s"regexp_extract_all(text, '${ext.TextOps.PiiSsn}', 0)"))
      ).as("n")).as[Int].collect()
    assert(rescan.forall(_ == 0), "PII survived redaction")
  }

  test("injected docs are redacted with typed placeholders; others untouched") {
    val orig = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    var injected = 0
    rows.foreach { r =>
      val (id, red) = (r.getLong(0), r.getString(4))
      if (id % 10 == 0) {
        assert(r.getInt(1) >= 1 && r.getInt(2) >= 1,
          s"doc $id should carry an injected email+phone")
        assert(red.contains("<EMAIL>") && red.contains("<PHONE>"))
        injected += 1
      } else if (id % 10 == 5) {
        assert(r.getInt(3) >= 1 && red.contains("<SSN>"))
        injected += 1
      } else {
        assert(red == orig(id), s"doc $id modified without injection")
      }
    }
    assert(injected > 0, "fixture injected nothing — test vacuous")
  }
}
