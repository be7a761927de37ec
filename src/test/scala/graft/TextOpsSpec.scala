package graft

import java.nio.file.Files

/** Fixture-backed checks for the curation operators whose interesting
  * cases the synthetic corpus can't exercise: PII patterns that actually
  * fire, chunk boundary arithmetic, contamination overlap counting. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft-text-fixture").toString
    val docs = Seq(
      (0L, "contact me at alice.smith+work@example-mail.co.uk or call 555-123-4567",
        "en", "srcA", 70L),
      (1L, "ssn on file 123-45-6789 twice 987-65-4321 end", "en", "srcA", 45L),
      (2L, "plain text with no sensitive content at all here", "en", "srcB", 48L),
      (3L, "x" * 500, "en", "srcB", 500L)) // one long doc for chunk windows
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("pii scan detects planted emails, phones, ssns") {
    val rows = ext.TextOps.piiScan(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(5))))
      .toMap
    assert(rows(0L) === ((1, 1, 0, 1))) // email + phone
    assert(rows(1L) === ((0, 0, 2, 1))) // two ssns
    assert(rows(2L) === ((0, 0, 0, 0))) // clean
    // n_word is non-zero on every doc — the oracle's live verification path
    assert(ext.TextOps.piiScan(spark, fixtureDir)
      .filter(org.apache.spark.sql.functions.col("n_word") > 0).count() === 4L)
  }

  test("chunking covers the text with the declared stride and sizes") {
    val chunks = ext.TextOps.chunk(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val long = chunks.filter(_._1 == 3L).sortBy(_._2)
    // 500 chars, stride 160 -> starts 0,160,320,480 -> lens 200,200,180,20
    assert(long.map(_._2).toSeq === Seq(0, 1, 2, 3))
    assert(long.map(_._4).toSeq === Seq(200, 200, 180, 20))
    assert(long.forall(c => c._3.forall(_ == 'x')))
    // short docs produce exactly one chunk holding the full text
    val d2 = chunks.filter(_._1 == 2L)
    assert(d2.length === 1 && d2.head._3.length === 48)
  }

  test("contamination counts eval-set shingle overlap exactly") {
    // eval = srcA; doc 2 (srcB) shares no 5-gram with srcA docs; doc 3 has
    // a single token so no shingles at all
    val rows = ext.TextOps.contamination(spark, fixtureDir, evalSource = "srcA")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(2L)._1 === 5L) // 9 tokens -> 5 distinct 5-grams
    assert(rows(2L)._2 === 0L)
    assert(!rows.contains(3L))
    assert(!rows.contains(0L) && !rows.contains(1L)) // eval docs excluded
  }

  test("misra-gries keeps every item above the n/(k+1) guarantee, incl. across merges") {
    val mg = new functions.MisraGries(9)
    // 100 copies of "hot" in 600 items: f = 100 > 600/10 -> must survive
    val stream = scala.util.Random.shuffle(
      Seq.fill(100)("hot") ++ (0 until 500).map(i => s"noise$i")).toList
    val whole = stream.foldLeft(mg.zero)(mg.reduce)
    assert(mg.finish(whole).contains("hot"))
    val (l, r) = stream.splitAt(300)
    val merged = mg.merge(l.foldLeft(mg.zero)(mg.reduce),
                          r.foldLeft(mg.zero)(mg.reduce))
    assert(mg.finish(merged).size <= 9)
    assert(mg.finish(merged).contains("hot"))
  }

  test("tfidf ranks doc-specific tokens above corpus-wide ones") {
    val top1 = ext.TextOps.tfidf(spark, fixtureDir).filter($"rn" === 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every token in docs 0-3 is unique to its doc except none shared...
    // doc 3's only token is "xxx...": df=1, tf=1 -> it is the top token
    assert(top1(3L) === "x" * 500)
  }
}
