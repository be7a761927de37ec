package graft

/** Digest-keyed gram exchange (round-10 verdict item 2): the
  * exact-substring family and the dup-span profile group and join on
  * the gram's 16-byte MD5 digest instead of the raw string — at 100 TB
  * the gram shuffle dominates and a fixed 16-byte key cuts it
  * several-fold. Correctness rests on md5 injectivity over the corpus
  * (a collision is 2^-128-scale); this spec pins digest ≡ string on
  * real data, the dedup_exact precedent.
  */
class SubstrDigestSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("dupWindowStarts digest-keyed path equals the string-keyed reference") {
    val docs = Tables.documents(spark, sf0001)
    val dig = ext.Dedup.dupWindowStarts(docs, digestKeyed = true)
    val str = ext.Dedup.dupWindowStarts(docs, digestKeyed = false)
    val d = rows(dig)
    assert(d.nonEmpty, "fixture must actually exercise duplicated windows")
    assert(d === rows(str))
  }

  test("dupSpanFrac digest-keyed path equals the string-keyed reference") {
    val dig = ext.TextOps.dupSpanFracOf(spark, sf0001, digestKeyed = true)
    val str = ext.TextOps.dupSpanFracOf(spark, sf0001, digestKeyed = false)
    val d = rows(dig)
    assert(d.exists(_.split('|')(2).toLong > 0),
      "fixture must contain docs with duplicated shingles")
    assert(d === rows(str))
  }

  test("digest key is 16 bytes wide (the exchange-width claim)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0001).limit(50)
    val w = docs.select(length(unhex(md5(col("text")))).as("w"))
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(w === Seq(16))
  }
}
