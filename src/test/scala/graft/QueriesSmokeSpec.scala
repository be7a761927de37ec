package graft

import org.apache.spark.sql.functions._

/** Every registered query must run at sf0.001; queries that can
  * legitimately return 0 rows on tiny data are allow-listed. */
class QueriesSmokeSpec extends SparkSpec {

  private val mayBeEmpty = Set(
    "anti_join", "set_except", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_embedding", // random vectors: cosine >= 0.9 pairs are rare
    "q5_region_volume") // same-nation supplier+customer: selective at sf0.001

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, sf0001)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
      else assert(n >= 0)
    }
  }

  test("flagship matches a hand-computed slice") {
    // nation 0 count via independent path
    val c = spark.read.parquet(s"$sf0001/customer.parquet")
    val expected = c
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY") &&
              col("c_nationkey") === 0)
      .count()
    val got = SparkEntry.flagship(spark, sf0001)
      .filter(col("n_name") === "NATION_0")
      .select("n_customers").head().getLong(0)
    assert(got === expected)
  }
}
