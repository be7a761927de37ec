package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: with a selective filter on one
  * join side, Catalyst injects a bloom `might_contain` predicate into
  * the OTHER side's scan so non-joining rows die before the shuffle —
  * the runtime-filter analog of partition pruning, and a first-class
  * 100 TB technique. Thresholds are lowered to make the injection fire
  * at test scale; the mechanism is identical in production. */
class BloomJoinSpec extends SparkSpec {

  test("a selective dimension filter injects a bloom filter into the fact scan") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> util.Try(conf.get(k)).toOption.flatMap(Option(_))).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val fact = Tables.lineitem(spark, "/root/testdata/sf0.01")
      val dim = Tables.orders(spark, "/root/testdata/sf0.01")
        .filter(col("o_orderpriority") === "1-URGENT") // selective side
      val joined = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter") ||
             plan.contains("might_contain"),
             s"no runtime bloom filter injected:\n${plan.take(2500)}")
      assert(joined.collect().map(_.getLong(1)).sum > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
