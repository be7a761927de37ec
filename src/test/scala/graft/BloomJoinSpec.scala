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

  // ---- explicit BloomMightContain operator (join_bloom_prune) ----
  // The config-injected variant above needs size thresholds to fire;
  // the operator builds the filter explicitly so the pruning is
  // unconditional and visible on a plain session.

  private val sf001 = "/root/testdata/sf0.01"

  test("join_bloom_prune result is identical to the unfiltered join") {
    val bloomed = ops.Joins.bloomPruneJoin(spark, sf001)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val dim = Tables.orders(spark, sf001)
      .filter(col("o_orderpriority") === "1-URGENT" &&
              col("o_totalprice") > 150000)
      .select(col("o_orderkey"), col("o_orderdate"))
    val fact = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val plain = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(graft.ops.Num.rnd(
             sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
             .as("revenue"),
           count(lit(1)).as("n_items"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(bloomed.nonEmpty && bloomed.sameElements(plain),
           "bloom pruning changed the join result")
  }

  test("the bloom probe prunes the fact side and admits every true match") {
    val dim = Tables.orders(spark, sf001)
      .filter(col("o_orderpriority") === "1-URGENT" &&
              col("o_totalprice") > 150000)
      .select(col("o_orderkey"))
    val bloom = dim.stat.bloomFilter("o_orderkey", 1 << 17, 0.03)
    val fact = Tables.lineitem(spark, sf001)
    val total = fact.count()
    val kept = fact
      .filter(functions.BloomMightContain.col(col("l_orderkey"), bloom))
      .count()
    val trueMatches = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"),
                                "left_semi").count()
    assert(kept < total, s"bloom probe pruned nothing ($kept of $total)")
    assert(kept >= trueMatches,
           s"bloom probe dropped true matches ($kept < $trueMatches)")
    // fpp 3% on a 17-bit capacity: the surviving superset stays close to
    // the exact semi-join (generous 10% slack keeps this data-robust)
    assert(kept <= trueMatches + (total * 0.10).toLong,
           s"bloom probe barely pruned: kept=$kept exact=$trueMatches")
  }

  test("BloomMightContain is codegen-compatible and interpreted-consistent") {
    val dim = Tables.orders(spark, sf001).limit(200).select(col("o_orderkey"))
    val bloom = dim.stat.bloomFilter("o_orderkey", 1 << 10, 0.03)
    val keys = Tables.orders(spark, sf001).select(col("o_orderkey"))
    val probe = functions.BloomMightContain.col(col("o_orderkey"), bloom)
    val viaPlan = keys.filter(probe).count()
    // interpreted path (nullSafeEval) must agree with the codegen path
    val interpreted = keys.collect()
      .count(r => bloom.mightContainLong(r.getLong(0)))
    assert(viaPlan === interpreted.toLong)
  }
}
