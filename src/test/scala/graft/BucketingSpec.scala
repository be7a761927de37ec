package graft

import org.apache.spark.sql.functions._

/** Bucketing is the 100 TB co-location story: two fact tables bucketed on
  * the join key join WITHOUT a shuffle (SURVEY §7.3 standing rules).
  * This spec proves the plan shape, not just the result. */
class BucketingSpec extends SparkSpec {

  test("bucketed co-located join requires no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS cust_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    spark.read.parquet(s"$sf0001/customer.parquet")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("cust_b")
    spark.read.parquet(s"$sf0001/orders.parquet")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("ord_b")

    // force a non-broadcast strategy so the shuffle-elision is what's
    // actually under test (tiny tables would otherwise broadcast)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = spark.table("cust_b")
      .join(spark.table("ord_b"), col("c_custkey") === col("o_custkey"))
      .groupBy("c_custkey").agg(count(lit(1)).as("n"))
    // initial physical plan: the join itself must not introduce a shuffle
    val plan = j.queryExecution.sparkPlan.toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a non-broadcast join, plan:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle, plan:\n$plan")

    // and the result matches the plain (shuffling) join
    val plain = spark.read.parquet(s"$sf0001/customer.parquet")
      .join(spark.read.parquet(s"$sf0001/orders.parquet"),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_custkey").agg(count(lit(1)).as("n"))
    assert(j.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(j).count() === 0)
  }

  test("salted agg and salted join equal their unsalted forms") {
    val salted = ops.Skew.saltedAgg(spark, sf0001)
    val plain = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(ops.Num.rnd(sum("l_quantity"), 2).as("sum_qty"),
           count(lit(1)).as("n"))
      .orderBy("l_returnflag")
    assert(salted.exceptAll(plain).count() === 0)

    val sJoin = ops.Skew.saltedJoin(spark, sf0001)
    val pJoin = SparkEntry.queries("flagship")(spark, sf0001) // different agg — just sanity
    assert(sJoin.count() > 0 && pJoin.count() > 0)
    // exact equivalence vs plain join count per nation
    val plainJoin = spark.read.parquet(s"$sf0001/customer.parquet")
      .join(spark.read.parquet(s"$sf0001/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n_customers"))
      .orderBy("n_name")
    assert(sJoin.exceptAll(plainJoin).count() === 0)
  }
}
