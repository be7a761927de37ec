package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Partition-layout hygiene for the 100 TB design point: a filter on the
  * partition column must prune at the FILE level (PartitionFilters in the
  * scan), not scan-then-filter. */
class PartitionPruningSpec extends SparkSpec {

  test("hive-style partitioned write + partition-pruned read") {
    val out = Files.createTempDirectory("graft-part").toString
    spark.read.parquet(s"$sf0001/orders.parquet")
      .write.partitionBy("o_orderpriority").mode("overwrite").parquet(out)

    val q = spark.read.parquet(out)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_totalprice")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("isnotnull(o_orderpriority") ||
           plan.contains("(o_orderpriority"), plan)
    // the pruned read equals the filtered full read
    val expected = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(q.count() === expected)
  }

  test("approximate aggregates land within tolerance of exact") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val row = li.agg(
      approx_count_distinct(col("l_orderkey"), 0.02).as("apx"),
      countDistinct(col("l_orderkey")).as("exact"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50"),
      expr("percentile(l_extendedprice, 0.5)").as("p50_exact")).head()
    val (apx, exact) = (row.getLong(0), row.getLong(1))
    assert(math.abs(apx - exact).toDouble / exact < 0.05,
      s"approx_count_distinct $apx vs $exact")
    val (p50, p50e) = (row.getDouble(2), row.getDouble(3))
    assert(math.abs(p50 - p50e) / p50e < 0.05, s"p50 $p50 vs $p50e")
  }
}
