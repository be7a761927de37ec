package graft

import org.apache.spark.sql.functions._

class WindowsSpec extends SparkSpec {

  test("top-k per group returns at most k rows per group") {
    val counts = ops.Windows.topkPerGroup(spark, sf0001)
      .groupBy("c_mktsegment").count().collect()
    assert(counts.nonEmpty)
    counts.foreach(r => assert(r.getLong(1) <= 5))
  }

  test("stratified sample caps at min(100, group size) and is deterministic") {
    val customers = spark.read.parquet(s"$sf0001/customer.parquet")
    val groupSizes = customers.groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = ops.Windows.sampleStratified(spark, sf0001)
    val sCounts = sampled.groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    groupSizes.foreach { case (seg, n) =>
      assert(sCounts(seg) === math.min(100L, n))
    }
    // determinism: two runs identical
    val again = ops.Windows.sampleStratified(spark, sf0001)
    assert(sampled.exceptAll(again).count() === 0)
  }

  test("seeded-rand sample has deterministic per-group counts (W1)") {
    val customers = spark.read.parquet(s"$sf0001/customer.parquet")
    val expected = customers.groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> math.min(100L, r.getLong(1))).toMap
    val got = ops.Windows.sampleRand(spark, sf0001)
      .groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("running sum is monotone for positive values") {
    val bad = ops.Windows.runningSum(spark, sf0001)
      .withColumn("prev", lag(col("running_spend"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey")
          .orderBy(col("running_spend"))))
      .filter(col("prev").isNotNull && col("running_spend") < col("prev"))
    assert(bad.count() === 0)
  }

  test("sort_limit returns the global top 10 by price") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val maxPrice = orders.agg(max("o_totalprice")).head().getDouble(0)
    val top = ops.Windows.sortLimit(spark, sf0001).collect()
    assert(top.length === 10)
    assert(top.head.getAs[Double]("o_totalprice") === maxPrice)
  }

  test("cumulative distinct equals brute running-set recompute") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
              col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expect = ev.groupBy(_._1).values.flatMap { xs =>
      val seen = collection.mutable.Set[String]()
      xs.sortBy(t => (t._2, t._3)).map { case (u, _, id, t) =>
        val first = seen.add(t)
        (u, id) -> ((if (first) 1 else 0, seen.size.toLong))
      }
    }.toMap
    val got = ops.Windows.cumDistinct(spark, sf0001)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getLong(3))))
      .toMap
    assert(got === expect)
    // the final value per user == that user's true distinct type count
    val finals = ev.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(_._4).distinct.length.toLong
    }
    ev.groupBy(_._1).foreach { case (u, xs) =>
      val lastId = xs.maxBy(t => (t._2, t._3))._3
      assert(got((u, lastId))._2 === finals(u))
    }
  }
}
