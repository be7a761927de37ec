package graft

import org.apache.spark.sql.functions._

/** Join algebra invariants — SURVEY §5 property list. */
class JoinsSpec extends SparkSpec {

  private def customers = spark.read.parquet(s"$sf0001/customer.parquet")
  private def nations = spark.read.parquet(s"$sf0001/nation.parquet")
  private def orders = spark.read.parquet(s"$sf0001/orders.parquet")

  test("broadcast and non-broadcast left join agree") {
    val c = customers; val n = nations
    val withHint = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .select(c("c_custkey"), n("n_name"))
    val without = c.join(n, c("c_nationkey") === n("n_nationkey"), "left")
      .select(c("c_custkey"), n("n_name"))
    assert(withHint.exceptAll(without).count() === 0)
    assert(without.exceptAll(withHint).count() === 0)
  }

  test("semi-join equals collect+isin on distinct keys (P7 ≡ J2)") {
    val keys = orders.select("o_custkey").distinct()
      .collect().map(_.getLong(0)).toSeq
    val viaIsin = customers.filter(col("c_custkey").isin(keys: _*))
      .select("c_custkey")
    val viaSemi = customers.join(
      orders.select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_semi")
      .select("c_custkey")
    assert(viaIsin.exceptAll(viaSemi).count() === 0)
    assert(viaSemi.exceptAll(viaIsin).count() === 0)
  }

  test("semi + anti partition the left side") {
    val semi = Joins.count("left_semi")
    val anti = Joins.count("left_anti")
    assert(semi + anti === customers.count())
  }
  private object Joins {
    def count(kind: String): Long =
      customers.join(orders.select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), kind).count()
  }

  test("broadcast plan actually broadcasts (BroadcastHashJoin in physical plan)") {
    val c = customers; val n = nations
    val plan = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan was:\n$plan")
  }

  test("join match rate is 100% on enclosed foreign keys") {
    val row = ops.Joins.matchRate(spark, sf0001).head()
    assert(row.getAs[Long]("total") === row.getAs[Long]("matched"))
    assert(row.getAs[Double]("match_pct") === 100.0)
  }
}
