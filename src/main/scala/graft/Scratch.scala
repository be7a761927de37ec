package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf/plan probe (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val df = SparkEntry.queries("dedup_ngram_jaccard")(spark, dir)
    df.count() // let AQE finalize
    val plan = df.queryExecution.executedPlan.toString
    println("PLAN_START")
    println(plan)
    println("PLAN_END")
    spark.stop()
  }
}
