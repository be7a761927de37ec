package graft

import org.apache.spark.sql.SparkSession

/** Plan-dump utility: `runMain graft.Scratch <queryName> [sfDir]` prints
  * the executed physical plan for any registered query (dev tool, not
  * part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("flagship")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (name == "streamdemo") {
      // drive the streaming surface end-to-end: file stream -> stateful
      // agg -> foreachBatch idempotent parquet sink
      val tmp = java.nio.file.Files.createTempDirectory("graft-streamdemo")
      java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$tmp/in"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        java.nio.file.Paths.get(s"$tmp/in/events.parquet"))
      streaming.EventStream.runToParquet(
        streaming.EventStream.userTotals(
          spark, streaming.EventStream.readEvents(spark, s"$tmp/in")),
        s"$tmp/out", s"$tmp/ckpt")
      val n = spark.read.parquet(s"$tmp/out").count()
      println(s"STREAMDEMO_ROWS=$n")
      spark.stop()
      return
    }
    val df = SparkEntry.queries(name)(spark, dir)
    println(s"===== $name (logical, optimized) =====")
    println(df.queryExecution.optimizedPlan.toString)
    println(s"===== $name (physical) =====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
