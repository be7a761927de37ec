package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf/plan probe (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tracker = new org.apache.spark.scheduler.SparkListener {
      @volatile var jobs = List.empty[String]
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs ::= Option(j.properties.getProperty("spark.job.description"))
          .getOrElse(j.stageInfos.headOption.map(_.name).getOrElse("?"))
    }
    spark.sparkContext.addSparkListener(tracker)
    SparkEntry.queries("dedup_ngram_jaccard")(spark, "/root/testdata/sf0.001")
    Thread.sleep(500)
    println("JOBS_DURING_CONSTRUCTION=" + tracker.jobs.size)
    tracker.jobs.foreach(j => println("JOB: " + j))
    spark.stop()
  }
}
