package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level decomposition of the split-serve cost at scale — the
  * diagnostic behind the round-16 knee measurement: per stage, wall /
  * task CPU / tasks for the unsplit serve, the split build, and the
  * split serve, each run twice (first = cold builds, second = memo-hit
  * marginal cost). Measurement-only tool; never part of the driver
  * contract. Usage: runMain graft.ext.SplitProbe <dir>. */
object SplitProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
              "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = new graft.BenchMetrics
    spark.sparkContext.addSparkListener(m)
    def time(name: String)(df: => DataFrame): Unit = {
      val before = m.snapshot(spark.sparkContext)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val d = m.delta(spark.sparkContext, before)
      println(f"$name%-30s wall ${sec}%8.2f  cpu ${d("task_ms") / 1000.0}%9.1f" +
        f"  gc ${d("gc_ms") / 1000.0}%7.1f  tasks ${d("n_tasks")}%4d" +
        f"  spill ${(d("mem_spill_b") + d("disk_spill_b")) / 1e9}%6.2f G")
    }
    time("warmup count")(graft.Tables.embeddings(spark, dir).groupBy().count())
    time("ivfassign build")(Similarity.ivfAssignRanked(spark, dir))
    time("ivfassign again")(Similarity.ivfAssignRanked(spark, dir))
    time("ivf_topk serve")(Similarity.ivfTopK(spark, dir))
    time("ivf_topk again")(Similarity.ivfTopK(spark, dir))
    time("cell_split report")(Similarity.cellSplit(spark, dir))
    time("cell_split again")(Similarity.cellSplit(spark, dir))
    time("split_topk serve")(Similarity.splitTopK(spark, dir))
    time("split_topk again")(Similarity.splitTopK(spark, dir))
    // observed candidate volumes — the structural claim behind the
    // split (per-probe candidates ≈ the probed bucket's occupancy, so
    // splitting halves them at the source); mirrors ivfCandidates /
    // splitServeFrom's candidate stages exactly
    println(s"ivf candidate rows:   ${Similarity.ivfCandidates(spark, dir).count()}")
    val (_, hot, members, seeds, assigned) = Similarity.cellSplitParts(spark, dir)
    val emb = Similarity.embWithNrm(spark, dir)
    val postings = Similarity.splitPostings(hot, members, assigned)
    val probed = Similarity.ivfAssignRanked(spark, dir).select("vec_id", "cell")
    val probes = emb.join(
      Similarity.probeDescend(emb, probed, hot, seeds)
        .withColumnRenamed("cell", "ncell"), Seq("vec_id"))
    val splitCand = Similarity.pairCandidatesAB(
        probes, emb.join(postings, Seq("vec_id")), "ncell", 1024)
      .filter(col("a_id") =!= col("b_id"))
    println(s"split candidate rows: ${splitCand.count()}")
    // recall prices at this scale (integer micro, shared truth)
    Seq("sim_ivf_recall_eval", "sim_split_recall_eval",
        "sim_split_deep_recall_eval").foreach { q =>
      val r = Similarity.queries(q)(spark, dir).collect().head
      println(s"$q: n_truth ${r.getLong(0)} n_hit ${r.getLong(2)} " +
        s"recall_micro ${r.getLong(3)}")
    }
    spark.stop()
  }
}
