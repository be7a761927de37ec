package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: child-size balance of the depth-1 split at a
  * given dir — how even is whatever split rule [[Similarity.cellSplit]]
  * CURRENTLY implements (median-threshold bisection since round 16;
  * this tool's 96%-max-child readings falsified the historical
  * 2-lowest-member-id rule — BASELINE round 16). Measurement-only. */
object SplitDist {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rep = Similarity.cellSplit(spark, dir)
      .filter(col("split") === 1)
      .select(col("n_before"),
              (col("n_max_after") * 100L / col("n_before")).as("max_share_pct"))
    rep.agg(count(lit(1)).as("n_split_cells"),
            avg("max_share_pct").as("avg_max_share_pct"),
            expr("percentile_approx(max_share_pct, 0.5)").as("p50"),
            expr("percentile_approx(max_share_pct, 0.9)").as("p90"),
            min("max_share_pct").as("min"), max("max_share_pct").as("max"))
      .show(false)
    spark.stop()
  }
}
