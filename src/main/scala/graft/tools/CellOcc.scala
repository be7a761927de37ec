package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: home-cell occupancy distribution of the IVF assignment
  * at a given sfDir — the number that says whether the per-bucket
  * candidate cap can bind (max occupancy vs the cap) and what
  * [[graft.ext.Similarity.cellSplit]] would re-shard. Usage:
  * runMain graft.tools.CellOcc <sfDir> */
object CellOcc {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
              "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val occ = graft.ext.Similarity.queries("sim_ivf_assign")(spark, dir)
      .groupBy("cell").agg(count(lit(1)).as("n"))
    occ.agg(count(lit(1)).as("n_cells"), max("n").as("max_occ"),
            avg("n").as("avg_occ"),
            sum(when(col("n") > 64, col("n") - 64).otherwise(0L))
              .as("excess_over_64"),
            sum(when(col("n") > 1024, col("n") - 1024).otherwise(0L))
              .as("excess_over_1024"))
      .show(false)
    occ.orderBy(col("n").desc).show(10, false)
    spark.stop()
  }
}
