package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the SPLIT-served mutual-kNN edge frame against the audited
  * unsplit one for the graph family (round-17 verdict item 6): the
  * graph_* consumers deliberately ride the `knnmutual` memo while
  * `knnmutualsplit` measured 425 vs 628 s task CPU at 768 k — a
  * quality-vs-cost trade this tool quantifies so the keep-or-switch
  * decision is a measurement, not a guess. Reports, as ONE JSON line:
  * build wall seconds per edge set, edge counts + overlap, and the
  * downstream connected-component labels' node-level agreement (both
  * label sets are min-reachable vec_id over the SAME CC loop —
  * Graph.componentsOverEdges — so equal labels mean equal components).
  *
  * Usage: scripts/run_main.sh graft.tools.GraphEdgePrice <dir>
  * Scale-measurement tool (knee dirs) — not an oracle query.
  */
object GraphEdgePrice {
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
    graft.ext.CapMetrics.register(spark)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (e1, w1) = timed {
      graft.ext.Similarity.knnMutual(spark, dir).select("a_id", "b_id")
    }
    val n1 = e1.count()
    val (e2, w2) = timed {
      graft.ext.Similarity.knnMutualSplit(spark, dir).select("a_id", "b_id")
    }
    val n2 = e2.count()
    val overlap = e1.join(e2, Seq("a_id", "b_id")).count()
    val (c1, wc1) = timed {
      graft.ext.Graph.componentsOverEdges(spark, dir, e1).localCheckpoint()
    }
    val (c2, wc2) = timed {
      graft.ext.Graph.componentsOverEdges(spark, dir, e2).localCheckpoint()
    }
    val joined = c1.withColumnRenamed("comp", "c1")
      .join(c2.withColumnRenamed("comp", "c2"), Seq("vec_id"))
    val nodes = joined.count()
    val agree = joined.filter(col("c1") === col("c2")).count()
    println(
      s"""{"dir":"$dir","edges_unsplit":$n1,"edges_split":$n2,""" +
      s""""overlap":$overlap,"build_s_unsplit":${w1.round},""" +
      s""""build_s_split":${w2.round},"cc_s_unsplit":${wc1.round},""" +
      s""""cc_s_split":${wc2.round},"nodes":$nodes,""" +
      s""""label_agree":$agree,""" +
      s""""label_agree_micro":${if (nodes == 0) 0 else agree * 1000000L / nodes}}""")
    spark.stop()
  }
}
