package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the purchase graph (customer ↔ supplier edges
  * derived from `orders` ⋈ `lineitem` — the entity-relationship shape
  * the reference's star schema implies but never analyzes; its Athena
  * layer stops at joins/aggregations, `/root/reference/README.md:28-31`).
  * Complements
  * the dedup family's connected components (`Dedup.clusters`) with an
  * ITERATIVE VALUE computation: Pregel-style rounds expressed as
  * join + aggregate, the shape GraphX/Pregel lowers to.
  *
  * Everything is INTEGER arithmetic in micro-units: per-round
  * contributions are `rank div deg` (floor), the damping update is
  * `(85 * Σ) div 100` — no doubles anywhere, so results are exactly
  * reproducible across engines, partitionings, and reruns, and the
  * DuckDB oracle unrolls the identical rounds as CTEs.
  */
object Graph {

  /** Undirected bipartite purchase graph as a directed edge list (both
    * directions), nodes tagged 'c'/'s' so key spaces can't collide.
    * One fact-fact join + distinct — both shuffles on the join key. */
  private def edgesOf(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
    val cs = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("c"),
              concat(lit("s"), col("l_suppkey")).as("s"))
      .distinct()
    cs.select(col("c").as("src"), col("s").as("dst"))
      .union(cs.select(col("s").as("src"), col("c").as("dst")))
  }

  /** Edge list with the source's degree pre-attached, materialized ONCE
    * per (session, dir) — each rank round then needs exactly ONE join
    * (edges ⋈ ranks) instead of edges ⋈ ranks ⋈ degrees, and the
    * fact-fact build join + distinct runs exactly once (its temporary
    * checkpoint is freed as soon as the degree-joined frame lands, per
    * the unpersist-big-intermediates rule). First bench shape
    * (edges-only checkpoint, degrees recomputed per reference) cost
    * 11 s at sf0.1; this is the amortized form. Eager-memoized like the
    * dedup pair frames (NOT in PlanShapeSpec's laziness allowlist;
    * Bench owner: graph_pagerank). */
  private def edgesCkpt(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "graphedges"), {
      val raw = edgesOf(spark, dir).localCheckpoint()
      val deg = raw.groupBy("src").agg(count(lit(1)).as("deg"))
      val out = raw.join(deg, Seq("src")).localCheckpoint()
      org.apache.spark.sql.GraftSql.checkpointRdd(raw)
        .foreach(_.unpersist(false))
      out
    })

  /** Degree frame = the node list (|nodes| rows, one per src) — derived
    * from the degree-joined edge checkpoint, so no re-aggregation of
    * the raw pair join ever happens. */
  private def degCkpt(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "graphdeg"),
      edgesCkpt(spark, dir).select(col("src"), col("deg")).distinct()
        .localCheckpoint())

  /** Fixed-round PageRank (damping 0.85, 3 rounds — the constant is
    * mirrored by the oracle's unrolled CTEs; keep in lockstep). Each
    * round is one shuffle join of the edge list with the rank frame on
    * `src` plus one aggregation by `dst` — rank state is |nodes| rows,
    * edges never rewrite. At 100 TB this is the exact Pregel superstep
    * shape: co-partition edges and ranks on the join key and the
    * per-round shuffle moves only rank deltas. Isolated nodes don't
    * exist by construction (every node comes from an edge), so the
    * LEFT join + coalesce(0) only guards rounding-starved corners. */
  def pagerank(spark: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    val edges = edgesCkpt(spark, dir) // (src, dst, deg) — deg pre-attached
    val nodes = degCkpt(spark, dir).select(col("src").as("node"), col("deg"))
    var r = nodes.select(col("node"), lit(1000000L).as("r"))
    for (_ <- 1 to rounds) {
      val contrib = edges
        .join(r, edges("src") === r("node"))
        .select(col("dst").as("node"), expr("r div deg").as("ct"))
        .groupBy("node").agg(sum("ct").as("c"))
      r = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
                (lit(150000L) + expr("(85 * coalesce(c, 0)) div 100")).as("r"))
    }
    nodes.join(r, Seq("node"))
      .select(col("node"), col("deg"), col("r").as("rank_micro"))
  }

  private def rankRound(prev: String, out: String): String =
    s"c$out AS (SELECT e.dst AS node, CAST(sum($prev.r // d.deg) AS BIGINT) AS c " +
      s"FROM e JOIN $prev ON e.src = $prev.node JOIN deg d ON e.src = d.node " +
      s"GROUP BY e.dst), " +
    s"$out AS (SELECT deg.node, 150000 + (85 * coalesce(c$out.c, 0)) // 100 AS r " +
      s"FROM deg LEFT JOIN c$out USING (node))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> ((s, d) => pagerank(s, d)))

  val oracle: Map[String, String] = Map(
    "graph_pagerank" ->
      ("WITH cs AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c, " +
       "'s' || CAST(l_suppkey AS VARCHAR) AS s " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), " +
       "e AS (SELECT c AS src, s AS dst FROM cs " +
       "UNION ALL SELECT s AS src, c AS dst FROM cs), " +
       "deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY src), " +
       "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg), " +
       rankRound("r0", "r1") + ", " + rankRound("r1", "r2") + ", " +
       rankRound("r2", "r3") + " " +
       "SELECT deg.node, deg.deg, r3.r AS rank_micro FROM deg JOIN r3 USING (node)"))
}
