package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flagship multi-join analytics — the Athena-layer questions the
  * reference implies (`README.md:30` "price vs income/education by
  * state/ZIP") expressed as TPC-H-shaped plans that exercise the
  * optimizer end-to-end: join ordering, broadcast selection, partial
  * aggregation, top-k lowering.
  */
object Analytics {

  /** Q3-shaped: revenue top-10 for a segment in a date window.
    * 3-way join (customer ⋈ orders ⋈ lineitem) + group + ordered limit —
    * Catalyst broadcasts the filtered customer side at this scale; at
    * 100 TB AQE picks shuffle strategy per stats. */
  def q3TopK(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > to_timestamp(lit("1997-01-01 00:00:00")))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(l("l_orderkey"),
               date_format(o("o_orderdate"), "yyyy-MM-dd").as("odate"),
               o("o_orderpriority"))
      .agg(Num.rnd(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
             .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** Q5-shaped: revenue by nation where the supplying and buying nations
    * match, restricted to one region. 6-table join tree. */
  def q5RegionVolume(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .join(s, l("l_suppkey") === s("s_suppkey") &&
               c("c_nationkey") === s("s_nationkey"))
      .join(n, s("s_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(n("n_name"))
      .agg(Num.rnd(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
             .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** Q18-shaped: large-quantity orders — a HAVING aggregate that SHRINKS
    * the fact table first (rare heavy orders), then enrich joins against
    * orders/customer move almost nothing. The agg-before-join ordering is
    * the 100 TB discipline: the alternative (join first, filter later)
    * shuffles the whole lineitem×orders product. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > 300)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(big, o("o_orderkey") === big("l_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
              date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
              col("o_totalprice"),
              Num.rnd(col("total_qty"), 2).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
  }

  /** Correlation analytic — the literal question the reference's Athena
    * layer exists to answer (`/root/reference/README.md:30` "does price
    * correlate with income, education, unemployment"), expressed over the
    * fact columns: per-group Pearson correlation, sample covariance, and
    * the least-squares slope. All three are one-pass streaming co-moment
    * aggregates (partial+final merge, one shuffle by group key) — the
    * shape that scales to 100 TB, unlike a materialize-and-regress pass.
    *
    * Float discipline: corr/slope are O(1)-conditioned ratios of
    * co-moments (no catastrophic cancellation in either engine's
    * streaming update), so fp disagreement between Spark's and DuckDB's
    * accumulation orders is ~1e-12 absolute — rounding at 6 dp has ≥1e5×
    * margin. covar_samp is a co-moment over n (not a raw big sum), error
    * ~1e-9 at sf scales — 4 dp is safe (the CLAUDE.md big-sum rule
    * applies to un-normalized Σ of money columns, not per-row means). */
  def corrAnalytic(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
           Num.rnd(corr(col("l_quantity"), col("l_extendedprice")), 6)
             .as("corr_qty_price"),
           Num.rnd(corr(col("l_extendedprice"), col("l_discount")), 6)
             .as("corr_price_disc"),
           Num.rnd(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
             .as("covar_qty_price"),
           Num.rnd(expr("regr_slope(l_extendedprice, l_quantity)"), 6)
             .as("slope_price_qty"))
      .orderBy("l_returnflag")

  /** Referential-integrity audit across the star schema in one result —
    * the data-quality gate a warehouse load runs before publishing:
    * orphan counts for each FK edge (fact rows whose parent is
    * missing). Each edge is a left-anti count — only join KEYS move,
    * dimensions broadcast where small, and the per-edge aggregates are
    * single scalars unioned into one report. The reference hand-rolls
    * the idea as per-table count assertions
    * (`/root/reference/real_estate_etl_job.py:136-150`); this is the
    * join-level generalization. */
  def refIntegrity(spark: SparkSession, dir: String): DataFrame = {
    // one pass per edge (J3's count(col)-skips-nulls idiom): left join
    // onto distinct parent keys, orphans = rows with no hit — total and
    // orphan counts come from the same aggregate, nothing runs eagerly
    def orphans(fact: DataFrame, fk: String, dim: DataFrame, pk: String,
                edge: String): DataFrame =
      fact.select(col(fk).as("k"))
        .join(dim.select(col(pk).as("k"), lit(1).as("hit")).distinct(),
              Seq("k"), "left")
        .agg(count(lit(1)).as("n_rows"),
             (count(lit(1)) - count(col("hit"))).as("n_orphans"))
        .select(lit(edge).as("fk_edge"), col("n_orphans"), col("n_rows"))
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val s = Tables.supplier(spark, dir)
    orphans(l, "l_orderkey", o, "o_orderkey", "lineitem->orders")
      .unionByName(orphans(l, "l_suppkey", s, "s_suppkey", "lineitem->supplier"))
      .unionByName(orphans(o, "o_custkey", c, "c_custkey", "orders->customer"))
      .unionByName(orphans(c, "c_nationkey", n, "n_nationkey", "customer->nation"))
      .orderBy("fk_edge")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "audit_referential" -> refIntegrity _,
    "q3_topk"          -> q3TopK _,
    "q5_region_volume" -> q5RegionVolume _,
    "q18_large_orders" -> q18LargeOrders _,
    "agg_corr"         -> corrAnalytic _)

  val oracle: Map[String, String] = Map(
    "audit_referential" ->
      ("WITH e1 AS (SELECT 'lineitem->orders' AS fk_edge, " +
       "CAST(count(*) - count(o.k) AS BIGINT) AS n_orphans, count(*) AS n_rows " +
       "FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) o " +
       "ON l.l_orderkey = o.k), " +
       "e2 AS (SELECT 'lineitem->supplier' AS fk_edge, " +
       "CAST(count(*) - count(s.k) AS BIGINT) AS n_orphans, count(*) AS n_rows " +
       "FROM lineitem l LEFT JOIN (SELECT DISTINCT s_suppkey AS k FROM supplier) s " +
       "ON l.l_suppkey = s.k), " +
       "e3 AS (SELECT 'orders->customer' AS fk_edge, " +
       "CAST(count(*) - count(c.k) AS BIGINT) AS n_orphans, count(*) AS n_rows " +
       "FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) c " +
       "ON o.o_custkey = c.k), " +
       "e4 AS (SELECT 'customer->nation' AS fk_edge, " +
       "CAST(count(*) - count(n.k) AS BIGINT) AS n_orphans, count(*) AS n_rows " +
       "FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey AS k FROM nation) n " +
       "ON c.c_nationkey = n.k) " +
       "SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL " +
       "SELECT * FROM e3 UNION ALL SELECT * FROM e4 ORDER BY fk_edge"),
    "agg_corr" ->
      ("SELECT l_returnflag, count(*) AS n, " +
       "round((corr(l_quantity, l_extendedprice)) * 1e6) / 1e6 AS corr_qty_price, " +
       "round((corr(l_extendedprice, l_discount)) * 1e6) / 1e6 AS corr_price_disc, " +
       "round((covar_samp(l_quantity, l_extendedprice)) * 1e4) / 1e4 AS covar_qty_price, " +
       "round((regr_slope(l_extendedprice, l_quantity)) * 1e6) / 1e6 AS slope_price_qty " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q3_topk" ->
      ("SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate, " +
       "o_orderpriority, " +
       "round((sum(l_extendedprice * (1 - l_discount))) * 1e2) / 1e2 AS revenue " +
       "FROM customer JOIN orders ON c_custkey = o_custkey " +
       "JOIN lineitem ON o_orderkey = l_orderkey " +
       "WHERE c_mktsegment = 'BUILDING' " +
       "AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' " +
       "AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00' " +
       "GROUP BY l_orderkey, odate, o_orderpriority " +
       "ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"),
    "q5_region_volume" ->
      ("SELECT n_name, " +
       "round((sum(l_extendedprice * (1 - l_discount))) * 1e2) / 1e2 AS revenue " +
       "FROM customer JOIN orders ON c_custkey = o_custkey " +
       "JOIN lineitem ON o_orderkey = l_orderkey " +
       "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
       "JOIN nation ON s_nationkey = n_nationkey " +
       "JOIN region ON n_regionkey = r_regionkey " +
       "WHERE r_name = 'ASIA' " +
       "GROUP BY n_name ORDER BY revenue DESC, n_name ASC"),
    "q18_large_orders" ->
      ("SELECT c_name, c_custkey, o_orderkey, " +
       "strftime(o_orderdate, '%Y-%m-%d') AS odate, o_totalprice, " +
       "round((total_qty) * 1e2) / 1e2 AS total_qty " +
       "FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty FROM lineitem " +
       "GROUP BY 1 HAVING sum(l_quantity) > 300) b " +
       "JOIN orders ON o_orderkey = b.l_orderkey " +
       "JOIN customer ON o_custkey = c_custkey " +
       "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20"))
}
