package graft.ext

import graft.Tables
import graft.ops.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-window operators over the `events` table — SURVEY §2.9.
  *
  * The reference implements no streaming (milestone-doc aspiration only);
  * these are the batch shapes of our Structured Streaming extension:
  * identical `window()`/`session_window()` expressions run under
  * `readStream` in streaming/EventStream.scala, and StreamingSpec proves
  * batch ≡ streaming on the same data. Window starts are emitted as
  * formatted strings so the DuckDB oracle compares text, not
  * engine-specific timestamp encodings.
  */
object TimeOps {

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  /** Tumbling 1-hour windows per event type. */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Num.rnd(sum("value"), 2).as("sum_v"))
      .select(date_format(col("window.start"), fmt).as("ws"),
              col("event_type"), col("n"), col("sum_v"))

  /** Sliding 2-hour windows every 1 hour (each event in 2 windows). */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), fmt).as("ws"),
              col("event_type"), col("n"))

  /** Session windows: 5-minute inactivity gap per user. */
  def session(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
              date_format(col("session_window.start"), fmt).as("session_start"),
              col("n"))

  /** As-of join, composed Spark-first (SURVEY preference (a): built-in
    * composition before custom operators): each purchase event picks up
    * the most recent prior-or-simultaneous click by the same user.
    * Union both sides tagged, one window pass per user ordered by
    * (ts, side) with `last(..., ignoreNulls)` carrying the b-side
    * forward — a single shuffle on user_id, no range cross-product.
    * DuckDB's native ASOF LEFT JOIN is the oracle. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
              lit(1).as("is_a"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
              lit(0).as("is_a"))
    // b-side sorts before a-side at equal ts → `>=` (inclusive) semantics
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("is_a").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("click_id",
        last(when(col("is_a") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_value",
        last(when(col("is_a") === 0, col("value")), ignoreNulls = true).over(w))
      .filter(col("is_a") === 1)
      .select(col("event_id"), col("user_id"),
              date_format(col("ts"), fmt).as("ats"),
              col("click_id"), col("click_value"))
  }

  /** Interval (range) join: purchases within 1 hour after a click by the
    * same user — the batch shape of EventStream.clickPurchaseJoin
    * (StreamingSpec proves stream ≡ batch). Equi-key on user bounds the
    * range explosion: shuffle by user, per-user interval scan. */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
              col("event_id").as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
              col("event_id").as("p_id"))
    clicks.join(purchases,
      expr("user_id = p_user AND p_ts >= click_ts " +
           "AND p_ts <= click_ts + INTERVAL 1 HOUR"))
      .select(col("click_id"), col("p_id"), col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_tumbling"      -> tumbling _,
    "time_sliding"       -> sliding _,
    "time_session"       -> session _,
    "time_asof_join"     -> asofJoin _,
    "time_interval_join" -> intervalJoin _)

  val oracle: Map[String, String] = Map(
    "time_tumbling" ->
      ("SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ws, " +
       "event_type, count(*) AS n, round((sum(value)) * 1e2) / 1e2 AS sum_v " +
       "FROM events GROUP BY 1, 2"),
    // A 2h-window/1h-slide assigns each event to windows starting at
    // trunc_hour(ts) and trunc_hour(ts) - 1h.
    "time_sliding" ->
      ("SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS ws, event_type, count(*) AS n FROM (" +
       "SELECT date_trunc('hour', ts) AS ws, event_type FROM events " +
       "UNION ALL " +
       "SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, event_type FROM events" +
       ") t GROUP BY 1, 2"),
    // Gaps-and-islands reconstruction of 5-minute-gap sessions: a new
    // session starts when the previous event is >= 5 minutes away
    // (Spark's session window end = last event + gap, exclusive).
    "time_session" ->
      ("WITH x AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL " +
       "OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE THEN 1 ELSE 0 END AS new_s " +
       "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
       "y AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts " +
       "ROWS UNBOUNDED PRECEDING) AS sid FROM x) " +
       "SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start, " +
       "count(*) AS n FROM y GROUP BY user_id, sid"),
    "time_asof_join" ->
      ("SELECT a.event_id, a.user_id, strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS ats, " +
       "b.event_id AS click_id, b.value AS click_value " +
       "FROM (SELECT * FROM events WHERE event_type = 'purchase') a " +
       "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b " +
       "ON a.user_id = b.user_id AND a.ts >= b.ts"),
    "time_interval_join" ->
      ("SELECT c.event_id AS click_id, p.event_id AS p_id, c.user_id " +
       "FROM (SELECT * FROM events WHERE event_type = 'click') c " +
       "JOIN (SELECT * FROM events WHERE event_type = 'purchase') p " +
       "ON c.user_id = p.user_id AND p.ts >= c.ts " +
       "AND p.ts <= c.ts + INTERVAL 1 HOUR"))
}
