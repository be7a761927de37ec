package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-by-stage run report — the Spark-native analog of the reference's
  * printed audit trail + Step-Functions count assertions
  * (`/root/reference/real_estate_etl_job.py:210-221`,
  * `RealEstatePipeline.asl.json:22,34,90,102,126`). */
case class PipelineStats(
    censusZips: Long,
    rawListings: Long,
    afterStateFilter: Long,
    afterNullClean: Long,
    afterCoverage: Long,
    sampled: Long,
    joined: Long,
    matched: Long,
    matchRatePct: Double,
    outputColumns: Int)

/** The reference's 10-step ETL (`/root/reference/real_estate_etl_job.py`),
  * re-expressed Spark-first — same semantics, scale-safe mechanics:
  *
  *  - ONE pass for audit counts (single agg) instead of the reference's
  *    13 uncached full rescans (SURVEY §3.2);
  *  - the census-coverage restriction is a broadcast left-semi JOIN, not
  *    a driver-collected IN list (`:41,96` — unbounded at 100 TB);
  *  - stratified sampling keeps the reference's window shape
  *    (`row_number over (partition by state order by rand(seed))`, `:112-115`);
  *  - the enrichment join broadcasts the census side (`:130-134`);
  *  - final projection emits the 18-column Schema.json contract with the
  *    left `state` kept on ambiguity (`:181`).
  */
object RealEstatePipeline {

  val targetStates = Seq("Massachusetts", "California", "New York")

  /** Step-4 clean columns and the ONE predicate derived from them —
    * shared by [[transform]]'s stage filter and [[run]]'s folded audit
    * so the two can never diverge. The isNotNull conjunction equals the
    * reference's dropna ONLY because listings are read ALL-STRING (Glue
    * DynamicFrame parity — `na.drop` on typed float/double columns would
    * additionally drop NaN); stating the predicate once means a future
    * typed reader moves the stage and the audit together. */
  private val cleanColumns =
    Seq("price", "zip_code", "house_size", "bed", "bath")
  private val cleanOk: Column =
    cleanColumns.map(col(_).isNotNull).reduce(_ && _)
  val outputColumns: Seq[String] = Seq(
    "brokered_by", "status", "price", "bed", "bath", "acre_lot", "street",
    "city", "state", "zip_code", "house_size", "prev_sold_date",
    "census_median_income", "census_population", "census_college_pct",
    "census_unemployment_rate", "census_median_age", "price_per_sqft")

  /** STEP 1: census JSON (one multiLine array file, like
    * `CensusDataFetch.py:153-163` output read at `real_estate_etl_job.py:34`). */
  def readCensus(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** STEP 2: listings CSV, header, all-string (Glue DynamicFrame parity,
    * `real_estate_etl_job.py:49-54`); types arrive via casts in step 8. */
  def readListings(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** Steps 3–9 as one composable transform; sampleSeed mirrors rand(42). */
  def transform(listings: DataFrame, census: DataFrame,
                samplePerState: Int = 100, sampleSeed: Long = 42L): DataFrame = {
    // STEP 3: state IN-list filter (:64-65)
    val inStates = listings.filter(col("state").isin(targetStates: _*))
    // STEP 4: conjunctive NOT NULL clean (:79-85) — the shared cleanOk
    // predicate (the folded audit applies the identical Column)
    val cleaned = inStates.filter(cleanOk)
    // STEP 5: census-coverage restriction — left-semi join, the scale-safe
    // form of the reference's collect+isin (:41,96)
    val censusKeys = census.select(col("zip_code")).distinct()
    val covered = cleaned.join(broadcast(censusKeys), Seq("zip_code"), "left_semi")
    // STEP 6: stratified sample — top-N per state under seeded-random
    // order (:112-115)
    val w = Window.partitionBy("state").orderBy(rand(sampleSeed))
    val sampled = covered
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= samplePerState)
      .drop("rn")
    // STEP 7: broadcast left-outer enrichment join on zip_code (:130-134)
    val joined = sampled.join(
      broadcast(census.withColumnRenamed("state", "census_state")),
      Seq("zip_code"), "left")
    // STEP 8: casts + derived price_per_sqft (:158-163); 2-dp round.
    // try_cast/try_divide reproduce the reference's non-ANSI Spark 3
    // semantics (malformed → null, /0 → null) under Spark 4's ANSI default.
    val derived = joined
      .withColumn("price_num", expr("try_cast(price AS double)"))
      .withColumn("size_num", expr("try_cast(house_size AS double)"))
      .withColumn("price_per_sqft",
        round(try_divide(col("price_num"), col("size_num")), 2))
    // STEP 9: the 18-column contract projection with aliases (:172-191);
    // left `state` survives, census `state` was renamed pre-join (P2)
    derived.select(
      col("brokered_by"), col("status"), col("price_num").as("price"),
      col("bed"), col("bath"), col("acre_lot"), col("street"), col("city"),
      col("state"), col("zip_code"), col("size_num").as("house_size"),
      col("prev_sold_date"),
      col("median_income").as("census_median_income"),
      col("population").as("census_population"),
      col("college_educated_pct").as("census_college_pct"),
      col("unemployment_rate").as("census_unemployment_rate"),
      col("median_age").as("census_median_age"),
      col("price_per_sqft"))
  }

  /** Full run: read → transform → audit → write (STEP 10: single-file
    * header CSV overwrite, `real_estate_etl_job.py:202`), wrapped in the
    * Step-Functions retry contract (`RealEstatePipeline.asl.json:62-72`:
    * 2 attempts, 60 s interval, 2.0 backoff on TaskFailed; exhausted
    * retries rethrow = the Catch → ProcessingFailed state `:73-81`).
    * `onAttempt` is the TaskFailed seam (tests inject transient faults);
    * `retrySleep` is injectable so tests don't wait 60 s. Returns the
    * enriched frame + the audit stats the Step Functions contract checks. */
  def run(spark: SparkSession, listingsCsv: String, censusJson: String,
          outDir: Option[String] = None, samplePerState: Int = 100,
          sampleSeed: Long = 42L, maxAttempts: Int = 2,
          retrySleep: Long => Unit = Thread.sleep,
          onAttempt: Int => Unit = _ => ()): (DataFrame, PipelineStats) = {
    var attempt = 0
    Retry.withBackoff(maxAttempts, intervalMs = 60000L, backoff = 2.0,
                      sleep = retrySleep) {
      attempt += 1
      onAttempt(attempt)
      runOnce(spark, listingsCsv, censusJson, outDir, samplePerState, sampleSeed)
    }.get
  }

  private def runOnce(spark: SparkSession, listingsCsv: String, censusJson: String,
                      outDir: Option[String], samplePerState: Int,
                      sampleSeed: Long): (DataFrame, PipelineStats) = {
    val census = readCensus(spark, censusJson)
    val listings = readListings(spark, listingsCsv)
    val censusKeys = census.select(col("zip_code")).distinct()

    // audit counts: the reference prints a count after EVERY stage (13
    // uncached rescans, SURVEY §3.2). The four stage boundaries are
    // running-AND predicates, so they fold into ONE conditional
    // aggregation over ONE listings scan — each sum is exactly the
    // corresponding staged count (PipelineSpec pins both the values and
    // the ≤ 2 total CSV scans per run: this agg + the cache fill).
    // Coverage is a broadcast LEFT join against the distinct census
    // keys (no row multiplication), marker-null = uncovered.
    val stateOk = col("state").isin(targetStates: _*)
    val staged = listings
      .join(broadcast(censusKeys.withColumn("__census_cov", lit(1))),
            Seq("zip_code"), "left")
      .agg(
        count(lit(1)).as("raw"),
        sum(when(stateOk, 1L).otherwise(0L)).as("in_states"),
        sum(when(stateOk && cleanOk, 1L).otherwise(0L)).as("cleaned"),
        sum(when(stateOk && cleanOk && col("__census_cov").isNotNull, 1L)
              .otherwise(0L)).as("covered"))
      .head()

    val enriched = transform(listings, census, samplePerState, sampleSeed).cache()
    val audit = enriched.agg(
      count(lit(1)).as("joined"),
      count(col("census_median_income")).as("matched")).head()
    val (joinedN, matchedN) = (audit.getLong(0), audit.getLong(1))
    val stats = PipelineStats(
      censusZips = censusKeys.count(),
      rawListings = staged.getLong(0),
      afterStateFilter = staged.getLong(1),
      afterNullClean = staged.getLong(2),
      afterCoverage = staged.getLong(3),
      sampled = joinedN, // sample rows == join left side rows (left join)
      joined = joinedN,
      matched = matchedN,
      matchRatePct = if (joinedN > 0) 100.0 * matchedN / joinedN else 0.0,
      outputColumns = enriched.columns.length)

    outDir.foreach { d =>
      enriched.coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(d)
    }
    (enriched, stats)
  }

  /** Persistent catalog registration — the durable 18-column table the
    * reference declares for Athena (`/root/reference/Schema.json:1-92`,
    * `RealEstatePipeline.asl.json:120-130`): `CREATE TABLE ... USING
    * parquet` at an explicit location, queryable by name across the
    * session catalog (vs the temp-view-only `sql_view_query`). */
  def registerCatalog(spark: SparkSession, enriched: DataFrame,
                      path: String,
                      tableName: String = "real_estate_enriched"): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    enriched.write.mode("overwrite").format("parquet")
      .option("path", path).saveAsTable(tableName)
  }
}
