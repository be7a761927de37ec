package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw per-ZIP payload as fetched from the API (array-of-arrays JSON). */
case class RawCensusPayload(zip_code: String, payload: String)

/** Pluggable REST ingestion — SURVEY §2.1 S6, modeling
  * `/root/reference/CensusDataFetch.py`:
  *
  *  - `fetchRaw` is the Lambda's sequential per-ZIP GET loop with the
  *    0.1 s throttle (`CensusDataFetch.py:148`) — the HTTP transport is
  *    injected (`String => String`) so tests/offline runs supply canned
  *    payloads and production supplies a real client; no network code
  *    lives in the engine;
  *  - `decode` is the positional array decode + field derivation
  *    (`CensusDataFetch.py:43-75`) as an IN-PLAN DataFrame transform
  *    (F10: `from_json` + `element_at`), with the reference's edge
  *    semantics: sentinel <= -999999 → null (P10), `or 0`
  *    zero-coalescing (F7), zero-denominator → 0 (F5), 1-dp rounds (F4).
  *
  * At scale the fetch stage is a bounded dimension-side ingest (300
  * ZIPs); the decode stage is distributed and codegen'd.
  */
object CensusRest {

  /** ACS5 variable order in the response row, per the reference's GET
    * (`CensusDataFetch.py:29-34`): NAME, median_income, population,
    * bachelors, masters, professional, doctorate, total_25plus,
    * unemployed, labor_force, median_age [, zip].  1-based positions for
    * `element_at`. */
  private val F = Map(
    "name" -> 1, "median_income" -> 2, "population" -> 3,
    "bachelors" -> 4, "masters" -> 5, "professional" -> 6,
    "doctorate" -> 7, "total_25plus" -> 8, "unemployed" -> 9,
    "labor_force" -> 10, "median_age" -> 11)

  /** Default production transport: pure-JDK `java.net.http.HttpClient`
    * GET with a 10 s timeout (`CensusDataFetch.py:37` —
    * `requests.get(..., timeout=10)`); non-200 → exception, collected
    * per-ZIP by [[fetchRaw]]. The injected-function seam stays the test /
    * offline path; this completes S6 for real deployments. */
  def httpTransport(urlFor: String => String,
                    timeout: java.time.Duration = java.time.Duration.ofSeconds(10))
      : String => String = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(timeout)
      // requests.get follows redirects transparently; the JDK default is
      // NEVER — NORMAL matches the reference (http→https upgrades etc.)
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    zip => {
      val req = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(urlFor(zip)))
        .timeout(timeout).GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        throw new RuntimeException(s"HTTP ${resp.statusCode()} for zip $zip")
      resp.body()
    }
  }

  /** Sequential fetch with throttle; per-ZIP failures are collected, not
    * fatal (`CensusDataFetch.py:76-78,129-150`). */
  def fetchRaw(zips: Seq[String], transport: String => String,
               throttleMs: Long = 100L,
               sleep: Long => Unit = Thread.sleep)
      : (Seq[RawCensusPayload], Seq[(String, String)]) = {
    val ok = Seq.newBuilder[RawCensusPayload]
    val failed = Seq.newBuilder[(String, String)]
    zips.foreach { z =>
      try ok += RawCensusPayload(z, transport(z))
      catch { case e: Exception => failed += (z -> e.getMessage) }
      sleep(throttleMs)
    }
    (ok.result(), failed.result())
  }

  /** Bounded-concurrency fetch (round-5 verdict optional #8): at most
    * `maxConcurrentRequests` GETs in flight on a fixed pool; per-request
    * failures are collected, not fatal, exactly as in [[fetchRaw]]; the
    * ok/failed sequences preserve INPUT zip order regardless of
    * completion order, so downstream frames stay deterministic.  The
    * transport must be thread-safe ([[httpTransport]]'s JDK HttpClient
    * is).  `maxConcurrentRequests = 1` degenerates to the reference's
    * sequential loop shape.
    *
    * `minStartIntervalMs` is the Lambda's 0.1 s pacing
    * (`CensusDataFetch.py:148`) generalized to a pool: a GLOBAL
    * request-START spacer shared by every worker — consecutive request
    * starts are at least the interval apart across ALL threads (an API
    * rate limit is per caller, never per thread; a per-thread throttle
    * at pool=4 would hit the API 4× the contracted rate). 0 = unpaced
    * (the previous behavior). Clock and sleep are injected so
    * CensusRestSpec pins the contract without wall-clock waits. */
  def fetchRawConcurrent(zips: Seq[String], transport: String => String,
                         maxConcurrentRequests: Int,
                         minStartIntervalMs: Long = 0L,
                         clock: () => Long = System.currentTimeMillis,
                         sleep: Long => Unit = Thread.sleep)
      : (Seq[RawCensusPayload], Seq[(String, String)]) = {
    require(maxConcurrentRequests >= 1,
      s"maxConcurrentRequests must be >= 1, got $maxConcurrentRequests")
    require(minStartIntervalMs >= 0L,
      s"minStartIntervalMs must be >= 0, got $minStartIntervalMs")
    // global start-spacing limiter: each request claims the next free
    // slot under the lock, then waits OUT of the lock — so a slow
    // transport never blocks other workers' slot claims
    val slotLock = new Object
    var nextStart = Long.MinValue
    def pace(): Unit = if (minStartIntervalMs > 0) {
      val wait = slotLock.synchronized {
        val now = clock()
        val at = math.max(now, nextStart)
        nextStart = at + minStartIntervalMs
        at - now
      }
      if (wait > 0) sleep(wait)
    }
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(maxConcurrentRequests)
    try {
      // submit everything up front; the fixed pool IS the in-flight
      // bound. Collect in submission (= input) order.
      val futures = zips.map { z =>
        z -> pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = { pace(); transport(z) }
        })
      }
      val ok = Seq.newBuilder[RawCensusPayload]
      val failed = Seq.newBuilder[(String, String)]
      futures.foreach { case (z, f) =>
        try ok += RawCensusPayload(z, f.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            failed += (z -> e.getCause.getMessage)
        }
      }
      (ok.result(), failed.result())
    } finally pool.shutdown()
  }

  /** Positional decode + derivations, all in-plan (no UDFs). The data
    * row is the SECOND array in the payload (first is the header row). */
  def decode(spark: SparkSession, raws: Seq[RawCensusPayload]): DataFrame = {
    import spark.implicits._
    def v(field: String) = element_at(col("row"), F(field))
    // safe_int: parse-failure → null, sentinel <= -999999 → null
    def safeInt(field: String) = {
      val i = expr(s"try_cast(element_at(row, ${F(field)}) AS BIGINT)")
      when(i > -999999L, i)
    }
    // `or 0` / `or 1`: Python truthiness — null AND 0 both replaced
    def or0(c: org.apache.spark.sql.Column) =
      when(c.isNull || c === 0L, lit(0L)).otherwise(c)
    def or1(c: org.apache.spark.sql.Column) =
      when(c.isNull || c === 0L, lit(1L)).otherwise(c)

    val college = or0(safeInt("bachelors")) + or0(safeInt("masters")) +
      or0(safeInt("professional")) + or0(safeInt("doctorate"))
    val total25 = or1(safeInt("total_25plus"))
    val unemployed = or0(safeInt("unemployed"))
    val laborForce = or1(safeInt("labor_force"))

    raws.toDF()
      .withColumn("row",
        element_at(from_json(col("payload"),
          ArrayType(ArrayType(StringType))), 2))
      .select(
        col("zip_code"),
        v("name").as("name"),
        safeInt("median_income").as("median_income"),
        safeInt("population").as("population"),
        // ratio-to-percent with zero-denominator guard → 0 (F5), 1-dp (F4)
        when(total25 > 0, round(college.cast("double") / total25 * 100, 1))
          .otherwise(lit(0.0)).as("college_educated_pct"),
        when(laborForce > 0,
             round(unemployed.cast("double") / laborForce * 100, 1))
          .otherwise(lit(0.0)).as("unemployment_rate"),
        safeInt("median_age").as("median_age"),
        lit("US Census Bureau ACS 2021").as("data_source"))
  }
}
