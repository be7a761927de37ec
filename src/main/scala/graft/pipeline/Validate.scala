package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Structured source-probe result — mirrors the Zillow ingestion Lambda's
  * validation report (`/root/reference/Zillow_ingestion.py:60-83`). */
case class SourceProbe(
    exists: Boolean,
    columns: Seq[String],
    sampleRows: Seq[Map[String, String]],
    status: String)

/** Pre-flight validation utilities — SURVEY §5 items 1–2.
  *
  * The reference probes the raw CSV (existence, header, 3 sample rows,
  * `Zillow_ingestion.py:22-58`) and gates the pipeline on declared counts
  * (`RealEstatePipeline.asl.json:108-119`). Spark-native: a limited read
  * (scans only the first file split) + typed assertion helpers.
  */
object Validate {

  /** Probe a header CSV: existence, column list, first n rows — the
    * `Zillow_ingestion.py` pre-flight without leaving Spark. */
  def probeCsv(spark: SparkSession, path: String, n: Int = 3): SourceProbe = {
    try {
      val df = spark.read.option("header", "true").csv(path)
      val cols = df.columns.toSeq
      val rows = df.limit(n).collect().map { r =>
        cols.map(c => c -> Option(r.getAs[String](c)).getOrElse("")).toMap
      }.toSeq
      SourceProbe(exists = true, cols, rows, "PASSED")
    } catch {
      case e: Exception =>
        SourceProbe(exists = false, Nil, Nil, s"FAILED: ${e.getMessage}")
    }
  }

  /** Count-assertion gate — the Choice-state contract
    * (`RealEstatePipeline.asl.json:108-119`): declared expectations
    * checked post-run, any miss fails the pipeline. */
  def countGate(checks: (String, Long, Long)*): Either[Seq[String], Unit] = {
    val misses = checks.collect {
      case (name, expected, actual) if expected != actual =>
        s"$name: expected $expected, got $actual"
    }
    if (misses.isEmpty) Right(()) else Left(misses)
  }

  /** Threshold gate (the >= 95 % join-coverage warning,
    * `real_estate_etl_job.py:139-150`). */
  def coverageGate(pct: Double, threshold: Double = 95.0): Either[String, Unit] =
    if (pct >= threshold) Right(())
    else Left(f"coverage $pct%.2f%% below threshold $threshold%.1f%%")
}
