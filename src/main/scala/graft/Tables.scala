package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver testdata layout
  * (`/root/testdata/sf{N}/<name>.parquet`, see TESTDATA.md).
  *
  * All engine queries read through here so the scan path is uniform:
  * vectorized parquet, column pruning + predicate pushdown left to
  * Catalyst (the reference reads CSV/JSON with no pushdown —
  * `/root/reference/real_estate_etl_job.py:34,49-54`; Parquet-first is
  * our scale-up, SURVEY §1.2).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default: read nanos as long, floor-divide to micros (exactly what
    * DuckDB's ns→µs truncation does — verified round 4: DuckDB reads
    * this column as µs TIMESTAMP with epoch_ns % 1000 == 0 on every row
    * even though the at-rest nanos have sub-µs components, so strict
    * cross-engine ts comparisons see identical µs values) and rebuild a
    * TimestampType col. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Scratch dir for source round-trip queries (only place we write
    * outside the driver-given outDir). Unique per table name. */
  def scratch(name: String): String = {
    val base = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    s"$base/graft-scratch/$name"
  }
}
