package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg (local iteration only; the driver passes two):
    // comma-separated query-name prefixes — dump only matching queries
    val nameFilter: String => Boolean =
      if (args.length > 2) { val ps = args(2).split(',').toSeq
                             n => ps.exists(n.startsWith) }
      else _ => true
    // the bucket-cap env is a scale-measurement-only override; the 1024
    // default is the oracle contract — a gate run with it set would
    // silently diverge every capped-family oracle (ADVICE r15)
    require(!graft.ext.Similarity.bucketCapOverridden,
      "SPARK_GRAFT_BUCKET_CAP is set — unset it for Verify gate runs " +
      "(the default cap is the oracle contract)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // the bounded top-k Aggregator (TopKPairsAggregator) must stay in
      // HASH-based object aggregation: the default fallback threshold
      // (128 keys) silently degrades the n-keys-per-partition ranked-IVF
      // partial agg to sort-based, re-paying the window sort it replaced
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
              "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ext.CapMetrics.register(spark)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(q => nameFilter(q._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
