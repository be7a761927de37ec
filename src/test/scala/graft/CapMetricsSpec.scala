package graft

import graft.ext.Similarity
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.{functions => F}

/** The ANN bucket cap must be OBSERVABLE when it fires (round-5 verdict
  * task 6): a synthetic bucket 76 rows over the 1024 cap must surface
  * rows_truncated through the `observe` metric the CapMetrics listener
  * consumes, and the salted truncation must keep the surviving candidate
  * set deterministic. */
class CapMetricsSpec extends SparkSpec {

  private val N = 1100 // one bucket, 76 over the production cap

  private def skewed = spark.range(N).select(
      F.col("id").as("vec_id"),
      // strictly positive synthetic vectors (nrm > 0, no NaN cosines)
      F.expr("transform(sequence(0, 7), " +
             "i -> cast(pmod(id * 31 + i, 97) / 97.0 + 0.1 as float))")
        .as("embedding"))
    .withColumn("bucket", F.lit(0))
    .withColumn("nrm",
      F.sqrt(graft.functions.ArrayDot.col(F.col("embedding"), F.col("embedding"))))

  test("cap firing reports rows_truncated via the observe metric") {
    graft.ext.CapMetrics.register(spark) // exercise the WARN-log path too
    @volatile var truncated = -1L
    @volatile var maxBucket = -1L
    val probe = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        // names carry a per-instance suffix (DUPLICATED_METRICS_NAME
        // guard in pairCandidatesAB) — match by prefix like CapMetrics
        qe.observedMetrics.collect {
          case (n, row) if n.startsWith("graft_bucket_cap_bucket") =>
            truncated = row.getAs[Number]("rows_truncated").longValue()
            maxBucket = row.getAs[Number]("max_bucket_rows").longValue()
        }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(probe)
    try {
      val nPairs = Similarity.pairCandidates(skewed, "bucket").count()
      // a-side uncapped (N) × b-side capped (1024); identity pairs are
      // the callers' filter, not pairCandidates'
      assert(nPairs === N.toLong * 1024)
      // execution-listener delivery is async on the shared bus
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (truncated < 0 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(truncated === (N - 1024).toLong,
        s"expected ${N - 1024} truncated candidate rows, got $truncated")
      assert(maxBucket === N.toLong)
    } finally spark.listenerManager.unregister(probe)
  }

  test("salted truncation keeps a deterministic survivor set") {
    def survivors: Set[Long] =
      Similarity.pairCandidates(skewed, "bucket")
        .select("b_id").distinct().collect().map(_.getLong(0)).toSet
    val s1 = survivors
    assert(s1.size === 1024)
    // independent reimplementation of the salted order: keep the 1024
    // ids with the smallest (Knuth-scramble, id) key — pins the formula
    val expected = (0L until N.toLong)
      .sortBy(id => (((id % 2147483648L) * 2654435761L) % 2147483648L, id))
      .take(1024).toSet
    assert(s1 === expected, "survivors are not the salted-order prefix")
    assert(survivors === s1, "survivor set changed between runs")
  }
}
