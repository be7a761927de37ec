package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Surfaces [[Similarity]]'s per-bucket candidate-cap truncations.
  *
  * The cap is a guardrail against quadratic blowup, not a sampler: when
  * it fires, an oversized bucket's high-id members get id-biased
  * neighbor sets. The `observe` metric in `Similarity.pairCandidates`
  * counts dropped candidate rows during the normal action; this listener
  * WARN-logs any non-zero truncation so the degradation is visible in
  * driver logs instead of silent — with the remediation the operator
  * documents (raise numPlanes / re-shard the bucket).
  */
object CapMetrics {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.CapMetrics")

  private val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        if (name.startsWith("graft_bucket_cap_")) {
          // defensive null guard even though the metric coalesces: a
          // listener must never throw on the listener bus
          val truncated = Option(row.getAs[Number]("rows_truncated"))
            .fold(0L)(_.longValue())
          if (truncated > 0)
            log.warn(
              s"$name: candidate cap dropped $truncated rows " +
                s"(largest bucket ${row.getAs[Number]("max_bucket_rows")}); " +
                "results are id-biased for oversized buckets — raise " +
                "numPlanes or re-shard")
        }
      }
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()
  }

  // weak keys: registration must not retain sessions; guards against
  // double-registering = double-logging.
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = synchronized {
    if (registered.add(spark)) spark.listenerManager.register(listener)
  }
}
