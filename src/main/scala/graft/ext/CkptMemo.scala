package graft.ext

import org.apache.spark.sql.DataFrame

/** Bounded LRU memo for localCheckpoint'd result frames (shared by
  * [[Dedup]] and [[Similarity]]). An unbounded map keyed by
  * (session, dir) would strongly retain every checkpointed RDD — and its
  * SparkSession — forever in a long-lived multi-session application
  * (e.g. a thrift server with the GraftExtensions injector). Eviction
  * frees the eldest entry's checkpoint RDD; a later request for that key
  * simply rebuilds. Sized well above any single run's working set, so
  * it never evicts during Verify/Bench/tests — it is the unbounded-
  * growth guardrail, not a hot cache policy. */
private[ext] object CkptMemo {

  private val MaxEntries = 64
  private val m =
    new java.util.LinkedHashMap[Any, DataFrame](16, 0.75f, /*accessOrder=*/ true)

  def getOrElseUpdate(key: Any, build: => DataFrame): DataFrame = synchronized {
    val hit = m.get(key)
    if (hit != null) hit
    else {
      val df = build
      m.put(key, df)
      if (m.size > MaxEntries) {
        val it = m.entrySet().iterator()
        val eldest = it.next()
        // frees the checkpoint data — safe because evicted entries are
        // only reachable through this memo (callers re-request by key)
        org.apache.spark.sql.GraftSql.checkpointRdd(eldest.getValue)
          .foreach(_.unpersist(false))
        it.remove()
      }
      df
    }
  }
}
