package graft.ext

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for the metadata-cheap table counts that feed
  * runtime sizing knobs (LSH plane count, IVF cell count, the
  * incremental-dedup corpus split). Weak session keys: a strong
  * (SparkSession, dir) key would retain every session forever — the
  * unbounded-growth/session-leak class CkptMemo guards against. The
  * bounded inner map caps distinct (dir, table) entries per session. */
private[graft] object CountMemo {

  private val memo =
    new java.util.WeakHashMap[SparkSession,
                              java.util.LinkedHashMap[(String, String), java.lang.Long]]()

  def get(spark: SparkSession, dir: String, table: String)
         (compute: => Long): Long = {
    val perSession = memo.synchronized {
      var m = memo.get(spark)
      if (m == null) {
        m = new java.util.LinkedHashMap[(String, String), java.lang.Long](16, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[(String, String), java.lang.Long]): Boolean =
            size > 64
        }
        memo.put(spark, m)
      }
      m
    }
    val key = (dir, table)
    val hit = perSession.synchronized(perSession.get(key))
    if (hit != null) hit.longValue()
    else {
      val n = compute
      perSession.synchronized(perSession.put(key, java.lang.Long.valueOf(n)))
      n
    }
  }
}
