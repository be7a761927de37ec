package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._

/** The disk-persisted signature index (`dedup_index_persist`) must be a
  * pure change of storage, not of semantics: screening from the
  * re-read parquet index returns exactly what screening from the
  * session-cached index returns, and the on-disk layout is the
  * band-partitioned directory tree the scaladoc promises. */
class PersistIndexSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  test("screen from the disk index equals the in-session incremental screen") {
    val disk = Dedup.indexPersistScreen(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val mem = Dedup.incrementalMinhash(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(disk == mem, "disk-index screen diverged from the cached index")
    assert(disk.nonEmpty)
  }

  test("the band index lands partitioned by band on disk") {
    Dedup.indexPersistScreen(spark, sf001).count() // force the write
    val dirs = new java.io.File(Tables.scratch("mh_index_bands"))
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert((0 until 8).map(b => s"band=$b").toSet.subsetOf(dirs),
      s"expected 8 band partitions, found $dirs")
    // a single-band read prunes at the scan: the plan carries a
    // partition filter, not a post-scan filter
    val one = spark.read.parquet(Tables.scratch("mh_index_bands"))
      .filter(col("band") === 3)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(band"),
      s"band filter did not prune partitions:\n$plan")
  }
}
