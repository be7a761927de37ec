package graft

/** The half of src_compaction the oracle can't see: the physical file
  * layout actually collapses, and the compacted table is row-identical
  * to the fragmented one. */
class CompactionSpec extends SparkSpec {

  test("compaction collapses 64 shards to 4 files with identical content") {
    ops.Sources.compaction(spark, sf0001).collect() // runs both writes
    def parquetFiles(p: String): Int =
      new java.io.File(p).listFiles((_, n) => n.endsWith(".parquet")).length
    val nFrag = parquetFiles(Tables.scratch("frag_orders"))
    val nCompact = parquetFiles(Tables.scratch("compact_orders"))
    assert(nFrag === 64, s"fragmented layout has $nFrag files")
    assert(nCompact === 4, s"compacted layout has $nCompact files")
    val a = spark.read.parquet(Tables.scratch("frag_orders"))
    val b = spark.read.parquet(Tables.scratch("compact_orders"))
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
           "compaction changed table content")
  }
}
