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

  test("dynamic partition overwrite rewrites one partition, others survive") {
    import org.apache.spark.sql.functions._
    val got = ops.Sources.queries("src_dynamic_overwrite")(spark, sf0001)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    val base = Tables.orders(spark, sf0001)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
           graft.ops.Num.rnd(sum("o_totalprice"), 2).as("t"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === base.keySet, "a partition vanished in the overwrite")
    base.foreach { case (p, (n, t)) =>
      assert(got(p)._1 === n, s"$p row count changed")
      if (p == "1-URGENT") assert(got(p)._2 < t, "restatement did not land")
      else assert(got(p)._2 === t, s"$p content disturbed by dynamic overwrite")
    }
    // physical layout: every partition directory still present
    val dirs = new java.io.File(Tables.scratch("dynpart_orders"))
      .listFiles((f, n) => n.startsWith("o_orderpriority=")).length
    assert(dirs === base.size)
  }
}
