package graft

import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index round trip (Similarity.ivfpqIndexPersistSearch):
  * the four on-disk tables (coarse centroids, cell-partitioned coarse
  * postings, residual codebook, cell-partitioned PQ codes) must serve
  * results identical to the session-memoized index, and the layout must
  * be the documented one. The oracle proves the same equality against
  * DuckDB (sim_ivfpq_persist registers sim_ivfpq_topk's SQL verbatim). */
class IvfPqPersistSpec extends SparkSpec {

  test("reloaded composed index serves results identical to the memoized one") {
    val persisted = ext.Similarity.queries("sim_ivfpq_persist")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    val inMem = ext.Similarity.queries("sim_ivfpq_topk")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(persisted.nonEmpty)
    assert(persisted === inMem,
      "reloaded IVF-PQ search drifted from the session-memoized index")
  }

  test("on-disk layout: cell-partitioned codes, 8x16 codebook") {
    ext.Similarity.queries("sim_ivfpq_persist")(spark, sf0001).collect()
    val codes = new java.io.File(Tables.scratch("ivfpq_index_codes"))
    assert(codes.listFiles()
             .exists(f => f.isDirectory && f.getName.startsWith("cell=")),
      "PQ codes are not partitioned by cell")
    val cb = spark.read.parquet(Tables.scratch("ivfpq_index_codebook"))
    // 8 subspaces x up to 16 codes (a code can vanish if it captures no
    // member after the Lloyd step — same envelope as pqCodebook)
    val bySub = cb.groupBy("sub").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bySub.keySet === (0 until 8).toSet)
    bySub.values.foreach(n => assert(n >= 1L && n <= 16L))
    // every persisted code row references an existing codebook entry
    val codesDf = spark.read.parquet(Tables.scratch("ivfpq_index_codes"))
    val orphans = codesDf.join(cb.select("sub", "code"),
                               Seq("sub", "code"), "left_anti").count()
    assert(orphans === 0L, s"$orphans code rows reference no codebook entry")
  }
}
