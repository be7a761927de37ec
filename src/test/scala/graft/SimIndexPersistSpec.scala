package graft

import org.apache.spark.sql.functions._

/** Persisted-ANN round trip (Similarity.ivfIndexPersistSearch): the
  * trained index written to parquet and RELOADED must serve results
  * identical to the in-session index, and the on-disk layout must be
  * the documented one (cell-partitioned postings + model-sized
  * centroid table). The oracle proves the same equality against DuckDB
  * (sim_index_persist registers sim_ivf_topk_trained's SQL verbatim);
  * this spec pins it builder-side plus the file layout the oracle
  * cannot see. */
class SimIndexPersistSpec extends SparkSpec {

  test("reloaded index serves results identical to the in-session index") {
    val persisted = ext.Similarity.queries("sim_index_persist")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    val inMem = ext.Similarity.queries("sim_ivf_topk_trained")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(persisted.nonEmpty)
    assert(persisted === inMem,
      "reloaded-index search drifted from the in-session trained index")
  }

  test("on-disk layout: cell-partitioned postings, model-sized centroids") {
    // the query above has already written the index; re-run to be
    // self-contained (overwrite mode makes this idempotent)
    ext.Similarity.queries("sim_index_persist")(spark, sf0001).collect()
    val postings = new java.io.File(Tables.scratch("ivf_index_postings"))
    val cellDirs = postings.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty,
      "postings are not partitioned by cell — the maintenance-scan " +
        "pruning story needs cell= directories")
    // every stored posting carries rn <= NProbe (the serve contract)
    val reloaded = spark.read.parquet(postings.toString)
    assert(reloaded.filter(col("rn") > 2).count() === 0L)
    // centroids are the model-sized long form: cells × 64 dims
    val cents = spark.read.parquet(Tables.scratch("ivf_index_centroids"))
    val cells = cents.select("cell").distinct().count()
    assert(cells >= 1L && cells <= 4096L)
    assert(cents.count() === cells * 64)
  }
}
