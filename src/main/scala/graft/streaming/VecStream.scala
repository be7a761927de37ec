package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Streaming FILTERED vector search — `sim_filtered_topk` served
  * against ARRIVING probe vectors, the online half of the
  * filtered-index contract (a production vector store builds the
  * (cell, label)-sliced index offline and answers queries as they
  * arrive). The index side is STATIC — the memoized corpus assignment
  * plus the per-(cell, label) cap — and each micro-batch of probes is
  * ranked against it through the SHARED
  * [[graft.ext.Similarity.filteredTopKFor]] seam, so the online and
  * offline serve paths are one code path.
  *
  * Stream ≡ batch at ANY arrival split — stronger than the minhash
  * screen's under-the-DF-cap regime contract — because per-probe top-3
  * ranking is batch-LOCAL by construction: a probe's entire candidate
  * set exists in the micro-batch it arrives in (the static side is the
  * complete index), so no ranking state ever crosses a batch boundary.
  * StreamingSpec pins equality on a two-batch split.
  *
  * foreachBatch + per-batch_id overwrite is the idempotent file-sink
  * recipe shared with [[DocStream.screenNewMinhashToParquet]]. At
  * 100 TB: per-micro-batch cost is O(|batch| × probed-cell slice),
  * independent of corpus size; the memoized index is built once per
  * session (in production: the persisted index, `sim_index_persist`).
  */
object VecStream {

  /** Schema of the probe stream — the embeddings table's own columns
    * (the deterministic replay harness reads split parquet files; in
    * production: Kafka etc.). */
  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** File-based probe stream over a directory of embeddings parquet. */
  def readVecs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(vecSchema).parquet(dir)

  /** CONTINUOUS incremental IVF assignment — the streaming face of
    * `sim_ivf_incremental_assign` (and the online half of the upsert
    * lifecycle): the frozen base-trained centroid table is built ONCE
    * and localCheckpointed, then every arriving vector micro-batch is
    * assigned to its nearest frozen cell through the SHARED
    * Similarity.assignToCentroids seam. Assignment is per-vector
    * against a frozen model, so stream ≡ batch at ANY arrival split —
    * no state, no watermark; per-micro-batch cost is
    * O(|batch| × cells) with the corpus never rescanned (the dedup
    * signature screen's contract on the vector side). */
  def incrementalAssignToParquet(spark: SparkSession, dir: String,
                                 stream: DataFrame, outDir: String,
                                 checkpointDir: String): Unit = {
    val cents = graft.ext.Similarity.frozenBaseCentroids(spark, dir)
      .localCheckpoint() // one build; micro-batches re-read the frame
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        if (!batch.isEmpty) {
          graft.ext.Similarity.assignToCentroids(batch, cents)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    // free the centroid checkpoint once the stream is done — the
    // screenNewMinhashToParquet lifecycle rule
    org.apache.spark.sql.GraftSql.checkpointRdd(cents)
      .foreach(_.unpersist(false))
  }

  /** Serve each arriving probe micro-batch against the static filtered
    * index; one `batch_id=N` parquet dir per micro-batch. */
  def filteredSearchToParquet(spark: SparkSession, dir: String,
                              stream: DataFrame, outDir: String,
                              checkpointDir: String): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        if (!batch.isEmpty) {
          graft.ext.Similarity.filteredTopKFor(spark, dir, batch)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
