package graft.streaming

import graft.ops.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The curation pipeline applied to a CONTINUOUS document ingest — the
  * streaming face of `graft.ext.TextOps`/`Dedup`: exact dedup by content
  * plus the repetition quality gate, over `readStream`. A training-data
  * pipeline at 100 TB ingests continuously; the batch operators and this
  * stream share the same expressions (StreamingSpec proves the outputs
  * agree on deterministic replay).
  *
  * State note: `dropDuplicates("text")` keeps first-arrival per content
  * key with state that grows with distinct contents. Production would
  * key the state to an ingest-time watermark
  * (`dropDuplicatesWithinWatermark`, as EventStream.dedupStream does) —
  * the `documents` table has no event time, so the unbounded variant is
  * the honest demonstration here.
  */
object DocStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-based stream over a directory of documents parquet (the
    * deterministic replay harness; in production: Kafka etc.). */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Stream-STATIC anti-join: screen a continuous ingest against the
    * static existing-corpus fingerprint set — the streaming face of
    * `Dedup.incremental`'s exact tier, and the one Structured Streaming
    * join family (stream ⋈ static) the engine hadn't demonstrated yet.
    * Stateless on the stream side (no watermark needed); the static side
    * is one fingerprint per corpus doc, re-plannable per micro-batch and
    * broadcast when small. */
  def screenNew(stream: DataFrame, corpus: DataFrame): DataFrame = {
    val fp = corpus.select(md5(col("text")).as("fp")).distinct()
    stream.withColumn("fp", md5(col("text")))
      .join(fp, Seq("fp"), "left_anti")
      .drop("fp")
  }

  /** Streaming curation: one survivor per exact text (first arrival) +
    * repetition gate (same expression as TextOps.repetition). */
  def curate(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .dropDuplicates("text")
      .withColumn("rep_ratio",
        Num.rnd(lit(1.0) -
          size(array_distinct(toks)).cast("double") / size(toks), 6))
      .filter(col("rep_ratio") <= 0.5)
      .select("doc_id", "text", "lang", "source", "n_chars", "rep_ratio")
  }
}
