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

  /** Bloom-accelerated stream-static screen — [[screenNew]] with the
    * corpus fingerprint set pre-baked into a Bloom filter probed by the
    * codegen'd [[graft.functions.BloomMightContain]]: rows the bloom
    * rejects are DEFINITELY new (no false negatives) and bypass the
    * join entirely; only bloom-positive candidates reach the exact
    * md5 anti-join, where false positives die. Result is identical to
    * [[screenNew]] by construction. At 100 TB the difference is the
    * join input: a mostly-novel ingest sends ~|dups| + fp·|batch| rows
    * through the stream-static join instead of the whole stream, and
    * the ~115 KB filter rides the closure to every executor — the
    * streaming twin of `join_bloom_prune`. */
  def screenNewBloom(stream: DataFrame, corpus: DataFrame): DataFrame = {
    // capacity from the actual corpus size (one setup-time count — the
    // filter build scans the corpus anyway): a fixed 1<<17 silently
    // loses its pruning benefit past ~131k distinct fingerprints
    // (round-6 advice item 3). 2x headroom, floor 1<<17.
    val bloom = corpus.select(xxhash64(col("text")).as("h"))
      .stat.bloomFilter("h", math.max(1L << 17, 2 * corpus.count()), 0.03)
    val probed = stream.withColumn("maybe",
      graft.functions.BloomMightContain.col(xxhash64(col("text")), bloom))
    val fresh = probed.filter(!col("maybe")).drop("maybe")
    val fp = corpus.select(md5(col("text")).as("fp")).distinct()
    val confirmed = probed.filter(col("maybe"))
      .withColumn("fp", md5(col("text")))
      .join(fp, Seq("fp"), "left_anti")
      .drop("fp", "maybe")
    fresh.unionByName(confirmed)
  }

  /** MinHash-tier streaming screen — the continuous-ingest face of
    * `Dedup.incrementalMinhash`: every micro-batch of new documents is
    * screened against the PERSISTED corpus signature index (hashed
    * shingles + band buckets, built once by `Dedup.buildMinhashIndex`)
    * via `foreachBatch`. The per-batch logic — shingle the batch, band,
    * batch×corpus bucket equi-join, exact-Jaccard confirm — is a full
    * batch pipeline whose confirm joins batch-derived shingles back to
    * the candidate set, a self-referencing shape Structured Streaming's
    * incremental planner cannot express as one continuous query;
    * `foreachBatch` is the standard production recipe for exactly this.
    *
    * Each batch lands in its own `batch_id=N` overwrite path (idempotent
    * re-processing, as EventStream.runToParquet). Batching invariance:
    * a doc's signature depends on the doc and the static index PLUS one
    * batch-scoped input — the hot-shingle DF cap, which Dedup's shingle
    * stage computes over whatever frame it is given. While no batch
    * shingle's document frequency crosses the cap (MaxShingleDf = 100;
    * a micro-batch is a day's drop, not a corpus), the union over ANY
    * batching equals the one-shot batch screen — StreamingSpec proves
    * that regime under maxFilesPerTrigger=1. A batch whose docs share a
    * boilerplate shingle >cap times would sign that shingle differently
    * per batching (the cap is a robustness bound, not content-keyed
    * curation) — flag it, don't average over it: such a batch should
    * raise the cap or pre-split by source, same guidance as the LSH
    * bucket cap. At 100 TB: per-micro-batch cost is O(|batch| + matches)
    * regardless of corpus size; the index is the daily-appended
    * signature store. */
  def screenNewMinhashToParquet(stream: DataFrame,
                                corpusHs: DataFrame, corpusBands: DataFrame,
                                outDir: String, checkpointDir: String): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        if (!batch.isEmpty) {
          val screened =
            graft.ext.Dedup.incMinhashScreen(corpusHs, corpusBands, batch)
          screened.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
          // free the screen's localCheckpoint once the batch is on disk —
          // a long-running stream must not accumulate one cached RDD per
          // micro-batch (the memoized per-(session, dir) frames are a
          // different lifecycle: retained by design)
          org.apache.spark.sql.GraftSql.checkpointRdd(screened)
            .foreach(_.unpersist(false))
        }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** CONTINUOUS per-source MinHash signatures — the mergeable-sketch
    * property (`Dedup.sketchMerge`'s scaladoc) as live streaming state:
    * a signature component is a min over shingle permutations and min
    * is the entire fold, so the per-source signature is ONE streaming
    * aggregation — no foreachBatch, no custom state. State is
    * |sources| × 32 longs however much text has streamed past (the
    * whole point of keeping a mergeable sketch at 100 TB: the operator
    * that "summarizes everything seen so far" carries constant state
    * per key). Stream ≡ batch while no shingle's corpus DF crosses the
    * batch path's MaxShingleDf cap — the same regime contract as the
    * minhash screen above; StreamingSpec pins equality under
    * maxFilesPerTrigger=1 replay. */
  def sourceSignatures(docs: DataFrame): DataFrame =
    graft.ext.Dedup.sourceSigOf(
      graft.ext.Dedup.sourceShingleHashes(docs, 3))

  /** CONTINUOUS count-min sketch — the live face of
    * `text_cms_estimate`'s counter table and the SECOND mergeable
    * sketch kept as streaming state (next to [[sourceSignatures]]'
    * min-fold MinHash): CMS counters are plain sums, commutative and
    * associative, so the one streaming aggregation equals the batch
    * sketch after ANY micro-batch arrival order — exactly, not
    * approximately (StreamingSpec pins counter-for-counter equality
    * under maxFilesPerTrigger=1 replay). State is the FIXED 4×64
    * counter table however much text streams past — the
    * constant-state-per-key argument that makes sketches the right
    * streaming primitive at 100 TB/day; any point-frequency probe
    * then reads the live table with the same min-over-rows rule as
    * the batch estimator. Single-sourced via `TextOps.cmsSketchOf` so
    * the hash layout (PolyHashMod bases 131/137/139/149, mod 1000003,
    * 64 buckets) can never drift from the batch sketch or its
    * cross-engine oracle. */
  def cmsSketch(docs: DataFrame): DataFrame =
    graft.ext.TextOps.cmsSketchOf(docs)

  /** Streaming PII redaction — the continuous-ingest face of
    * `text_pii_redact`: a stateless per-row projection (inject →
    * count → replace, single-sourced via TextOps.piiRedactOf), so it
    * runs UNCHANGED under Structured Streaming with no watermark or
    * state store; StreamingSpec proves stream ≡ batch on replay. At
    * 100 TB/day this is the shape PII scrubbing actually deploys as —
    * on the ingest stream, before anything lands. */
  def redact(docs: DataFrame): DataFrame =
    graft.ext.TextOps.piiRedactOf(docs)

  /** Deterministic streaming per-source quota sample — the continuous-
    * ingest face of `TextOps.samplePerSource` (round-10 verdict stretch):
    * keep the k docs per source ranking FIRST under the content-
    * independent md5(doc_id) pseudo-random order, the reproducible
    * reservoir a production ingest maintains without `rand()`. The
    * min-k-by-order fold is commutative and associative, so the final
    * state after ANY micro-batch arrival order equals the batch
    * window's `rn <= k` selection exactly — StreamingSpec pins
    * stream ≡ batch under maxFilesPerTrigger=1 replay. State is
    * bounded: ≤ k (ord, doc_id) pairs per source, however long the
    * stream runs. Update mode re-emits a source's refreshed sample
    * whenever a batch touches it; `ver` counts the group's updates so
    * a consumer (and the spec) can select each source's latest
    * generation without comparing contents. */
  def samplePerSource(spark: SparkSession, docs: DataFrame,
                      k: Int = 5): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.streaming.GroupState
    val keyed = docs
      .select(col("source"), col("doc_id"),
              md5(col("doc_id").cast("string")).as("ord"))
      .as[(String, Long, String)]
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState[(Int, List[(String, Long)]),
                              (String, Long, Int, Int)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (source: String, rows: Iterator[(String, Long, String)],
         state: GroupState[(Int, List[(String, Long)])]) =>
          val (ver0, kept0) = state.getOption.getOrElse((0, Nil))
          // md5 hex is ASCII, so Java string order == Spark's binary
          // ORDER BY on both the batch window and this fold
          val kept = (kept0 ++ rows.map(r => (r._3, r._2)))
            .distinct.sorted.take(k)
          val ver = ver0 + 1
          state.update((ver, kept))
          kept.zipWithIndex.iterator.map { case ((_, id), i) =>
            (source, id, i + 1, ver)
          }
      }
      .toDF("source", "doc_id", "rn", "ver")
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
