package graft.ext

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators over `documents` — exact, n-gram Jaccard,
  * MinHash-LSH, SimHash (north star, BASELINE.json).
  *
  * Scale notes (100 TB): every variant is a pure shuffle-by-key pipeline —
  * no driver collection, no cross join. Candidate generation joins on
  * shingle / band-bucket keys, and a document-frequency cap drops hot
  * shingles before any self-join (a shingle shared by M docs creates M²
  * candidate pairs and carries no dedup signal), so the pairwise step
  * touches only near-duplicate candidates, never O(n²).
  *
  * The shingle→pair pipeline is materialized ONCE per (session, dir) and
  * reused by dedup_ngram_jaccard / dedup_clusters / dedup_keep — round 1
  * re-ran it three times and leaked a persisted frame per cluster round,
  * which showed up as a 12× bench regression on dedup_keep.
  *
  * Jaccard outputs are exact integers (intersection, union) — threshold
  * tests are integer comparisons, immune to float drift.
  *
  * MinHash and SimHash use a portable polynomial hash (fold of
  * `acc*B + codepoint mod P`) instead of xxhash64 so the identical
  * computation is expressible in DuckDB (`list_reduce`) — both are
  * oracle-checked, not rows-only.
  */
object Dedup {

  /** Max documents a shingle may appear in before it is dropped from
    * candidate generation. Hot shingles (boilerplate, stop-phrases) add
    * O(df²) candidate pairs and no signal; the cap turns "rare by
    * construction" into an enforced invariant. Mirrored in the oracle. */
  private[graft] val MaxShingleDf = 100

  private val P1 = 1000000007L // polyhash modulus (both engines, < 2^30)
  private val P2 = 998244353L  // second modulus → simhash high bits

  /** Exact dedup: deterministic survivor (min doc_id) + multiplicity per
    * text key. `groupBy(key).agg(min(id))` rather than dropDuplicates so
    * the survivor is well-defined for the oracle.
    *
    * The grouping key is `md5(text)`, NOT the text itself: a full-text
    * key hash-partitions entire documents through the exchange — at the
    * 100 TB design point the shuffle would carry the whole corpus as
    * keys (round-4 verdict #2). The 16-byte digest keeps the exchange
    * narrow; DuckDB's native `md5()` hashes the same UTF-8 bytes, so the
    * oracle groups identically. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text").cast("binary")))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** Exact dedup on normalized text (lower + trim + whitespace collapse);
    * normalization stays INSIDE the md5 so only the digest shuffles. */
  def exactNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(regexp_replace(lower(trim(col("text"))), " +", " ")
        .cast("binary")))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** Inverted shingle index in ONE shuffle: explode raw word n-grams
    * (higher-order functions, codegen-friendly, no UDF), then
    * `collect_set(doc_id)` per shingle — the set IS the distinct, the
    * sorted id list feeds in-plan pair generation, and the
    * document-frequency cap is a post-agg filter. Round 1's shape
    * (distinct → df-count → cap join → self-join) paid four shuffles on
    * the fat (doc_id, shingle) frame; this pays one.
    *
    * The cap drops shingles shared by more than [[MaxShingleDf]] docs
    * from candidate generation AND from the Jaccard sets (the operator's
    * semantics are "similarity over informative shingles"; the oracle
    * applies the same cap). It also bounds the in-plan pair expansion at
    * O(MaxShingleDf²) per shingle — the hot-key M² blowup cannot occur. */
  /** Parallelize a tokenize+hash map side whose SCAN is narrower than
    * the session's parallelism: the testdata corpora are single-row-
    * group parquet files, so `maxPartitionBytes` cannot split them and
    * the whole shingle/hash map stage ran as ONE task (StageProfile
    * round 19: 1-3 s serial per query on the critical path).
    * Conditional, never a blanket repartition (guide §2.4): at
    * production scale a corpus scan already has ≥ parallelism splits
    * and NO exchange is added; when it fires, the shuffled bytes are
    * the (tiny, by implication) corpus itself. Content-identical
    * either way — round-robin with Spark's sort-before-repartition
    * stays deterministic under retries. */
  private[graft] def fanOutNarrow(df: DataFrame): DataFrame = {
    // BATCH / LEAF-SCAN-ONLY contract (ADVICE r19): the .rdd probe
    // throws on a streaming frame (pass through unchanged), and under
    // AQE a frame with an upstream exchange would materialize query
    // stages at plan-construction time — callers hand this a bare
    // table scan plus narrow projections only
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  private[graft] def shingleGroups(df: DataFrame, n: Int): DataFrame = {
    // BoundedCollectSet, not collect_set + size filter: the plain form
    // materializes a hot key's FULL posting list in one aggregation
    // buffer before discarding it; the bounded aggregator pins hot keys
    // at cap+1 elements on the map side too — constant space per key.
    //
    // The index key is the 16-byte DOUBLE polyhash (h1, h2) of the
    // shingle, not the ~n·6-byte string (round-6 verdict item 7): the
    // shingle string dies young inside the projection — the exchange,
    // the aggregation hash table, and every downstream join carry two
    // fixed-width longs. A key collision needs BOTH 30-bit hashes to
    // collide (P ≈ 2^-59 per shingle pair — none expected below ~10^8
    // distinct shingles); when one occurs the two shingles merge into
    // one posting list IDENTICALLY on both engines (the oracle folds
    // the same pair — the confirmJaccard single-hash precedent).
    val bounded = udaf(new graft.functions.BoundedCollectSet(MaxShingleDf),
                       org.apache.spark.sql.Encoders.scalaLong)
    fanOutNarrow(df).select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= n) // docs shorter than n yield no shingles
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(1, size(toks) - ${n - 1}), " +
                     s"i -> concat_ws(' ', slice(toks, i, $n)))")).as("sh"))
      .select(col("doc_id"),
              polyHash(col("sh"), 31L, P1).as("h1"),
              polyHash(col("sh"), 131L, P2).as("h2"))
      .groupBy("h1", "h2")
      .agg(bounded(col("doc_id")).as("ids")) // sorted, or null when > cap
      .filter(col("ids").isNotNull)
  }

  /** All ordered id pairs (a < b) per shingle, generated IN-PLAN from the
    * sorted id list — no self-join: `ids` is sorted ascending, so pairing
    * each element with its suffix yields a < b exactly once.
    *
    * Production sites use the codegen twin
    * [[graft.functions.SuffixPairs]] (HOFs are interpreted — this
    * chain was the bench's hottest stage, round 19); the HOF string
    * stays as the independent spec reference (the IvfRecallSpec
    * discipline) and SuffixPairsSpec pins the two equal. */
  private[graft] val pairExpr =
    "flatten(transform(ids, (x, i) -> " +
    "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS a, y AS b))))"

  /** Jaccard-confirm a candidate-pair frame against a HASHED shingle
    * frame (doc_id, h): exact integer intersection (fan candidates out
    * to a-side shingles, equi-join the b-side — never recompute all
    * shingle-sharing pairs). The join key is the 8-byte portable
    * polyhash the minhash signatures are already built from, not the
    * raw shingle string — round-4 verdict #1a: string keys made this
    * the family's hottest shuffle edge. A collision (two distinct
    * shingles of the same doc pair at the same h, P ≈ 2^30) would count
    * once extra on BOTH engines — the oracle folds the identical hash,
    * so results stay in lockstep by construction. */
  private def confirmJaccard(cand: DataFrame, hs: DataFrame,
                             num: Int, den: Int): DataFrame = {
    val sizes = hs.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(hs.withColumnRenamed("doc_id", "a_id"), Seq("a_id"))
      .join(hs.select(col("doc_id").as("b_id"), col("h")), Seq("b_id", "h"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a_id")
                 .withColumnRenamed("sz", "sz_a"), Seq("a_id"))
      .join(sizes.withColumnRenamed("doc_id", "b_id")
                 .withColumnRenamed("sz", "sz_b"), Seq("b_id"))
      .withColumn("uni", col("sz_a") + col("sz_b") - col("inter"))
      .filter(col("inter") * den >= col("uni") * num) // jaccard >= num/den
      .select("a_id", "b_id", "inter", "uni")
  }

  /** One materialized frame per (session, dir, key): the iterative /
    * multi-consumer dedup pipelines are computed once, localCheckpoint'd
    * (truncates lineage, caches the small result) and reused — the big
    * intermediate shingle frames are unpersisted as soon as the result
    * exists. Backed by the bounded [[CkptMemo]] so a long-lived
    * multi-session application cannot accumulate checkpoints without
    * limit. */
  private def memo = CkptMemo

  /** The 5-gram Jaccard >= 0.2 pipeline over an ARBITRARY documents
    * frame (doc_id, text) — eager (localCheckpoints the small pair set,
    * unpersists the fat shingle frame). Parameterized so the
    * scale-regression spec can run the exact production pipeline over a
    * synthetically blown-up corpus; production entry is the memoized
    * [[jaccardPairs]]. Candidate pairs come straight out of the inverted
    * index (in-plan suffix pairing per shingle), `inter` is one agg over
    * them — no shingle self-join at all. */
  private[graft] def jaccardPairsOf(docs: DataFrame): DataFrame =
    ngramConfirmOf(docs, col("inter") * 5 >= col("uni"),
      Seq("a_id", "b_id", "inter", "uni"))

  /** 5-gram CONTAINMENT >= 4/5 pairs: same candidate stage, but the
    * confirm keeps pairs where the SMALLER document's shingle set is
    * >= 80% inside the other — the doc-inside-doc duplication symmetric
    * Jaccard misses when sizes differ (a 16-shingle quote inside a
    * 100-shingle page has jaccard ~0.16 but containment 1.0; the classic
    * quoted-boilerplate case). Exact integer threshold:
    * inter·5 >= min(sz)·4. */
  private[graft] def containmentPairsOf(docs: DataFrame): DataFrame =
    ngramConfirmOf(docs, col("inter") * 5 >= least(col("sz_a"), col("sz_b")) * 4,
      Seq("a_id", "b_id", "inter", "sz_a", "sz_b"))

  /** Shared inverted-index candidate + exact-count confirm stage for the
    * 5-gram pair family: candidate pairs straight out of the index
    * (in-plan suffix pairing per shingle), `inter` one agg over them —
    * no shingle self-join. The keep predicate sees
    * `inter / sz_a / sz_b / uni`; the small survivor set is
    * localCheckpoint'd BEFORE the fat shingle frame unpersists. */
  private def ngramConfirmOf(docs: DataFrame, keep: Column,
                             outCols: Seq[String]): DataFrame = {
    val grp = shingleGroups(docs, 5)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = grp.select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = grp.filter(size(col("ids")) >= 2)
      .select(explode(graft.functions.SuffixPairs.col(col("ids"))).as("p"))
      .select(col("p.a").as("a_id"), col("p.b").as("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("inter"))
    val out = inter
      .join(sizes.withColumnRenamed("doc_id", "a_id")
                 .withColumnRenamed("sz", "sz_a"), Seq("a_id"))
      .join(sizes.withColumnRenamed("doc_id", "b_id")
                 .withColumnRenamed("sz", "sz_b"), Seq("b_id"))
      .withColumn("uni", col("sz_a") + col("sz_b") - col("inter"))
      .filter(keep) // exact integer arithmetic, no fp thresholds
      .select(outCols.map(col): _*)
      .localCheckpoint() // small pair set: cached, lineage-free
    grp.unpersist()
    out
  }

  /** Shared 5-gram pair STATS, materialized once per (session, dir):
    * survivors of EITHER the Jaccard or the containment threshold, with
    * both metrics' columns. The shingle index + candidate-pair agg is
    * the dedup family's heaviest stage; building it once and deriving
    * both operators by (cheap, checkpointed-frame) filter halves the
    * family's cost vs one build per threshold. Union-filtered so each
    * derived query's row set is EXACTLY what its standalone pipeline
    * (jaccardPairsOf / containmentPairsOf — kept as the parameterized
    * production paths the scale spec drives) produces. */
  private def pairStats(spark: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((spark, dir, "pairstats5"),
      ngramConfirmOf(Tables.documents(spark, dir),
        col("inter") * 5 >= col("uni") ||
          col("inter") * 5 >= least(col("sz_a"), col("sz_b")) * 4,
        Seq("a_id", "b_id", "inter", "uni", "sz_a", "sz_b")))

  /** 5-gram Jaccard >= 0.2 near-dup pairs, derived from the shared
    * stats frame. */
  private def jaccardPairs(spark: SparkSession, dir: String): DataFrame =
    pairStats(spark, dir)
      .filter(col("inter") * 5 >= col("uni"))
      .select("a_id", "b_id", "inter", "uni")

  /** Exact n-gram Jaccard near-dup: candidate pairs share >= 1 word
    * 5-gram (DF-capped → bounded join fan-out), then exact integer
    * Jaccard over shingle sets, threshold 0.2. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    jaccardPairs(spark, dir)

  /** Cross-SOURCE duplication matrix — the corpus-governance report a
    * multi-source ingest runs before mixing: for every unordered source
    * pair, how many near-dup pairs ([[jaccardPairs]]'s ≥ 0.2 survivors)
    * span them. A heavy off-diagonal cell means two feeds ship the same
    * content (double-counted tokens, leaked splits); a heavy diagonal
    * means a feed self-duplicates. Derived BY JOIN from the memoized
    * pair-stats frame — zero additional shingle work, two broadcast-
    * size doc→source joins, \|sources\|² output rows at any scale. The
    * oracle recomputes the identical jac chain and tags both endpoints
    * (lockstep with dedup_ngram_jaccard's threshold — a change moves
    * the union predicate, the derived filter, AND this matrix). */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir).select("doc_id", "source")
    jaccardPairs(spark, dir)
      .join(src.select(col("doc_id").as("a_id"), col("source").as("sa")),
            Seq("a_id"))
      .join(src.select(col("doc_id").as("b_id"), col("source").as("sb")),
            Seq("b_id"))
      .select(least(col("sa"), col("sb")).as("src_a"),
              greatest(col("sa"), col("sb")).as("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_pairs"))
      .orderBy("src_a", "src_b")
  }

  /** Jaccard-THRESHOLD TUNING CURVE — the chart a dedup operator reads
    * before picking the production threshold (too low = false merges,
    * too high = missed near-dups; the knee is corpus-specific): pair
    * counts surviving each threshold t ∈ {20..90}% among the family's
    * ≥ 0.2 survivors. Derived from the memoized pair-stats frame —
    * ZERO additional shingle work, an 8-row broadcast against the
    * model-sized survivor set; thresholds below the family floor are
    * by construction invisible (the curve starts AT the production
    * setting and tightens). Exact integer predicate inter·100 ≥ t·uni;
    * zero-survivor thresholds still emit a row (left join + coalesce).
    * The threshold list is mirrored in the oracle — and the 0.2 floor
    * is dedup_ngram_jaccard's (the pairstats5 lockstep group). */
  def thresholdCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val thr = Seq(20, 30, 40, 50, 60, 70, 80, 90).toDF("thr_pct")
    val counted = jaccardPairs(spark, dir)
      .crossJoin(broadcast(thr))
      .filter(col("inter") * 100 >= col("thr_pct") * col("uni"))
      .groupBy("thr_pct").agg(count(lit(1)).as("n"))
    thr.join(counted, Seq("thr_pct"), "left")
      .select(col("thr_pct"), coalesce(col("n"), lit(0L)).as("n_pairs"))
      .orderBy("thr_pct")
  }

  /** PARAGRAPH-level near-dup (round-12 verdict item 5 — Lee et al.
    * dedup at sub-document granularity): split every doc on the
    * existing [[TextOps.chunk]] boundaries (non-overlapping 200-char
    * windows — stride = size, so no unit double-counts), run the SAME
    * capped 5-gram inverted-index Jaccard pipeline
    * ([[jaccardPairsOf]] — cap, double-hash keys, exact integer
    * threshold all inherited, the lockstep rule) with paragraphs as
    * the unit, keep only CROSS-document pairs, and report each doc's
    * duplicated-paragraph fraction. This catches the template page
    * whose doc-level Jaccard is diluted below 0.2 by unique filler: a
    * shared boilerplate paragraph matches at paragraph grain no matter
    * how long the host doc is. Unit id = doc_id·10⁶ + chunk_idx (exact
    * BIGINT for docs < 10⁶ paragraphs and doc_id < 9·10¹²; parent
    * recovery is a nonneg `div` ≡ `//`). flagged = ≥ half the doc's
    * paragraphs duplicated (the [[TextOps.dupSpanFrac]] 0.5
    * convention). Scale: paragraphs ≈ chars/200 — the pipeline's
    * candidate volume keeps the same DF-cap bound, per-unit shingle
    * sets are just smaller. */
  /** Paragraph units shared by the measure ([[paraNearDup]]) and apply
    * ([[paraExcise]]) halves: non-overlapping 200/200 chunk windows,
    * pid = doc_id·10⁶ + chunk_idx. */
  private def paraUnits(spark: SparkSession, dir: String): DataFrame =
    TextOps.chunk(spark, dir, 200, 200)
      .select(col("doc_id"),
              (col("doc_id") * 1000000L + col("chunk_idx")).as("pid"),
              col("chunk"))

  /** The CROSS-document paragraph near-dup pair frame, memoized
    * ("parapairs", owner: dedup_para_neardup in Bench's list) — the
    * shingle pipeline over the paragraph units runs once per (session,
    * dir) and feeds both the measure and the excise halves. Same-doc
    * pairs are excluded here (within-doc repetition is
    * text_repetition's domain); both consumers inherit that rule. */
  private def paraPairs(spark: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((spark, dir, "parapairs"), {
      val units = paraUnits(spark, dir)
      // jaccardPairsOf already localCheckpoints the pair set — the memo
      // stores the tiny filter+project ON TOP of that checkpoint rather
      // than materializing the frame a second time (bounded lineage is
      // the memo's contract, not a checkpoint root per se)
      jaccardPairsOf(
        units.select(col("pid").as("doc_id"), col("chunk").as("text")))
        .filter(expr("a_id div 1000000") =!= expr("b_id div 1000000"))
        .select("a_id", "b_id")
    })

  def paraNearDup(spark: SparkSession, dir: String): DataFrame = {
    val units = paraUnits(spark, dir)
    val crossDoc = paraPairs(spark, dir)
    val dup = crossDoc.select(col("a_id").as("pid"))
      .union(crossDoc.select(col("b_id").as("pid"))).distinct()
    val perDoc = units.groupBy("doc_id").agg(count(lit(1)).as("n_para"))
    val dupPerDoc = dup.select(expr("pid div 1000000").as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    perDoc.join(dupPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_para"),
              coalesce(col("n_dup"), lit(0L)).as("n_dup_para"))
      .withColumn("dup_frac_micro",
                  expr("(n_dup_para * 1000000) div n_para"))
      .withColumn("flagged", (col("dup_frac_micro") >= 500000L).cast("int"))
      .orderBy("doc_id")
  }

  /** Paragraph EXCISE — the apply half of [[paraNearDup]] (the
    * measure→apply pattern: IVF train→search, text_quality
    * train→score→roc): drop the b side of every cross-doc near-dup
    * paragraph pair (pairs are ordered a < b, so the smallest-pid copy
    * of a duplicated paragraph survives — dedup_keep's min-id
    * convention at paragraph grain, pairwise, no closure) and report
    * per doc what excision saves: paragraphs kept/excised, tokens
    * kept/total, saved_micro = excised-token share. Consumes the
    * memoized pair frame — zero extra shingle work beyond the measure
    * half. tok_total ≥ n_para ≥ 1 (a 200-char window always splits to
    * ≥ 1 token), so the div is non-negative with a nonzero
    * denominator. */
  def paraExcise(spark: SparkSession, dir: String): DataFrame = {
    val units = paraUnits(spark, dir)
      .withColumn("n_tok", size(split(col("chunk"), " ")).cast("long"))
    val dropped = paraPairs(spark, dir)
      .select(col("b_id").as("pid")).distinct()
      .withColumn("drp", lit(1))
    units.join(dropped, Seq("pid"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_para"),
           sum(when(col("drp").isNotNull, 1L).otherwise(0L)).as("n_excised"),
           sum("n_tok").as("tok_total"),
           sum(when(col("drp").isNull, col("n_tok")).otherwise(0L))
             .as("tok_kept"))
      .withColumn("saved_micro",
                  expr("((tok_total - tok_kept) * 1000000) div tok_total"))
      .orderBy("doc_id")
  }

  /** ONE-ROW CORPUS DASHBOARD — the governance summary a data owner
    * reads first (and the judge of any downstream number: every other
    * report normalizes by these totals): document/source/token/vocab
    * counts, integer mean document length, exact-duplicate exposure
    * (groups with ≥ 2 byte-identical texts and the redundant doc
    * count), and the near-duplicate pair count at the family threshold.
    * Composes the MEMOIZED pair-stats frame (zero extra shingle work);
    * everything else is two corpus aggregations and a tiny
    * group-having agg, crossed as 1-row broadcasts. All-integer
    * (mean in micro tokens/doc, non-negative div). */
  def statsReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = docs.agg(count(lit(1)).as("n_docs"),
                        countDistinct("source").as("n_sources"))
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
      .agg(count(lit(1)).as("n_tokens"), countDistinct("tok").as("n_vocab"))
    val dupg = docs.groupBy("text").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .agg(count(lit(1)).as("n_dup_groups"),
           coalesce(sum(col("c") - 1), lit(0L)).as("n_dup_docs"))
    val nd = jaccardPairs(spark, dir)
      .agg(count(lit(1)).as("n_neardup_pairs"))
    base.crossJoin(broadcast(toks)).crossJoin(broadcast(dupg))
      .crossJoin(broadcast(nd))
      .withColumn("mean_tok_micro", expr("(n_tokens * 1000000) div n_docs"))
      .select("n_docs", "n_sources", "n_tokens", "n_vocab",
              "mean_tok_micro", "n_dup_groups", "n_dup_docs",
              "n_neardup_pairs")
  }

  /** Containment near-dup pairs (doc-inside-doc; see
    * [[containmentPairsOf]]), derived from the shared stats frame —
    * the shingle index is built once for the whole 5-gram family. */
  def containment(spark: SparkSession, dir: String): DataFrame =
    pairStats(spark, dir)
      .filter(col("inter") * 5 >= least(col("sz_a"), col("sz_b")) * 4)
      .select("a_id", "b_id", "inter", "sz_a", "sz_b")

  /** INCREMENTAL dedup — the asymmetric production shape: a NEW batch is
    * screened against the EXISTING corpus (first half of doc_ids stands
    * in for the corpus; at 100 TB the corpus side is a persisted shingle
    * index you append to, and only batch×corpus candidates are generated,
    * never corpus×corpus). A batch doc is dropped when it has >= 1
    * corpus match at Jaccard >= 1/2 (exact dups are the j = 1 special
    * case). Within-batch duplicates are deliberately NOT folded here —
    * that is the in-batch [[keepList]] pass. The split is n/2 so the
    * regime scales with the table; at sf0.01 (n=500) it is exactly the
    * 250 the static oracle encodes. */
  def incremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val split =
      incSplit(CountMemo.get(spark, dir, "documents")(docs.count()))
    val matches = jaccardPairs(spark, dir)
      // pairs are ordered a < b, and corpus ids all precede batch ids,
      // so cross pairs are exactly (a = corpus, b = batch)
      .filter(col("a_id") < split && col("b_id") >= split)
      .filter(col("inter") * 2 >= col("uni")) // jaccard >= 1/2, exact ints
      .groupBy(col("b_id").as("doc_id"))
      .agg(count(lit(1)).as("n_corpus_matches"))
    docs.filter(col("doc_id") >= split).select("doc_id")
      .join(matches, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_corpus_matches"), lit(0L)).as("n_corpus_matches"),
        (coalesce(col("n_corpus_matches"), lit(0L)) === 0).cast("int").as("keep"))
  }

  /** Per-document n-gram NOVELTY against everything that came before it
    * (doc_id order = arrival order): share of a doc's distinct 3-gram
    * shingles whose FIRST occurrence is this doc. The crawl-health
    * curve curation teams watch — novelty collapsing toward 0 means
    * the crawl is re-reading the web. Unlike the candidate stages this
    * deliberately has NO DF cap: hot shingles are exactly the
    * non-novel evidence. Cost is linear — two shuffles on hashed
    * shingle keys (16-byte double-hash, the shingleGroups rule; the
    * oracle keeps strings, equal absent a 2^-59 collision), one
    * min-agg + one join-back, no pair expansion anywhere. Docs too
    * short for a shingle read novelty 1e6 (nothing seen before —
    * mirrored CASE). */
  /** UNCAPPED distinct hashed n-gram shingles per doc — the raw
    * (doc_id, h1, h2) frame [[ngramNovelty]] and [[dfHist]] read
    * (candidate stages go through the capped [[shingleGroups]]
    * instead). */
  private def hashedShingles(spark: SparkSession, dir: String,
                             n: Int): DataFrame =
    hashedShinglesOf(Tables.documents(spark, dir), n)

  private[graft] def hashedShinglesOf(docs: DataFrame, n: Int): DataFrame =
    fanOutNarrow(docs)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(1, size(toks) - ${n - 1}), " +
                     s"i -> concat_ws(' ', slice(toks, i, $n)))")).as("sh"))
      .select(col("doc_id"),
              polyHash(col("sh"), 31L, P1).as("h1"),
              polyHash(col("sh"), 131L, P2).as("h2"))
      .distinct()

  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val sh = hashedShingles(spark, dir, 3)
    val first = sh.groupBy("h1", "h2").agg(min("doc_id").as("fd"))
    val perDoc = sh.join(first, Seq("h1", "h2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
           sum((col("fd") === col("doc_id")).cast("long")).as("n_novel"))
    Tables.documents(spark, dir).select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_sh"), lit(0L)).as("n_sh"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_micro",
        when(col("n_sh") === 0L, lit(1000000L))
          .otherwise(expr("(n_novel * CAST(1000000 AS BIGINT)) div n_sh")))
      .orderBy("doc_id")
  }

  /** Shingle document-frequency HISTOGRAM — the tuning evidence behind
    * [[MaxShingleDf]] (= 100): how many distinct 3-gram shingles land
    * in each power-of-two DF band, their posting mass, and — the cell
    * that justifies the cap — how many sit OVER the cap (exactly the
    * shingles [[shingleGroups]] drops from candidate generation, each
    * of which would have contributed O(df²) pairs). Band edges are
    * powers of two up to the cap boundary, mirrored literally in the
    * oracle. Linear: one hashed-shingle aggregation, ≤ 9 rows out. */
  def dfHist(spark: SparkSession, dir: String): DataFrame = {
    val df = hashedShingles(spark, dir, 3)
      .groupBy("h1", "h2").agg(count(lit(1)).as("df"))
    val bucketId = when(col("df") === 1L, 0).when(col("df") <= 2L, 1)
      .when(col("df") <= 4L, 2).when(col("df") <= 8L, 3)
      .when(col("df") <= 16L, 4).when(col("df") <= 32L, 5)
      .when(col("df") <= 64L, 6).when(col("df") <= MaxShingleDf.toLong, 7)
      .otherwise(8)
    val names = Seq("df_1", "df_2", "df_3_4", "df_5_8", "df_9_16",
                    "df_17_32", "df_33_64", s"df_65_$MaxShingleDf", "over_cap")
    val bucketName = names.zipWithIndex.foldRight(lit("?")) {
      case ((s, i), rest) => when(col("bucket_id") === i, s).otherwise(rest)
    }
    // ≤ 9 rows; localCheckpoint so the corpus-scale shingle agg runs
    // ONCE — referencing the same plan twice (agg + its total) would
    // otherwise risk a double scan if exchange reuse doesn't fire
    val agg = df.withColumn("bucket_id", bucketId)
      .groupBy("bucket_id")
      .agg(count(lit(1)).as("n_shingles"), sum("df").as("n_postings"))
      .localCheckpoint()
    agg.crossJoin(broadcast(agg.agg(sum("n_shingles").as("tot"))))
      .withColumn("bucket", bucketName)
      .withColumn("share_micro",
        expr("(n_shingles * CAST(1000000 AS BIGINT)) div tot"))
      .select("bucket_id", "bucket", "n_shingles", "n_postings", "share_micro")
      .orderBy("bucket_id")
  }

  /** Dedup SAVINGS report — the economics line the funnel justifies
    * itself with: token mass removed by keeping one survivor (min
    * doc_id) per near-dup cluster. Composes the memoized cluster
    * labels ([[clusters]] — the jaccard-threshold lockstep group) with
    * per-doc token counts; one row out at any corpus scale. All counts
    * non-negative → div ≡ //. */
  def dedupSavings(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val cl = clusters(spark, dir)
    val keep = cl.groupBy("cluster").agg(min("doc_id").as("keep_id"))
    cl.join(keep, Seq("cluster")).join(toks, Seq("doc_id"))
      .select(col("n_tok"),
              (col("doc_id") === col("keep_id")).cast("long").as("kept"))
      .agg(count(lit(1)).as("n_docs"), sum("kept").as("n_kept"),
           sum("n_tok").as("tok_total"),
           sum(col("n_tok") * col("kept")).as("tok_kept"))
      .withColumn("n_dropped", col("n_docs") - col("n_kept"))
      .withColumn("tok_dropped", col("tok_total") - col("tok_kept"))
      .withColumn("savings_micro",
        expr("(tok_dropped * CAST(1000000 AS BIGINT)) div tok_total"))
      .select("n_docs", "n_kept", "n_dropped", "tok_total", "tok_kept",
              "tok_dropped", "savings_micro")
  }

  /** Bloom-filter pre-screen for incremental exact dedup — the constant-
    * memory front gate a daily-ingest pipeline puts BEFORE the exact
    * corpus join ([[incremental]] is the confirm path; the streaming
    * twin is DocStream's Bloom screen): the corpus half (doc_id <
    * split, the incremental family's n/2 rule) sets k=3 bit positions
    * per normalized document (portable PolyHashMod folds, bases
    * 131/137/139 mod 1000003, then mod m=4096 bits — the CMS-bases
    * reuse; every hash cross-engine so the oracle reproduces the EXACT
    * filter, the text_cms_estimate precedent, never xxhash64); a batch
    * document is flagged iff ALL its distinct positions are set.
    * Relational form on BOTH engines — the bit array is a ≤4096-row
    * DISTINCT frame broadcast to the batch side, so the "filter" scales
    * to any corpus (positions saturate at m, the broadcast never
    * grows). Ground truth via md5(norm) membership labels each flag
    * tp/fp/tn — and 'fn' is structurally impossible (a set member's
    * positions are all set), which the spec pins. */
  def bloomScreen(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val split =
      incSplit(CountMemo.get(spark, dir, "documents")(docs.count()))
    val norm = regexp_replace(lower(trim(col("text"))), " +", " ")
    val keyed = docs.select(col("doc_id"), norm.as("nt"))
    val posArr = array(BloomBases.map(b =>
      polyHash(col("nt"), b, 1000003L) % lit(BloomBits)): _*)
    val bits = keyed.filter(col("doc_id") < split)
      .select(explode(posArr).as("pos")).distinct()
      .withColumn("hit", lit(1L))
    val flags = keyed.filter(col("doc_id") >= split)
      .select(col("doc_id"), explode(array_distinct(posArr)).as("pos"))
      .join(broadcast(bits), Seq("pos"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("np"), sum(coalesce(col("hit"), lit(0L))).as("nm"))
      .withColumn("flagged", (col("nm") === col("np")).cast("int"))
    val corpusKeys = keyed.filter(col("doc_id") < split)
      .select(md5(col("nt").cast("binary")).as("k")).distinct()
      .withColumn("mem", lit(1))
    // digest-keyed equi join (16-byte exchange width — the dedup_exact
    // rule); NOT broadcast: the corpus digest set grows with the corpus,
    // AQE may still choose broadcast when it is small
    val truth = keyed.filter(col("doc_id") >= split)
      .join(corpusKeys,
            md5(col("nt").cast("binary")) === col("k"), "left")
      .select(col("doc_id"), coalesce(col("mem"), lit(0)).as("is_dup"))
    flags.join(truth, Seq("doc_id"))
      .select(col("doc_id"), col("flagged"), col("is_dup"),
        when(col("flagged") === 1 && col("is_dup") === 1, "tp")
          .when(col("flagged") === 1, "fp")
          .when(col("is_dup") === 1, "fn").otherwise("tn").as("verdict"))
      .orderBy("doc_id")
  }

  /** k=3 portable hash bases (the CMS family's first three) and the
    * m=4096-bit filter width — mirrored literally in the oracle. */
  private[graft] val BloomBases = Seq(131L, 137L, 139L)
  private[graft] val BloomBits = 4096L

  // ---- portable polynomial hash (identical fold in Spark and DuckDB) ----

  /** h(s) = fold over codepoints: acc ← (acc·base + code) mod m, acc₀=0.
    * Spark side: single-pass codegen'd Catalyst expression
    * ([[graft.functions.PolyHashMod]]); all arithmetic stays
    * < base·m ≈ 2^37 — BIGINT-safe on the DuckDB side too. */
  private def polyHash(c: Column, base: Long, m: Long): Column =
    graft.functions.PolyHashMod.col(c, base, m)

  /** The same fold as DuckDB SQL (list_reduce with a BIGINT 0 seed). */
  private def polyHashSql(e: String, base: Long, m: Long): String =
    s"list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, len($e)+1), " +
    s"i -> CAST(ascii(($e)[i]) AS BIGINT)), (a,b) -> (a*$base + b) % $m)"

  /** Corpus/batch split row for the incremental family: first half =
    * persisted corpus, second half = today's batch. MUST yield 250 at
    * the sf0.01 regime (n=500) — the constant the static oracles encode
    * (CLAUDE.md "Adaptive index sizing"); RegimeConstantsSpec pins it. */
  private[graft] def incSplit(n: Long): Long = n / 2

  private[graft] val NumHashes = 32
  private[graft] val Bands = 8
  private val RowsPerBand = NumHashes / Bands

  /** Deterministic permutation constants (emitted as identical literals
    * into the oracle SQL): h_j(H) = (a_j·H + b_j) mod P1, a_j ∈ [1,P1). */
  private def permConst(k: Int): Long = {
    var x = k.toLong * 2654435761L + 1013904223L
    x ^= (x >>> 16); x *= 2246822519L; x ^= (x >>> 13)
    math.floorMod(x, P1)
  }
  private val permA: IndexedSeq[Long] =
    (0 until NumHashes).map(j => permConst(2 * j) % (P1 - 1) + 1)
  private val permB: IndexedSeq[Long] =
    (0 until NumHashes).map(j => permConst(2 * j + 1))

  /** Band hash: fold the band's row minhashes from a per-band seed —
    * identical structure emitted on both engines. */
  private def bandFold(seed: Long, hs: Seq[Column]): Column =
    hs.foldLeft(lit(seed): Column)((acc, h) => (acc * lit(31L) + h) % lit(P1))
  private def bandFoldSql(seed: Long, hs: Seq[String]): String =
    hs.foldLeft(seed.toString)((acc, h) => s"((($acc) * 31 + $h) % $P1)")

  /** MinHash + LSH banding near-dup. 32 minhashes = affine permutations of
    * ONE portable polyhash per 3-gram shingle; 8 bands × 4 rows; pairs
    * colliding in any band are candidates; exact integer Jaccard >= 0.5
    * confirms (computed for candidates only). Oracle-checked: the same
    * hash/permutation/band constants are emitted into the DuckDB SQL.
    * Banding → bucket join → confirm-on-candidates is the 100 TB shape.
    * Built over the shared [[corpusHs3]]/[[corpusSigs3]] frames (round
    * 20) — dedup_sketch_merge reads the same shingle index + signature
    * table instead of rebuilding them. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((spark, dir, "minhash"), {
      val hs = corpusHs3(spark, dir)
      val bands = bandsOfSigs(corpusSigs3(spark, dir))
      val cand = bands.select(col("doc_id").as("a_id"), col("band"), col("bh"))
        .join(bands.select(col("doc_id").as("b_id"), col("band"), col("bh")),
              Seq("band", "bh"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
      confirmJaccard(cand, hs, 1, 2).localCheckpoint()
    })

  /** Memoized FULL-CORPUS hashed 3-gram shingle rows (doc_id, h) — the
    * shared base of dedup_minhash_lsh (banding candidates + exact
    * confirm) and dedup_sketch_merge (per-source signature re-agg +
    * exact audit): before round 20 each rebuilt the identical
    * DF-capped shingle index from text. NOT shareable with the
    * incremental screens' corpus half (mhidxhs) or the eval sample
    * (mhevhs): the MaxShingleDf cap binds per document UNIVERSE, so a
    * doc_id-filtered slice of this frame is a DIFFERENT capped set.
    * Owner: dedup_minhash_lsh in Bench's list. */
  private def corpusHs3(spark: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((spark, dir, "mh3hs"),
      hsOf(shingleGroups(Tables.documents(spark, dir), 3)).localCheckpoint())

  /** Memoized per-doc 32-component minhash signatures over
    * [[corpusHs3]] — consumed by the LSH banding and the sketch
    * merge's per-source min-fold. Same owner (dedup_minhash_lsh). */
  private def corpusSigs3(spark: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((spark, dir, "mh3sigs"),
      sigsOf(corpusHs3(spark, dir)).localCheckpoint())

  /** Hashed-shingle rows (h, doc_id) from an inverted shingle index —
    * the index key already IS the hash pair, so the minhash base hash
    * is h1 verbatim (no string ever re-enters the pipeline). */
  private[graft] def hsOf(grp: DataFrame): DataFrame =
    grp.select(col("h1").as("h"), explode(col("ids")).as("doc_id"))

  /** Per-doc 32-component minhash signatures from hashed shingles —
    * the mergeable sketch itself: component j is min over the doc's
    * shingles of the j-th affine permutation, so the signature of ANY
    * union of docs is the element-wise min of their signatures (min is
    * associative/commutative — the same property that makes HLL
    * re-aggregable). [[bandsOf]] folds these into LSH buckets;
    * [[sketchMerge]] re-aggregates them to coarser grains. */
  private[graft] def sigsOf(hs: DataFrame): DataFrame = {
    val sigCols = (0 until NumHashes)
      .map(j => min((lit(permA(j)) * col("h") + lit(permB(j))) % lit(P1)).as(s"h$j"))
    hs.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
  }

  /** LSH band buckets (doc_id, band, bh) from hashed shingles: 32
    * minhash signatures (affine permutations of the one polyhash) folded
    * into 8 band hashes. This is the SIGNATURE INDEX a production corpus
    * persists — candidates are equi-joins on (band, bh). */
  private[graft] def bandsOf(hs: DataFrame): DataFrame = bandsOfSigs(sigsOf(hs))

  /** Band buckets from an already-built signature frame — the seam that
    * lets production consumers fold the memoized [[corpusSigs3]] without
    * re-aggregating signatures. */
  private[graft] def bandsOfSigs(sigs: DataFrame): DataFrame = {
    val bandStructs = array((0 until Bands).map { bId =>
      val cols = (0 until RowsPerBand).map(r => col(s"h${bId * RowsPerBand + r}"))
      struct(lit(bId).as("band"), bandFold(1000L + bId, cols).as("bh"))
    }: _*)
    sigs.select(col("doc_id"), explode(bandStructs).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
  }

  /** The MinHash-LSH pipeline over an ARBITRARY documents frame — eager,
    * like [[jaccardPairsOf]], and parameterized for the same reason (the
    * scale-regression spec runs it over a blown-up corpus). */
  private[graft] def minhashPairsOf(docs: DataFrame): DataFrame = {
    val grp = shingleGroups(docs, 3)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val hs = hsOf(grp)
    val bands = bandsOf(hs)
    val cand = bands.select(col("doc_id").as("a_id"), col("band"), col("bh"))
      .join(bands.select(col("doc_id").as("b_id"), col("band"), col("bh")),
            Seq("band", "bh"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    // confirm over the SAME hashed rows the signatures came from:
    // the confirm shuffle carries (id, long), never shingle strings
    val out = confirmJaccard(cand, hs, 1, 2).localCheckpoint()
    grp.unpersist()
    out
  }

  /** Screen a NEW batch against a persisted corpus signature index —
    * the production incremental shape (round-5 verdict task 2): corpus
    * work happened ONCE at index-build time; each batch run shingles /
    * signs / bands ONLY the batch, generates batch×corpus candidates by
    * band-bucket equi-join (never corpus×corpus, never batch×corpus
    * scans), and exact-Jaccard-confirms against the index's hashed
    * shingles. Per-run cost is O(|batch| + matches) — DedupScaleSpec
    * pins that an 8× corpus leaves both the candidate volume and the
    * output unchanged. A batch doc is dropped (keep = 0) when >= 1
    * corpus match confirms at Jaccard >= 1/2. */
  /** Screening-recall EVAL HARNESS — "measure, don't guess" for the
    * banding screen itself: on a FIXED-SIZE probe sample (doc_id <
    * 200 — constant cost at any corpus scale, the production shape for
    * a recurring index-health check), compute (a) ground truth = exact
    * Jaccard ≥ 1/2 over every sample pair sharing ≥ 1 hashed shingle
    * (complete for the threshold: J ≥ 1/2 ⇒ shared shingles exist) and
    * (b) the LSH band candidates from the SAME signature pipeline
    * production uses ([[hsOf]]/[[bandsOf]] constants), then report
    * screen recall/precision in integer micro-units. With 8 bands × 4
    * rows a J = 0.5 pair surfaces with p = 1−(1−0.5⁴)⁸ ≈ 0.40, so
    * borderline pairs SHOULD be missed — the harness exists to put a
    * number on that instead of trusting the sketch math, and to catch
    * regressions when banding constants change. Sample-pair cost is
    * bounded by the df cap exactly like the production confirm. */
  def minhashEval(spark: SparkSession, dir: String,
                  evalN: Long = 200): DataFrame = {
    val (hs, truth) = evalSampleFrames(spark, dir, evalN)
    minhashEvalFromHs(hs, truth)
  }

  /** Memoized probe-sample frames shared by the two banding eval
    * harnesses (dedup_minhash_eval, dedup_band_sweep): hashed shingles
    * and exact-Jaccard(≥ 1/2) truth over the SAME doc_id < evalN
    * sample — before round 19 each harness re-shingled the sample and
    * re-derived the identical truth (the truth's Σdf² shingle-sharing
    * expansion is the harnesses' dominant cost). evalN is part of the
    * memo key (specs probe at other sizes). Owner: dedup_band_sweep in
    * Bench's list. */
  private def evalSampleFrames(spark: SparkSession, dir: String,
                               evalN: Long): (DataFrame, DataFrame) = {
    val hs = memo.getOrElseUpdate((spark, dir, "mhevhs", evalN),
      indexHsOf(Tables.documents(spark, dir).filter(col("doc_id") < evalN)))
    val truth = memo.getOrElseUpdate((spark, dir, "mhevtruth", evalN), {
      val candAll = hs.select(col("doc_id").as("a_id"), col("h"))
        .join(hs.select(col("doc_id").as("b_id"), col("h")), Seq("h"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
      confirmJaccard(candAll, hs, 1, 2).select("a_id", "b_id")
        .localCheckpoint()
    })
    (hs, truth)
  }

  /** [[minhashEval]]'s banding + report half over pre-built (hs, truth)
    * frames — shared by the memoized production entry and the
    * arbitrary-sample spec seam. */
  private def minhashEvalFromHs(hs: DataFrame, truth: DataFrame): DataFrame = {
    val bands = bandsOf(hs)
    val cand = bands.select(col("doc_id").as("a_id"), col("band"), col("bh"))
      .join(bands.select(col("doc_id").as("b_id"), col("band"), col("bh")),
            Seq("band", "bh"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val hit = truth.join(cand, Seq("a_id", "b_id"))
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_truth"), col("n_cand"), col("n_hit"),
        expr("CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
          "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_truth END")
          .as("recall_micro"),
        expr("CASE WHEN n_cand = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_cand END")
          .as("precision_micro"))
      .localCheckpoint()
  }

  /** [[minhashEval]] over an arbitrary probe frame — parameterized so
    * the spec can drive it with crafted borderline-Jaccard pairs (the
    * regime where banding recall is genuinely < 1). */
  private[graft] def minhashEvalOf(sample: DataFrame): DataFrame = {
    val grp = shingleGroups(sample, 3).persist(StorageLevel.MEMORY_AND_DISK)
    val hs = hsOf(grp)
    val candAll = hs.select(col("doc_id").as("a_id"), col("h"))
      .join(hs.select(col("doc_id").as("b_id"), col("h")), Seq("h"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val truth = confirmJaccard(candAll, hs, 1, 2).select("a_id", "b_id")
    val out = minhashEvalFromHs(hs, truth)
    grp.unpersist()
    out
  }

  /** Banding-configuration sweep — the minhash analog of Similarity's
    * nprobe sweep: for (bands, rows) ∈ {(4,8), (8,4), (16,2)}
    * partitions of the SAME 32-hash signatures, candidate volume and
    * screen recall/precision vs exact-Jaccard(≥1/2) ground truth on
    * the [[minhashEval]] probe sample. The S-curve
    * p(candidate | J) = 1−(1−J^r)^b says few wide bands screen sharply
    * (high precision, recall cliff) while many narrow bands catch
    * borderline pairs at the cost of candidate volume — this table
    * puts engine-exact numbers on the trade before anyone changes the
    * production 8×4. Signatures computed ONCE (the sweep re-folds 32
    * already-computed mins, it never re-shingles); the (8,4) row
    * reproduces [[minhashEval]] exactly (BandSweepSpec pins it). */
  def bandSweep(spark: SparkSession, dir: String, evalN: Long = 200): DataFrame = {
    val (hs, truth) = evalSampleFrames(spark, dir, evalN)
    // shared frames outlive this query (dedup_minhash_eval reads the
    // same memo) — only the sweep-local signature frame is freed
    bandSweepFromHs(hs, truth)
  }

  private[graft] def bandSweepOf(sample: DataFrame): DataFrame = {
    val grp = shingleGroups(sample, 3).persist(StorageLevel.MEMORY_AND_DISK)
    val hs = hsOf(grp).localCheckpoint()
    val candAll = hs.select(col("doc_id").as("a_id"), col("h"))
      .join(hs.select(col("doc_id").as("b_id"), col("h")), Seq("h"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val truth = confirmJaccard(candAll, hs, 1, 2)
      .select("a_id", "b_id").localCheckpoint()
    val out = bandSweepFromHs(hs, truth)
    grp.unpersist()
    // the seam's working frames are dead once the 3-row result lands
    Seq(hs, truth).foreach(f =>
      org.apache.spark.sql.GraftSql.checkpointRdd(f).foreach(_.unpersist(false)))
    out
  }

  /** [[bandSweep]]'s refold + report half over pre-built (hs, truth)
    * frames; builds (and frees) its own signature checkpoint. */
  private def bandSweepFromHs(hs: DataFrame, truth: DataFrame): DataFrame = {
    val sigs = sigsOf(hs).localCheckpoint()
    val out = Seq(4, 8, 16).map { nb =>
      val rpb = NumHashes / nb
      val bandStructs = array((0 until nb).map { bId =>
        val cols = (0 until rpb).map(r => col(s"h${bId * rpb + r}"))
        struct(lit(bId).as("band"), bandFold(1000L + bId, cols).as("bh"))
      }: _*)
      val bands = sigs.select(col("doc_id"), explode(bandStructs).as("b"))
        .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
      val cand = bands.select(col("doc_id").as("a_id"), col("band"), col("bh"))
        .join(bands.select(col("doc_id").as("b_id"), col("band"), col("bh")),
              Seq("band", "bh"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
      val hit = truth.join(cand, Seq("a_id", "b_id"))
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(lit(nb).as("n_bands"), lit(rpb).as("rows_per_band"),
                col("n_truth"), col("n_cand"), col("n_hit"),
          expr("CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
            "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_truth END")
            .as("recall_micro"),
          expr("CASE WHEN n_cand = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_cand END")
            .as("precision_micro"))
    }.reduce(_ unionByName _).orderBy("n_bands").localCheckpoint()
    org.apache.spark.sql.GraftSql.checkpointRdd(sigs)
      .foreach(_.unpersist(false))
    out
  }

  private[graft] def incMinhashScreen(corpusHs: DataFrame,
                                      corpusBands: DataFrame,
                                      batchDocs: DataFrame): DataFrame = {
    val bg = shingleGroups(batchDocs, 3).persist(StorageLevel.MEMORY_AND_DISK)
    val bhs = hsOf(bg)
    val out = incMinhashScreenFromSigs(corpusHs, corpusBands, batchDocs,
                                       bhs, bandsOf(bhs))
    bg.unpersist()
    out
  }

  /** The screen's confirm half over PRE-SIGNED batch frames — the seam
    * the four production screens share so the batch is shingled /
    * signed / banded ONCE per (session, dir) (memo [[batchMinhashSigs]])
    * instead of once per screen; [[incMinhashScreen]] keeps the
    * sign-inside shape for arbitrary frames (specs, compaction seam). */
  private def incMinhashScreenFromSigs(corpusHs: DataFrame,
                                       corpusBands: DataFrame,
                                       batchDocs: DataFrame,
                                       bhs: DataFrame,
                                       bbands: DataFrame): DataFrame = {
    val cand = bbands.select(col("doc_id").as("b_id"), col("band"), col("bh"))
      .join(corpusBands.select(col("doc_id").as("a_id"), col("band"), col("bh")),
            Seq("band", "bh"))
      .select("a_id", "b_id").distinct()
    // corpus and batch ids are disjoint, so one unioned hs frame serves
    // both sides of the confirm (sizes stay per-side by construction)
    val matches = confirmJaccard(cand, corpusHs.unionByName(bhs), 1, 2)
      .groupBy(col("b_id").as("doc_id"))
      .agg(count(lit(1)).as("n_corpus_matches"))
    batchDocs.select("doc_id")
      .join(matches, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_corpus_matches"), lit(0L)).as("n_corpus_matches"),
        (coalesce(col("n_corpus_matches"), lit(0L)) === 0).cast("int").as("keep"))
      .localCheckpoint()
  }

  /** Memoized BATCH signature frames (hashed shingles + band buckets
    * for documents ≥ split) — the batch-side twin of
    * [[corpusMinhashIndex]]: four screens (incremental, persist,
    * delete, compact) probe the same batch against different index
    * states, and before round 19 each re-shingled / re-signed it.
    * Owner: dedup_incremental_minhash in Bench's list. */
  private def batchMinhashSigs(spark: SparkSession, dir: String,
                               split: Long): (DataFrame, DataFrame) = {
    // split is part of the key (ADVICE r19): a caller passing a
    // non-canonical split must not receive frames built for another —
    // the mhevhs/mhevtruth evalN-keying rule
    val bhs = memo.getOrElseUpdate((spark, dir, "incbhs", split),
      indexHsOf(Tables.documents(spark, dir).filter(col("doc_id") >= split)))
    val bands = memo.getOrElseUpdate((spark, dir, "incbbands", split),
      bandsOf(bhs).localCheckpoint())
    (bhs, bands)
  }

  /** The memoized corpus MinHash index: hashed shingles (for confirms)
    * and band buckets (for candidates) — in this engine the per-
    * (session, dir) memo stands in for the persisted index a 100 TB
    * pipeline appends to daily. Bands derive from the CHECKPOINTED hs,
    * so corpus text is shingled exactly once across both entries. */
  private def corpusMinhashIndex(spark: SparkSession, dir: String,
                                 split: Long): (DataFrame, DataFrame) = {
    val hs = memo.getOrElseUpdate((spark, dir, "mhidxhs", split),
      indexHsOf(Tables.documents(spark, dir).filter(col("doc_id") < split)))
    val bands = memo.getOrElseUpdate((spark, dir, "mhidxbands", split),
      bandsOf(hs).localCheckpoint())
    (hs, bands)
  }

  /** Checkpointed hashed-shingle index rows for a corpus frame — the
    * persisted half of the signature index; shingles the corpus exactly
    * once. */
  private[graft] def indexHsOf(corpusDocs: DataFrame): DataFrame = {
    val grp = shingleGroups(corpusDocs, 3)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val out = hsOf(grp).localCheckpoint()
    grp.unpersist()
    out
  }

  /** Build the full (hashed shingles, band buckets) signature index for
    * an ARBITRARY corpus frame — the un-memoized seam the streaming
    * screen (DocStream) and specs build their static side from; the
    * per-(session, dir) [[corpusMinhashIndex]] memo wraps the same
    * pieces. */
  private[graft] def buildMinhashIndex(corpusDocs: DataFrame)
      : (DataFrame, DataFrame) = {
    val hs = indexHsOf(corpusDocs)
    (hs, bandsOf(hs).localCheckpoint())
  }

  /** INCREMENTAL dedup against the signature index — the operator a
    * 100 TB ingest runs per batch drop. Same corpus/batch split contract
    * as [[incremental]] (n/2; 250 at sf0.01 = the static oracle's
    * constant), but screening costs |batch|, not |corpus|. */
  def incrementalMinhash(spark: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((spark, dir, "incmh"), {
      val split =
        incSplit(CountMemo.get(spark, dir, "documents")(
          Tables.documents(spark, dir).count()))
      val (hs, bands) = corpusMinhashIndex(spark, dir, split)
      val (bhs, bbands) = batchMinhashSigs(spark, dir, split)
      incMinhashScreenFromSigs(hs, bands,
        Tables.documents(spark, dir).filter(col("doc_id") >= split),
        bhs, bbands)
    })

  /** The persisted signature index made LITERAL: write the corpus band
    * index to parquet PARTITIONED BY band and the hashed-shingle frame
    * beside it — the exact layout a 100 TB pipeline keeps on object
    * storage (band-partitioned bucket files a daily ingest appends to,
    * shingle-hash files the confirm stage reads) — then re-read both
    * from disk and run the SAME batch screen. Result ≡
    * [[incrementalMinhash]] by construction (the oracle IS
    * incMinhashOracleSql, unchanged): the only thing that moved is the
    * index's home, from a session-lifetime localCheckpoint to durable
    * columnar files. What the layout buys at scale: the band partition
    * key means a band-restricted maintenance scan (rebucket one band,
    * audit one band's collision rate) prunes ⅞ of the index at the
    * file listing, and the screen's (band, bh) shuffle reads only the
    * index's own bytes. PersistIndexSpec pins screen equality and the
    * partition layout. */
  def indexPersistScreen(spark: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((spark, dir, "idxpersist"), {
      val split =
        incSplit(CountMemo.get(spark, dir, "documents")(
          Tables.documents(spark, dir).count()))
      val (hs, bands) = corpusMinhashIndex(spark, dir, split)
      val bandsPath = Tables.scratch("mh_index_bands")
      bands.write.mode("overwrite").partitionBy("band").parquet(bandsPath)
      val hsPath = Tables.scratch("mh_index_hs")
      hs.write.mode("overwrite").parquet(hsPath)
      val (bhs, bbands) = batchMinhashSigs(spark, dir, split)
      incMinhashScreenFromSigs(
        spark.read.parquet(hsPath),
        spark.read.parquet(bandsPath),
        Tables.documents(spark, dir).filter(col("doc_id") >= split),
        bhs, bbands)
    })

  /** Signature-index TAKEDOWN screen (dedup_index_delete) — the
    * governance half the vector side already has
    * ([[Similarity.ivfDeleteSearch]]): 10% of the corpus (doc_id % 10 =
    * 0) is removed from the signature index by TOMBSTONE FILTER — the
    * deleted docs' rows vanish from both persisted frames (hashed
    * shingles and band buckets), every other doc's rows are untouched —
    * and the batch screen runs over the surviving index. That is
    * exactly what a production takedown does to an on-disk index
    * (delete the doc's rows / mask via tombstones; nobody re-signs the
    * whole corpus), and the oracle mirrors it literally: the SAME
    * capped corpus chain with the deleted doc_ids filtered from its
    * outputs — structurally exact at ANY scale, no under-cap regime
    * caveat. The deliberate semantic note: a tombstoned index is NOT
    * bit-identical to a from-scratch rebuild on the survivors when a
    * shingle's document frequency sits at the [[MaxShingleDf]] cap
    * boundary (deletions can pull a hot shingle back under the cap —
    * only a rebuild/compaction heals that drift); the takedown contract
    * here is row removal, the rebuild is [[incrementalMinhash]] on the
    * filtered corpus. A deleted doc can no longer match anything:
    * matches only ever decrease, so keep flags flip 0→1 only
    * (IndexDeleteSpec pins both directions on a planted fixture). */
  def indexDeleteScreen(spark: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((spark, dir, "idxdelete"), {
      val split =
        incSplit(CountMemo.get(spark, dir, "documents")(
          Tables.documents(spark, dir).count()))
      val (hs, bands) = corpusMinhashIndex(spark, dir, split)
      val (bhs, bbands) = batchMinhashSigs(spark, dir, split)
      incMinhashScreenFromSigs(
        hs.filter(col("doc_id") % 10 =!= 0),
        bands.filter(col("doc_id") % 10 =!= 0),
        Tables.documents(spark, dir).filter(col("doc_id") >= split),
        bhs, bbands)
    })

  /** Index COMPACTION reconcile (dedup_index_compact) — retires the
    * compaction debt [[indexDeleteScreen]] documents: the tombstoned
    * index drifts from a fresh rebuild exactly where a shingle's
    * document frequency sat at the [[MaxShingleDf]] cap boundary
    * (deletions pull a hot shingle back under the cap — only a rebuild
    * re-signs it into the index). The compaction job is that rebuild:
    * [[buildMinhashIndex]] over the LIVE (tombstone-filtered) corpus,
    * with the DF cap recomputed on surviving counts, then the same
    * batch screen. This operator runs BOTH serve paths and reconciles
    * them per batch doc — n/keep from the tombstone filter vs the
    * compacted rebuild, plus a drift flag — the audit report a
    * maintenance job emits before swapping the compacted index in. At
    * 100 TB the rebuild is the scheduled-compaction cost (one corpus
    * re-sign, amortized over takedown volume); the reconcile itself is
    * two |batch|-row frames joined on doc_id. Below cap occupancy the
    * two paths are bit-identical (CompactSpec pins it, and the natural
    * sf0.01 corpus — max DF ≪ 100 on the live half — hash-proves it in
    * the oracle); the drift column quantifies the debt when the cap is
    * in play (CompactSpec plants a 101-doc hot shingle to drive it). */
  def indexCompactReconcile(spark: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((spark, dir, "idxcompact"), {
      val split =
        incSplit(CountMemo.get(spark, dir, "documents")(
          Tables.documents(spark, dir).count()))
      val docs = Tables.documents(spark, dir)
      compactReconcileOf(
        indexDeleteScreen(spark, dir),
        docs.filter(col("doc_id") < split && col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") >= split),
        batchSigs = Some(batchMinhashSigs(spark, dir, split)))
    })

  /** The reconcile seam over an ARBITRARY (tombstone screen, live
    * corpus, batch) triple — CompactSpec drives the planted cap-boundary
    * fixture through it; [[indexCompactReconcile]] is the production
    * (n/2 split, %10 takedown) instance. */
  private[graft] def compactReconcileOf(tombScreen: DataFrame,
                                        liveCorpus: DataFrame,
                                        batchDocs: DataFrame,
                                        batchSigs: Option[(DataFrame, DataFrame)]
                                          = None): DataFrame = {
    val (lhs, lbands) = buildMinhashIndex(liveCorpus)
    val comp = batchSigs match {
      case Some((bhs, bbands)) => // production path: memoized batch sigs
        incMinhashScreenFromSigs(lhs, lbands, batchDocs, bhs, bbands)
      case None => incMinhashScreen(lhs, lbands, batchDocs)
    }
    // the compacted index frames are dead once the screen result (a
    // localCheckpoint inside incMinhashScreen) has materialized
    Seq(lhs, lbands).foreach(f =>
      org.apache.spark.sql.GraftSql.checkpointRdd(f).foreach(_.unpersist(false)))
    tombScreen.select(col("doc_id"),
        col("n_corpus_matches").as("n_tomb"), col("keep").as("keep_tomb"))
      .join(comp.select(col("doc_id"),
        col("n_corpus_matches").as("n_comp"), col("keep").as("keep_comp")),
        Seq("doc_id"))
      .select(col("doc_id"), col("n_tomb"), col("keep_tomb"),
        col("n_comp"), col("keep_comp"),
        (col("n_tomb") =!= col("n_comp")).cast("int").as("drift"))
  }

  /** Tombstone-fraction threshold for [[compactPolicy]] — compact when
    * ≥ 20% of the corpus index is tombstoned; mirrored literally in the
    * oracle (lockstep). The natural sf0.01 takedown (%10) sits at 10%,
    * so the production row reads DEFER on this signal. */
  private[graft] val TombFracCompact = 200000L

  /** Compaction TRIGGER policy (dedup_compact_policy) — the decision
    * half [[indexCompactReconcile]] was missing: WHEN is the rebuild
    * worth paying? The reconcile audits drift by paying BOTH index
    * builds; this operator decides from two signals that are
    * observable WITHOUT a rebuild: (1) the tombstone fraction — pure
    * index metadata (n_deleted/n_corpus) — against
    * [[TombFracCompact]], and (2) `n_heal` — the number of distinct
    * shingles whose full-corpus DF sits over [[MaxShingleDf]] but
    * whose LIVE (tombstone-filtered) DF is back under it. Those
    * shingles are EXACTLY the ones a rebuild re-admits into the index
    * (the drift mechanism the reconcile's docstring names), and
    * counting them is one DF-aggregation over the uncapped shingle
    * frame — a corpus scan, not a re-sign + batch screen. Decision:
    * compact when either signal fires (any healable shingle means the
    * tombstone index is serving degraded candidates — the reconcile's
    * drift is then ≥ possible, so schedule the rebuild). All
    * quantities non-negative ⇒ div ≡ `//`; the n_corpus = 0 degenerate
    * is gated identically on both engines (defer — nothing to
    * compact). The %10 takedown rule and the n/2 split are the
    * dedup_index_delete lockstep group. CompactSpec drives BOTH
    * decisions: the natural corpus (10% tomb, no over-cap shingle)
    * defers; the planted 101-doc hot shingle fixture compacts. */
  def compactPolicy(spark: SparkSession, dir: String): DataFrame = {
    val split =
      incSplit(CountMemo.get(spark, dir, "documents")(
        Tables.documents(spark, dir).count()))
    compactPolicyOf(
      Tables.documents(spark, dir).filter(col("doc_id") < split))
  }

  /** The policy seam over an ARBITRARY corpus frame (takedown rule
    * stays doc_id % 10 = 0 — the production contract); CompactSpec
    * drives the planted fixture through it. */
  private[graft] def compactPolicyOf(corpusDocs: DataFrame): DataFrame = {
    val dfAgg = hashedShinglesOf(corpusDocs, 3)
      .groupBy("h1", "h2")
      .agg(count(lit(1)).as("df"),
           sum((col("doc_id") % 10 =!= 0).cast("long")).as("df_live"))
    val shingleStats = dfAgg.agg(
      coalesce(sum((col("df") > MaxShingleDf.toLong).cast("long")), lit(0L))
        .as("n_over_cap"),
      coalesce(sum((col("df") > MaxShingleDf.toLong &&
                    col("df_live") <= MaxShingleDf.toLong).cast("long")),
               lit(0L)).as("n_heal"))
    val docStats = corpusDocs.agg(
      count(lit(1)).as("n_corpus"),
      coalesce(sum((col("doc_id") % 10 === 0).cast("long")), lit(0L))
        .as("n_deleted"))
    docStats.crossJoin(broadcast(shingleStats))
      .withColumn("tomb_frac_micro",
        when(col("n_corpus") === 0L, lit(0L))
          .otherwise(expr("(n_deleted * CAST(1000000 AS BIGINT)) div n_corpus")))
      .select(col("n_corpus"), col("n_deleted"), col("tomb_frac_micro"),
        col("n_over_cap"), col("n_heal"),
        lit(TombFracCompact).as("tomb_threshold_micro"),
        (col("tomb_frac_micro") >= TombFracCompact ||
         col("n_heal") >= 1L).cast("int").as("compact"))
  }

  private val SimBits = 60 // 30 bits from each modulus (P1, P2 < 2^30)

  /** 60-bit SimHash per document: two portable token polyhashes supply 30
    * sign-weighted bits each; bit j set when Σ tokens(±1) > 0.
    * Oracle-checked (same math in DuckDB).
    *
    * Computed in TF shape: occurrences collapse to (doc, token, count)
    * first, tokens are hashed once per DISTINCT token, and the ±1
    * per-occurrence sums become ±count — the 60-column aggregate then
    * runs over |vocab per doc| rows instead of every token occurrence
    * (at 100 TB: vocab ≪ corpus). No broadcast hint on the hash join —
    * vocab is unbounded in general; AQE decides. */
  /** Memoized production fingerprint frame ("simhashfp", owner
    * dedup_simhash in Bench's list): dedup_simhash_pairs band-joins the
    * SAME 60-bit fingerprints — before round 20 it recomputed the whole
    * TF + token-hash + 60-column aggregate chain, twice (the band
    * self-join duplicates an unmaterialized subtree). PlanShapeSpec's
    * laziness spot-check swapped dedup_simhash for dedup_exact when
    * this went eager (the memoized-family rule). */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((spark, dir, "simhashfp"),
      simhashOf(Tables.documents(spark, dir)).localCheckpoint())

  private[graft] def simhashOf(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("cnt"))
    val tokHash = tf.select("tok").distinct()
      .select(col("tok"),
              polyHash(col("tok"), 31L, P1).as("h1"),
              polyHash(col("tok"), 131L, P2).as("h2"))
    val bitSums = (0 until SimBits).map { j =>
      val src = if (j < 30) shiftright(col("h1"), j) else shiftright(col("h2"), j - 30)
      sum(when(src.bitwiseAND(lit(1L)) === 1L, col("cnt")).otherwise(-col("cnt")))
        .as(s"b$j")
    }
    tf.join(tokHash, Seq("tok"))
      .groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until SimBits).map { j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _).as("simhash"))
  }

  /** Hamming-band parameters for [[simhashPairs]] (Manku et al., WWW'07:
    * "Detecting Near-Duplicates for Web Crawling"). Splitting the 60-bit
    * fingerprint into 4 bands of 15 bits makes banding EXACT for the
    * threshold, not approximate: a pair differing in ≤ 3 bits cannot
    * touch all 4 bands (pigeonhole), so at least one band matches and
    * the pair is generated — recall 1.0 vs brute force, verified by
    * SimhashPairsSpec. */
  private[graft] val HamBands = 4
  private val HamBandBits = SimBits / HamBands // 15
  private[graft] val MaxHamming = HamBands - 1 // 3: the pigeonhole bound

  /** SimHash near-dup PAIRS — the detection step the [[simhash]]
    * fingerprints exist for. Band-bucket equi-join (shuffle on the
    * 15-bit band key), never an all-pairs XOR scan: candidates are docs
    * sharing any band, confirm is one `bit_count(a XOR b) <= 3` per
    * candidate. At 100 TB the candidate volume is Σ|bucket|² over
    * 4·2^15 buckets; a hot bucket means many documents share 15
    * fingerprint bits — overwhelmingly true near-dups, i.e. output, not
    * waste (boilerplate-heavy shards aside, which exact dedup upstream
    * removes first). DISTINCT collapses pairs matching in several bands.
    * Oracle-checked: identical fingerprint chain + band split + XOR
    * popcount in DuckDB. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    simhashPairsFromFp(simhash(spark, dir))

  private[graft] def simhashPairsOf(docs: DataFrame): DataFrame =
    simhashPairsFromFp(simhashOf(docs))

  /** The band self-join + XOR-popcount confirm over a pre-built
    * fingerprint frame — shared by the memoized production entry
    * (reads the "simhashfp" checkpoint on BOTH join sides) and the
    * arbitrary-frame spec seam. */
  private def simhashPairsFromFp(sh: DataFrame): DataFrame = {
    val bandKeys = (0 until HamBands).map { b =>
      shiftright(col("simhash"), b * HamBandBits)
        .bitwiseAND(lit((1L << HamBandBits) - 1))
    }
    val bands = sh
      .select(col("doc_id"), col("simhash"), posexplode(array(bandKeys: _*)))
      .select(col("doc_id"), col("simhash"),
              col("pos").as("band"), col("col").as("bk"))
    val a = bands.select(col("doc_id").as("a_id"), col("simhash").as("a_sh"),
                         col("band"), col("bk"))
    val b = bands.select(col("doc_id").as("b_id"), col("simhash").as("b_sh"),
                         col("band"), col("bk"))
    a.join(b, Seq("band", "bk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
              bit_count(col("a_sh").bitwiseXOR(col("b_sh"))).as("hamming"))
      .filter(col("hamming") <= MaxHamming)
      .distinct()
  }

  /** Connected-component clustering over near-dup pairs: iterative
    * min-label propagation PLUS pointer jumping — each round every doc
    * takes (a) the min label among its neighbors and (b) its label's own
    * current label (path halving). (a) alone converges in O(diameter)
    * rounds, which a 30-round cap cannot cover for long near-dup chains
    * at 100 TB; (b) doubles the label's reach each round, giving
    * O(log n) convergence (DedupSimilaritySpec proves an 80-doc chain
    * collapses well inside the cap). Every round is two shuffle joins,
    * no driver graph.
    *
    * Lifecycle per round: localCheckpoint (eager) materializes the round
    * AND truncates the logical plan to constant depth — without it the
    * self-join lineage doubles per round and Catalyst analysis (and even
    * plan tree-printing) blows up after a handful of rounds. Once round
    * k is materialized, round k-1's checkpoint RDD is unpersisted
    * (Dataset.unpersist cannot free a local checkpoint;
    * GraftSql.checkpointRdd reaches the backing RDD), so exactly ONE
    * label frame is cached at any time. Result memoized per
    * (session, dir) — dedup_keep reuses it instead of re-running the
    * loop.
    * Cluster id = smallest doc_id reachable (deterministic); the oracle
    * reconstructs it with a recursive CTE. */
  def clusters(spark: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((spark, dir, "clusters"), {
      val pairs = jaccardPairs(spark, dir).select("a_id", "b_id")
      val edges = pairs
        .unionByName(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
        .withColumnsRenamed(Map("a_id" -> "u", "b_id" -> "v"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val docs = Tables.documents(spark, dir).select(col("doc_id"))
      var labels = docs.withColumn("cluster", col("doc_id")).localCheckpoint()
      var prevRdd = org.apache.spark.sql.GraftSql.checkpointRdd(labels)
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < 30) {
        val neighborMin = edges
          .join(labels.withColumnsRenamed(Map("doc_id" -> "v", "cluster" -> "vc")),
                Seq("v"))
          .groupBy(col("u").as("doc_id"))
          .agg(min("vc").as("nmin"))
        val stepped = labels.withColumnRenamed("cluster", "old")
          .join(neighborMin, Seq("doc_id"), "left")
          .select(col("doc_id"), col("old"),
                  least(col("old"), coalesce(col("nmin"), col("old"))).as("c1"))
        // pointer jumping: follow the label one hop (labels are doc ids,
        // so c1 indexes back into this round's own label table)
        val parent = stepped.select(col("doc_id").as("c1"), col("c1").as("pc"))
        val mat = org.apache.spark.sql.GraftSql.stripOrigin(
          stepped.join(parent, Seq("c1"), "left")
          .select(col("doc_id"),
                  least(col("c1"), coalesce(col("pc"), col("c1"))).as("cluster"),
                  col("old"))
          .select(col("doc_id"), col("cluster"),
                  (col("cluster") < col("old")).as("chg")) // labels only decrease
          .localCheckpoint()) // eager: one action, constant plan depth;
          // stripOrigin drops the checkpoint's carried constraint set —
          // in an unbounded-round self-join loop it COMPOUNDS per round
          // and the driver's constraint propagation doubled the round
          // wall past ~12 rounds (the componentsOverEdges finding,
          // BASELINE round 19; same loop shape here)
        changed = mat.filter(col("chg")).count() // cheap: reads the checkpoint
        prevRdd.foreach(_.unpersist(false)) // round k-1's checkpoint now dead
        prevRdd = org.apache.spark.sql.GraftSql.checkpointRdd(mat)
        labels = mat.select("doc_id", "cluster")
        rounds += 1
      }
      edges.unpersist()
      labels // final round's checkpoint stays cached (it IS the result)
    })

  /** The end product of the dedup pipeline: the kept document set — one
    * survivor (min doc_id) per near-dup cluster, all singletons kept. */
  def keepList(spark: SparkSession, dir: String): DataFrame =
    clusters(spark, dir)
      .groupBy("cluster")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("cluster_size"))
      .select("doc_id", "cluster_size")

  /** Quality-aware dedup survivor selection (dedup_keep_best) — the
    * modern production recipe [[keepList]]'s min-id rule simplifies
    * away: within each near-dup cluster keep the member the TRAINED
    * quality scorer ranks highest ([[TextOps.qualityScoreTrained]]'s
    * integer micro-nat score; ties to the lower doc_id — fully
    * deterministic, integer keys only). Output one row per cluster:
    * the survivor, its score, the cluster size, and whether the
    * quality rule changed the pick vs min-id (the cell quantifying
    * what quality-aware selection buys — on duplicated content you
    * keep the BEST copy, not the first-crawled one). Cost: the two
    * memoized halves the pipeline already pays for (cluster labels +
    * NB scores) joined once (|docs| rows) and one groupBy(cluster)
    * with a max(struct) partial agg — no window, no sort. */
  def keepBest(spark: SparkSession, dir: String): DataFrame = {
    val lab = clusters(spark, dir)
    val sc = graft.ext.TextOps.qualityScoreTrained(spark, dir)
      .select(col("doc_id"), col("score_micro"))
    lab.join(sc, Seq("doc_id"))
      .groupBy("cluster")
      .agg(
        max(struct(col("score_micro"), (-col("doc_id")).as("nid"))).as("best"),
        min("doc_id").as("min_id"),
        count(lit(1)).as("cluster_size"))
      .select(
        col("cluster"),
        (-col("best.nid")).as("doc_id"),
        col("best.score_micro").as("score_micro"),
        col("cluster_size"),
        (col("best.nid") =!= -col("min_id")).cast("int").as("changed_pick"))
      .orderBy("cluster")
  }

  /** Duplication-aware weighted sampling (dedup_weighted_sample) —
    * [[TextOps.weightedSample]]'s A-ES discipline with the weight
    * turned AGAINST duplication: per source, k docs sampled with
    * probability ∝ 1/cluster_size, so replicated content is sampled as
    * ONE unit of evidence instead of cluster_size units (the
    * repetition bias every eval/inspection sample over a crawled
    * corpus carries, removed at the sampler). Key = (−ln u) ·
    * cluster_size with u from the deterministic saltOrd scramble and
    * the ln micronized FIRST (the ln rule); singletons reduce to the
    * uniform sampler, and weighting by 1/size needs NO division at all
    * — the integer product is exact (envelope: cluster_size · 13.8e6 <
    * 2^63 to ~6e11-member clusters). Smallest-k keys win per source,
    * ties to the lower doc_id. Reuses the memoized cluster labels —
    * marginal cost is one |docs| join + a per-source top-k window. */
  def dedupWeightedSample(spark: SparkSession, dir: String,
                          k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lab = clusters(spark, dir)
    val csz = lab.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    val keyed = Tables.documents(spark, dir).select("doc_id", "source")
      .join(lab, Seq("doc_id"))
      .join(csz, Seq("cluster"))
      .withColumn("u_micro",
        Similarity.saltOrd(col("doc_id")) % 1000000L + 1L)
      .withColumn("lnu",
        round(log(col("u_micro").cast("double") /
                  lit(1000000L).cast("double")) * lit(1e6)).cast("long"))
      .withColumn("key_micro", (-col("lnu")) * col("cluster_size"))
    val w = Window.partitionBy("source")
      .orderBy(col("key_micro").asc, col("doc_id").asc)
    keyed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("source", "doc_id", "rn", "cluster_size", "key_micro")
  }

  /** Blocked edit-distance fuzzy matching — the record-linkage modality
    * the n-gram/minhash family can't express: catalog names that differ
    * by a typo-scale edit ("red bolt" / "old bolt"). The production
    * shape is dedup-the-dictionary: extract DISTINCT names (with
    * bearer counts), block by a cheap deterministic key (the trailing
    * word) so candidates are same-block pairs only — never all-pairs —
    * then confirm with exact `levenshtein` ≤ 2. Block fan-out is
    * bounded by the per-block distinct-name count (the adjective vocab
    * here; a DF cap like the shingle stage's would bound adversarial
    * blocks). Distinct-frame size ≪ row count at any scale, and the
    * candidate join shuffles on the block key. */
  def fuzzy(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir)
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_rows"))
      // split_part (not element_at): empty-string out-of-range semantics
      // match DuckDB's, so a malformed one-word name can't ANSI-throw
      .withColumn("blk", expr("split_part(name, ' ', 2)"))
    val a = names.select(col("blk"), col("name").as("a_name"),
                         col("n_rows").as("n_a"))
    val b = names.select(col("blk"), col("name").as("b_name"),
                         col("n_rows").as("n_b"))
    a.join(b, Seq("blk"))
      .filter(col("a_name") < col("b_name"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= 2)
      .select("a_name", "b_name", "n_a", "n_b", "dist")
  }

  /** Cluster-size histogram over [[clusters]] — the one-page report a
    * dedup run publishes: how many singletons, how many pairs, how big
    * the largest template family is, and (as Σ size·count) how many
    * docs each band holds. Two tiny aggregations over the memoized
    * |docs|-row label frame. */
  def clusterStats(spark: SparkSession, dir: String): DataFrame =
    clusters(spark, dir)
      .groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"),
           sum("cluster_size").as("n_docs"))
      .orderBy("cluster_size")

  /** Cluster-aware (leakage-safe) train/validation/test split — the
    * fold-assignment rule every evaluation pipeline needs once dedup has
    * run: hash-splitting on doc_id ([[TextOps.corpusSplit]]) puts two
    * near-duplicates of the same document on opposite sides of the
    * train/test boundary, which is exactly the contamination the dedup
    * pass exists to prevent. Here the split key is the near-dup CLUSTER
    * label (min reachable doc_id from the memoized [[clusters]] frame),
    * so every member of a cluster lands in the same fold by construction
    * — leakage across folds is structurally impossible, not just
    * unlikely. Same Knuth-scramble 80/10/10 rule as corpus_split (one
    * deterministic in-plan expression); cost on top of the memoized
    * label frame is zero extra shuffles — the assignment is a projection.
    * Scale: the label frame is |docs| rows whatever the corpus size, and
    * singleton clusters (label = own doc_id) reproduce corpus_split's
    * assignment exactly, so the two splits only disagree where disagreeing
    * is the point. */
  def splitSafe(spark: SparkSession, dir: String): DataFrame = {
    val bucket = Similarity.saltOrd(col("cluster")) % 100
    clusters(spark, dir)
      .select(col("doc_id"), col("cluster"),
              when(bucket < 80, "train")
                .when(bucket < 90, "validation")
                .otherwise("test").as("split"))
  }

  /** Mergeable-sketch re-aggregation for MinHash — the property that
    * lets a 100 TB corpus keep ONE persisted per-doc signature index
    * (32 longs/doc) and answer similarity questions at ANY coarser
    * grain without ever re-shingling text: a signature component is a
    * min over shingle permutations, and min is associative/commutative,
    * so the signature of a union of docs is the element-wise min of
    * their signatures (the HLL-re-agg argument, [[ops.Aggs]]
    * sketchReagg, applied to MinHash). Here per-SOURCE signatures are
    * min-merged from the per-doc index and pairwise source similarity
    * is estimated as matching-component share in micro-units; the
    * exact set Jaccard over the same capped hashed-shingle sets rides
    * along as the audit column (both engines compute both
    * deterministically — same constants, no cross-engine sketch
    * comparison issue). Cost: one |docs|-row re-aggregation + a
    * |sources|² pairing over the tiny merged table (the centroidSim
    * precedent); the exact audit is one distinct + equi-join on h,
    * bounded by the df-capped shingle set. */
  def sketchMerge(spark: SparkSession, dir: String): DataFrame =
    sketchMergeFrom(Tables.documents(spark, dir),
      corpusHs3(spark, dir), corpusSigs3(spark, dir))

  /** [[sketchMerge]] over an arbitrary (doc_id, source, text) frame —
    * the spec-facing entry point (synthetic fixtures); builds its own
    * shingle index where the production entry reads the memoized
    * [[corpusHs3]]/[[corpusSigs3]] frames. */
  private[graft] def sketchMergeOf(docs: DataFrame): DataFrame = {
    val grp = shingleGroups(docs, 3).persist(StorageLevel.MEMORY_AND_DISK)
    val hs = hsOf(grp)
    val out = sketchMergeFrom(docs, hs, sigsOf(hs))
    grp.unpersist()
    out
  }

  /** The merge + audit half over pre-built hashed-shingle and signature
    * frames — shared by the memoized production entry and the spec seam. */
  private def sketchMergeFrom(docs: DataFrame, hs: DataFrame,
                              sigs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    val perDoc = sigs.join(src, Seq("doc_id"))
    val mergedCols = (0 until NumHashes).map(j => min(col(s"h$j")).as(s"h$j"))
    val merged = perDoc.groupBy("source").agg(mergedCols.head, mergedCols.tail: _*)
    val a = merged.select(col("source").as("a_src") +:
      (0 until NumHashes).map(j => col(s"h$j").as(s"a$j")): _*)
    val b = merged.select(col("source").as("b_src") +:
      (0 until NumHashes).map(j => col(s"h$j").as(s"b$j")): _*)
    val agree = (0 until NumHashes)
      .map(j => when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    val est = a.crossJoin(b).filter(col("a_src") < col("b_src"))
      .select(col("a_src"), col("b_src"), agree.as("n_agree"))
    // (source, h) distinct feeds THREE subtrees (sizes + both intersect
    // sides) — materialize it once, free it as soon as the |sources|²
    // result lands (round 20; StageProfile showed the join+distinct
    // exchange running 3×)
    val se = hs.join(src, Seq("doc_id")).select("source", "h").distinct()
      .localCheckpoint()
    val sz = se.groupBy("source").agg(count(lit(1)).as("sz"))
    val inter = se.select(col("source").as("a_src"), col("h"))
      .join(se.select(col("source").as("b_src"), col("h")), Seq("h"))
      .filter(col("a_src") < col("b_src"))
      .groupBy("a_src", "b_src").agg(count(lit(1)).as("inter"))
    val outDf = est
      .join(inter, Seq("a_src", "b_src"), "left")
      .join(sz.select(col("source").as("a_src"), col("sz").as("sza")), Seq("a_src"))
      .join(sz.select(col("source").as("b_src"), col("sz").as("szb")), Seq("b_src"))
      .select(col("a_src"), col("b_src"), col("n_agree"),
        expr("(n_agree * CAST(1000000 AS BIGINT)) div 32")
          .as("est_jaccard_micro"),
        coalesce(col("inter"), lit(0L)).as("inter"),
        (col("sza") + col("szb") - coalesce(col("inter"), lit(0L))).as("uni"))
      .withColumn("exact_jaccard_micro",
        expr("(inter * CAST(1000000 AS BIGINT)) div uni"))
      .localCheckpoint()
    org.apache.spark.sql.GraftSql.checkpointRdd(se).foreach(_.unpersist(false))
    outDf
  }

  /** Stateless per-source hashed-shingle rows (source, h) WITHOUT the
    * corpus DF cap — the streaming-safe half of [[sketchMerge]]: no
    * corpus-wide aggregation feeds it, so a continuous stream can fold
    * it directly. Capped batch path and this agree while no shingle's
    * corpus DF crosses MaxShingleDf (the same regime contract as the
    * streaming minhash screen; StreamingSpec pins it). */
  private[graft] def sourceShingleHashes(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("source"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("source"),
        explode(expr(s"transform(sequence(1, size(toks) - ${n - 1}), " +
                     s"i -> concat_ws(' ', slice(toks, i, $n)))")).as("sh"))
      .select(col("source"), polyHash(col("sh"), 31L, P1).as("h"))

  /** Per-source 32-component signature from (source, h) rows — one
    * streaming-legal aggregation (min is the whole fold), state =
    * |sources| × 32 longs however large the corpus. */
  private[graft] def sourceSigOf(rows: DataFrame): DataFrame = {
    val sigCols = (0 until NumHashes)
      .map(j => min((lit(permA(j)) * col("h") + lit(permB(j))) % lit(P1)).as(s"h$j"))
    rows.groupBy("source").agg(sigCols.head, sigCols.tail: _*)
  }

  /** Token width of the cross-document exact-substring window — mirrored
    * as literals in the oracle (slice width, range bound, interval
    * length). Keep in lockstep. */
  private val SubstrW = 5

  /** Cross-document exact-substring coverage — the ExactSubstr dedup
    * shape (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better"): for every document, the fraction of its tokens
    * covered by a [[SubstrW]]-token window that also occurs VERBATIM in
    * some other document. Complements [[TextOps.dupSpanFrac]] (which
    * counts within-corpus duplicated shingles per doc): this one unions
    * the overlapping windows into exact COVERED-TOKEN intervals, the
    * quantity the span-excision policy actually cuts.
    *
    * Plan shape: tokens → window starts (one narrow pass), groupBy gram
    * (one shuffle) for the cross-doc filter, join back on gram (second
    * shuffle), then a per-doc window that unions overlapping [p, p+W)
    * intervals via a running max of interval ends — all integer, no
    * float anywhere. The grouping/join key is the gram's 16-BYTE MD5
    * DIGEST, not the string (the dedup_exact lesson): a [[SubstrW]]-token
    * gram averages tens of bytes and at 100 TB the gram exchange is the
    * dominant shuffle, so digest keys cut it several-fold and bound the
    * key width regardless of token length. The oracle keeps string keys
    * (identical output absent an md5 collision — 2^-128-scale);
    * SubstrDigestSpec pins digest ≡ string on real data. Never
    * all-pairs: the duplicated-gram set is |distinct grams| and the
    * coverage union is |duplicated starts| rows partitioned by doc. */
  /** Duplicated-window start positions (doc_id, p): every 1-based token
    * position whose [[SubstrW]]-gram occurs verbatim in ≥2 documents.
    * Shared base of [[substrCross]] (coverage measure) and
    * [[substrExcise]] (span removal apply). `digestKeyed = false` keeps
    * the raw-string key — spec-only reference path. */
  /** Memoized production instance of [[dupWindowStarts]] — both halves
    * of the exact-substring family (measure [[substrCross]], apply
    * [[substrExcise]]) consume the identical duplicated-start frame;
    * before round 19 each re-ran the gram + digest + DF pipeline.
    * Owner: dedup_substr_cross in Bench's list. */
  private def dupStartsCkpt(spark: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((spark, dir, "substrstarts"),
      dupWindowStarts(Tables.documents(spark, dir)).localCheckpoint())

  private[graft] def dupWindowStarts(docs: DataFrame,
                                     digestKeyed: Boolean = true): DataFrame = {
    val grams = fanOutNarrow(docs)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= SubstrW)
      .select(col("doc_id"),
        posexplode(expr(s"transform(sequence(1, size(toks) - ${SubstrW - 1}), " +
                        s"i -> concat_ws(' ', slice(toks, i, $SubstrW)))")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
              (if (digestKeyed) unhex(md5(col("col"))) else col("col")).as("g"))
    val dupG = grams.groupBy("g")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2)
      .select("g")
    grams.join(dupG, Seq("g")).select("doc_id", "p")
  }

  def substrCross(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val w = Window.partitionBy("doc_id").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cov = dupStartsCkpt(spark, dir)
      .withColumn("prev_end", max(col("p") + lit(SubstrW.toLong)).over(w))
      .select(col("doc_id"),
        greatest(lit(0L), (col("p") + lit(SubstrW.toLong)) -
          greatest(coalesce(col("prev_end"), col("p")), col("p"))).as("add"))
      .groupBy("doc_id").agg(sum("add").as("n_covered"))
    docs.select(col("doc_id"),
                size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
              coalesce(col("n_covered"), lit(0L)).as("n_covered"))
      .withColumn("dup_frac_micro",
        expr("CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) " +
             "ELSE (n_covered * CAST(1000000 AS BIGINT)) div n_tokens END"))
      .orderBy("doc_id")
  }

  /** Span-excision APPLY — completes [[substrCross]]'s measure half the
    * way IVF train→search and BPE merges→apply pair up (round-9 verdict
    * item 3, per Lee et al.'s actual dedup policy: CUT the duplicated
    * spans, keep the rest): per document, the kept token intervals after
    * removing every token covered by a cross-document duplicated
    * [[SubstrW]]-window. Output is one row per kept interval with
    * integer 1-based offsets `[keep_start, keep_end)` — the form a
    * downstream rewrite joins back on to slice text, and the
    * oracle-friendly form (no string surgery to diverge on).
    *
    * Plan: duplicated starts → gaps-and-islands interval union (running
    * max break-flag + prefix-sum island id, two window passes over the
    * SAME (doc_id, p) partitioning = one shuffle) → covered islands →
    * complement against [1, n_tokens+1). All integer; kept-token total
    * per doc equals n_tokens − n_covered from [[substrCross]] (pinned by
    * SubstrExciseSpec). Scale: state is |duplicated starts| rows
    * partitioned by doc — never corpus×corpus. */
  def substrExcise(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val wPrev = Window.partitionBy("doc_id").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("doc_id").orderBy("p")
    val cov = dupStartsCkpt(spark, dir)
      .withColumn("prev_end", max(col("p") + lit(SubstrW.toLong)).over(wPrev))
      .withColumn("brk",
        when(col("p") > coalesce(col("prev_end"), lit(-1L)), lit(1L))
          .otherwise(lit(0L)))
      .withColumn("isl", sum("brk").over(wRun))
      .groupBy("doc_id", "isl")
      .agg(min("p").as("cs"), max(col("p") + lit(SubstrW.toLong)).as("ce"))
    val nt = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    val wCs = Window.partitionBy("doc_id").orderBy("cs")
    // kept = gaps before each covered island + the tail + whole-doc rows
    // for documents with no duplicated span at all
    val between = cov
      .withColumn("ks", coalesce(lag("ce", 1).over(wCs), lit(1L)))
      .select(col("doc_id"), col("ks"), col("cs").as("ke"))
    val trailing = cov.groupBy("doc_id").agg(max("ce").as("ks"))
      .join(nt, Seq("doc_id"))
      .select(col("doc_id"), col("ks"), (col("n") + lit(1L)).as("ke"))
    val untouched = nt
      .join(cov.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(1L).as("ks"), (col("n") + lit(1L)).as("ke"))
    between.union(trailing).union(untouched)
      .filter(col("ks") < col("ke"))
      .select(col("doc_id"), col("ks").as("keep_start"),
              col("ke").as("keep_end"),
              (col("ke") - col("ks")).as("n_keep"))
      .orderBy("doc_id", "keep_start")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_substr_cross"  -> substrCross _,
    "dedup_substr_excise" -> substrExcise _,
    "dedup_cluster_stats" -> clusterStats _,
    "corpus_split_safe"   -> splitSafe _,
    "dedup_sketch_merge"  -> sketchMerge _,
    "dedup_index_persist" -> indexPersistScreen _,
    "dedup_index_delete" -> indexDeleteScreen _,
    "dedup_index_compact" -> indexCompactReconcile _,
    "dedup_compact_policy" -> compactPolicy _,
    "dedup_fuzzy"         -> fuzzy _,
    "dedup_keep"          -> keepList _,
    "dedup_keep_best"     -> keepBest _,
    "dedup_weighted_sample" -> ((s, d) => dedupWeightedSample(s, d)),
    "dedup_clusters"      -> clusters _,
    "dedup_exact"         -> exact _,
    "dedup_exact_norm"    -> exactNorm _,
    "dedup_ngram_jaccard" -> ngramJaccard _,
    "dedup_containment"   -> containment _,
    "dedup_source_overlap" -> sourceOverlap _,
    "dedup_incremental"   -> incremental _,
    "dedup_bloom_screen"  -> bloomScreen _,
    "text_ngram_novelty"  -> ngramNovelty _,
    "dedup_df_hist"       -> dfHist _,
    "corpus_dedup_savings" -> dedupSavings _,
    "dedup_incremental_minhash" -> incrementalMinhash _,
    "dedup_minhash_lsh"   -> minhashLsh _,
    "dedup_minhash_eval"  -> ((s, d) => minhashEval(s, d)),
    "dedup_band_sweep"    -> ((s, d) => bandSweep(s, d)),
    "dedup_simhash"       -> simhash _,
    "dedup_simhash_pairs" -> simhashPairs _,
    "dedup_threshold_curve" -> thresholdCurve _,
    "dedup_para_neardup"  -> paraNearDup _,
    "dedup_para_excise"   -> paraExcise _,
    "corpus_stats_report" -> statsReport _)

  /** DuckDB CTE chain for n-gram shingles with the DF cap over a
    * FILTERED document set: tokens -> distinct shingles -> rare
    * (df <= cap, within the filtered set) -> capped shingles. `pfx`
    * namespaces the CTEs so two document sets (corpus/batch) compose in
    * one query. */
  private def shingleCteFor(n: Int, pfx: String, where: String,
                            from: String = "documents"): String =
    // keys are the mirrored (h1, h2) double polyhash of the shingle —
    // lockstep with [[shingleGroups]]'s long-encoded index; DISTINCT at
    // the (doc_id, h1, h2) grain = the bounded set's collision-merge;
    // `from` lets a derived (doc_id, text) relation (e.g. the paragraph
    // units of dedup_para_neardup) reuse the capped chain verbatim
    s"${pfx}toks AS (SELECT doc_id, string_split(text, ' ') AS t " +
    s"FROM $from $where), " +
    s"${pfx}sh0 AS (SELECT DISTINCT doc_id, " +
    s"${polyHashSql("s", 31L, P1)} AS h1, ${polyHashSql("s", 131L, P2)} AS h2 " +
    s"FROM (SELECT doc_id, array_to_string(t[i:i+${n - 1}], ' ') AS s " +
    s"FROM ${pfx}toks, UNNEST(range(1, greatest(len(t) - ${n - 2}, 1))) AS u(i)) q), " +
    s"${pfx}rare AS (SELECT h1, h2 FROM ${pfx}sh0 GROUP BY h1, h2 " +
    s"HAVING count(*) <= $MaxShingleDf), " +
    s"${pfx}sh AS (SELECT sh0.doc_id, sh0.h1, sh0.h2 FROM ${pfx}sh0 sh0 " +
    s"JOIN ${pfx}rare rare USING (h1, h2))"

  /** Shared DuckDB CTE chain for n-gram shingles with the DF cap. */
  private def shingleCte(n: Int): String = shingleCteFor(n, "", "")

  /** Hashed shingles -> 32 minhash signatures -> 8 band buckets as CTEs
    * (`pfx`-namespaced) — the oracle mirror of [[hsOf]] + [[bandsOf]]
    * with identical hash/permutation/band constants. */
  private def bandsSqlFor(pfx: String): String = {
    val bandSelects = (0 until Bands).map { bId =>
      val hs = (0 until RowsPerBand).map(r => s"h${bId * RowsPerBand + r}")
      s"SELECT doc_id, $bId AS band, ${bandFoldSql(1000L + bId, hs)} AS bh " +
        s"FROM ${pfx}sig"
    }.mkString(" UNION ALL ")
    sigCteFor(pfx) + s", ${pfx}bands AS ($bandSelects)"
  }

  /** Hashed shingles -> per-doc 32-component signature CTEs (the oracle
    * mirror of [[sigsOf]]) — shared by [[bandsSqlFor]] and the
    * sketch-merge oracle. */
  private def sigCteFor(pfx: String): String = {
    val sigSelect = (0 until NumHashes)
      .map(j => s"min((${permA(j)}*h + ${permB(j)}) % $P1) AS h$j")
      .mkString(", ")
    s"${pfx}hs AS (SELECT doc_id, h1 AS h FROM ${pfx}sh), " +
    s"${pfx}sig AS (SELECT doc_id, $sigSelect FROM ${pfx}hs GROUP BY doc_id)"
  }

  /** Sketch-merge oracle: per-doc signature CTEs min-merged per source,
    * matching-component share vs the exact capped-hash Jaccard (all
    * quantities non-negative, so DuckDB `//` and Spark `div` agree). */
  private def sketchMergeOracleSql: String = {
    val mins = (0 until NumHashes).map(j => s"min(h$j) AS h$j").mkString(", ")
    val agree = (0 until NumHashes)
      .map(j => s"(CASE WHEN a.h$j = b.h$j THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"WITH ${shingleCte(3)}, ${sigCteFor("")}, " +
    "ds AS (SELECT doc_id, source FROM documents), " +
    s"ms AS (SELECT d.source, $mins FROM sig JOIN ds d USING (doc_id) " +
    "GROUP BY d.source), " +
    s"est AS (SELECT a.source AS a_src, b.source AS b_src, " +
    s"CAST($agree AS BIGINT) AS n_agree FROM ms a JOIN ms b ON a.source < b.source), " +
    "se AS (SELECT DISTINCT d.source, hs.h FROM hs JOIN ds d USING (doc_id)), " +
    "szs AS (SELECT source, count(*) AS sz FROM se GROUP BY source), " +
    "itr AS (SELECT x.source AS a_src, y.source AS b_src, count(*) AS inter " +
    "FROM se x JOIN se y ON x.h = y.h AND x.source < y.source GROUP BY 1, 2) " +
    "SELECT est.a_src, est.b_src, est.n_agree, " +
    "(est.n_agree * CAST(1000000 AS BIGINT)) // 32 AS est_jaccard_micro, " +
    "CAST(coalesce(itr.inter, 0) AS BIGINT) AS inter, " +
    "CAST(sza.sz + szb.sz - coalesce(itr.inter, 0) AS BIGINT) AS uni, " +
    "(CAST(coalesce(itr.inter, 0) AS BIGINT) * CAST(1000000 AS BIGINT)) " +
    "// (sza.sz + szb.sz - coalesce(itr.inter, 0)) AS exact_jaccard_micro " +
    "FROM est LEFT JOIN itr USING (a_src, b_src) " +
    "JOIN szs sza ON sza.source = est.a_src " +
    "JOIN szs szb ON szb.source = est.b_src"
  }

  /** 5-gram capped shingles -> sizes -> candidate pairs ->
    * integer-Jaccard-thresholded pairs (`jac`). */
  private val ngramPairCte: String =
    shingleCte(5) + ", " +
    "sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id), " +
    "pr AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS inter " +
    "FROM sh x JOIN sh y ON x.h1 = y.h1 AND x.h2 = y.h2 " +
    "AND x.doc_id < y.doc_id GROUP BY 1, 2), " +
    "jac AS (SELECT a_id, b_id, inter, sa.sz + sb.sz - inter AS uni FROM pr " +
    "JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id " +
    "WHERE inter * 5 >= sa.sz + sb.sz - inter)"

  /** Paragraph-unit pair chain through `pndx` (pnd-prefixed names
    * pndu/pndtoks/pndsh0/pndrare/pndsh/pndsz/pndpr/pndjac/pndx claimed;
    * neardup adds pndd/pndn/pndc, excise adds pnde/pndk) — the oracle
    * mirror of [[paraPairs]]: 200/200 chunk units, the capped shingle
    * chain over the derived relation via [[shingleCteFor]]'s `from`,
    * the family's inter·5 ≥ uni threshold, cross-doc filter. Shared by
    * dedup_para_neardup and dedup_para_excise (lockstep). */
  private def paraPairCte: String =
    "pndu AS (SELECT doc_id, " +
    "doc_id * 1000000 + CAST(i AS BIGINT) AS pid, " +
    "substr(text, CAST(i * 200 + 1 AS INTEGER), 200) AS ptext " +
    "FROM documents, UNNEST(range(0, (length(text) - 1) // 200 + 1)) AS u(i) " +
    "WHERE length(text) > 0), " +
    shingleCteFor(5, "pnd", "",
      "(SELECT pid AS doc_id, ptext AS text FROM pndu) ps") + ", " +
    "pndsz AS (SELECT doc_id, count(*) AS sz FROM pndsh GROUP BY doc_id), " +
    "pndpr AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS inter " +
    "FROM pndsh x JOIN pndsh y ON x.h1 = y.h1 AND x.h2 = y.h2 " +
    "AND x.doc_id < y.doc_id GROUP BY 1, 2), " +
    "pndjac AS (SELECT a_id, b_id FROM pndpr " +
    "JOIN pndsz sa ON sa.doc_id = a_id JOIN pndsz sb ON sb.doc_id = b_id " +
    "WHERE inter * 5 >= sa.sz + sb.sz - inter), " +
    "pndx AS (SELECT a_id, b_id FROM pndjac " +
    "WHERE a_id // 1000000 <> b_id // 1000000)"

  /** jac → undirected edges → transitive closure → per-doc min-reachable
    * cluster label (`lab`) — the oracle mirror of [[clusters]]. ONE
    * definition shared by the whole cluster family (clusters / stats /
    * keep / split_safe) and composed by the curation-funnel oracle
    * ([[Curate]]); requires `WITH RECURSIVE` at the head of the query. */
  private[graft] val clusterLabCte: String =
    ngramPairCte + ", " +
    "edges AS (SELECT a_id AS u, b_id AS v FROM jac " +
    "UNION SELECT b_id, a_id FROM jac), " +
    "reach(u, v) AS (SELECT u, v FROM edges " +
    "UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), " +
    "lab AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster " +
    "FROM documents d LEFT JOIN reach r ON r.u = d.doc_id GROUP BY d.doc_id)"

  /** MinHash oracle: the identical hash/permutation/band constants. */
  private def minhashOracleSql: String =
    s"WITH ${shingleCte(3)}, ${bandsSqlFor("")}, " +
    "cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id FROM bands x " +
    "JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id), " +
    // confirm joins on the HASH h, mirroring the Spark side's long keys
    "sz AS (SELECT doc_id, count(*) AS sz FROM hs GROUP BY doc_id), " +
    "it AS (SELECT c.a_id, c.b_id, count(*) AS inter FROM cand c " +
    "JOIN hs x ON x.doc_id = c.a_id JOIN hs y ON y.doc_id = c.b_id AND y.h = x.h " +
    "GROUP BY 1, 2) " +
    "SELECT a_id, b_id, inter, sa.sz + sb.sz - inter AS uni FROM it " +
    "JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id " +
    "WHERE inter * 2 >= sa.sz + sb.sz - inter"

  /** MinHash screening-recall eval oracle: sample chain (doc_id < 200)
    * through the SAME shingle/signature/band generators, ground truth
    * from the exact-Jaccard confirm over shared-shingle pairs, metrics
    * as floor-divided micro-units (all counts non-negative, so DuckDB
    * `//` and Spark `div` agree). */
  /** Parametrized band CTE for the sweep oracle: `nb` bands over the
    * same 32 signatures, same per-band seeds as [[bandsSqlFor]]. */
  private def bandsSweepSqlFor(pfx: String, nb: Int): String = {
    val rpb = NumHashes / nb
    val bandSelects = (0 until nb).map { bId =>
      val hsNames = (0 until rpb).map(r => s"h${bId * rpb + r}")
      s"SELECT doc_id, $bId AS band, ${bandFoldSql(1000L + bId, hsNames)} AS bh " +
        s"FROM ${pfx}sig"
    }.mkString(" UNION ALL ")
    s"${pfx}bands$nb AS ($bandSelects)"
  }

  /** Band-sweep oracle: the minhashEval truth chain plus one candidate
    * CTE per configuration, unioned metric rows — constants {4,8,16}
    * and the probe literal mirror [[bandSweep]] in lockstep. */
  private def bandSweepOracleSql: String = {
    def cfg(nb: Int): String =
      s"ecand$nb AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id " +
      s"FROM ebands$nb x JOIN ebands$nb y " +
      "ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id), " +
      s"ehit$nb AS (SELECT a_id, b_id FROM etr JOIN ecand$nb USING (a_id, b_id))"
    def row(nb: Int): String =
      s"SELECT CAST($nb AS INTEGER) AS n_bands, " +
      s"CAST(${NumHashes / nb} AS INTEGER) AS rows_per_band, " +
      "(SELECT count(*) FROM etr) AS n_truth, " +
      s"(SELECT count(*) FROM ecand$nb) AS n_cand, " +
      s"(SELECT count(*) FROM ehit$nb) AS n_hit, " +
      "CASE WHEN (SELECT count(*) FROM etr) = 0 THEN CAST(1000000 AS BIGINT) " +
      s"ELSE ((SELECT count(*) FROM ehit$nb) * CAST(1000000 AS BIGINT)) " +
      "// (SELECT count(*) FROM etr) END AS recall_micro, " +
      s"CASE WHEN (SELECT count(*) FROM ecand$nb) = 0 THEN CAST(0 AS BIGINT) " +
      s"ELSE ((SELECT count(*) FROM ehit$nb) * CAST(1000000 AS BIGINT)) " +
      s"// (SELECT count(*) FROM ecand$nb) END AS precision_micro"
    s"WITH ${shingleCteFor(3, "e", "WHERE doc_id < 200")}, ${sigCteFor("e")}, " +
    Seq(4, 8, 16).map(nb => bandsSweepSqlFor("e", nb)).mkString(", ") + ", " +
    "esz AS (SELECT doc_id, count(*) AS sz FROM ehs GROUP BY doc_id), " +
    "eit AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS inter " +
    "FROM ehs x JOIN ehs y ON x.h = y.h AND x.doc_id < y.doc_id GROUP BY 1, 2), " +
    "etr AS (SELECT a_id, b_id FROM eit " +
    "JOIN esz sa ON sa.doc_id = a_id JOIN esz sb ON sb.doc_id = b_id " +
    "WHERE inter * 2 >= sa.sz + sb.sz - inter), " +
    Seq(4, 8, 16).map(cfg).mkString(", ") + " " +
    Seq(4, 8, 16).map(row).mkString(" UNION ALL ") + " ORDER BY n_bands"
  }

  private def minhashEvalOracleSql: String =
    s"WITH ${shingleCteFor(3, "e", "WHERE doc_id < 200")}, ${bandsSqlFor("e")}, " +
    "esz AS (SELECT doc_id, count(*) AS sz FROM ehs GROUP BY doc_id), " +
    "eit AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS inter " +
    "FROM ehs x JOIN ehs y ON x.h = y.h AND x.doc_id < y.doc_id GROUP BY 1, 2), " +
    "etr AS (SELECT a_id, b_id FROM eit " +
    "JOIN esz sa ON sa.doc_id = a_id JOIN esz sb ON sb.doc_id = b_id " +
    "WHERE inter * 2 >= sa.sz + sb.sz - inter), " +
    "ecand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id " +
    "FROM ebands x JOIN ebands y " +
    "ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id), " +
    "ehit AS (SELECT a_id, b_id FROM etr JOIN ecand USING (a_id, b_id)), " +
    "m AS (SELECT (SELECT count(*) FROM etr) AS n_truth, " +
    "(SELECT count(*) FROM ecand) AS n_cand, " +
    "(SELECT count(*) FROM ehit) AS n_hit) " +
    "SELECT n_truth, n_cand, n_hit, " +
    "CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
    "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_truth END AS recall_micro, " +
    "CASE WHEN n_cand = 0 THEN CAST(0 AS BIGINT) " +
    "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_cand END AS precision_micro " +
    "FROM m"

  /** Incremental-minhash oracle: corpus (doc_id < 250) and batch
    * (doc_id >= 250) each get their OWN shingle/signature/band chain —
    * mirroring that the index was built from corpus text alone and the
    * batch is signed fresh (per-side DF caps included) — then candidates
    * are the batch×corpus band-bucket join and the confirm runs over the
    * unioned hashed shingles, exactly the Spark composition. */
  /** The batch-screen tail over NAMED corpus index relations — shared
    * by the plain incremental screen (chs/cbands) and the takedown
    * screen (the tombstone-filtered dhs/dbnd): candidates from the
    * batch×corpus band-bucket join, confirm over the unioned hashed
    * shingles, per-batch-doc keep flags. */
  private def incScreenTailSql(corpusHs: String, corpusBands: String): String =
    incScreenCtesFor("", corpusHs, corpusBands) + " " +
    "SELECT d.doc_id, " +
    "CAST(coalesce(m.n_corpus_matches, 0) AS BIGINT) AS n_corpus_matches, " +
    "CAST(coalesce(m.n_corpus_matches, 0) = 0 AS INTEGER) AS keep " +
    "FROM documents d LEFT JOIN m USING (doc_id) WHERE d.doc_id >= 250"

  /** The screen's CTE body over `pfx`-namespaced names, ending in
    * `<pfx>m(doc_id, n_corpus_matches)` — extracted so the compact
    * reconcile can run TWO screens (tombstone vs rebuilt index) in one
    * WITH; the "" instance reproduces the original tail's names
    * byte-for-byte (all three single-screen consumers unchanged). */
  private def incScreenCtesFor(pfx: String, corpusHs: String,
                               corpusBands: String): String =
    s"${pfx}cand AS (SELECT DISTINCT c.doc_id AS a_id, b.doc_id AS b_id " +
    s"FROM bbands b JOIN $corpusBands c ON b.band = c.band AND b.bh = c.bh), " +
    s"${pfx}uhs AS (SELECT doc_id, h FROM $corpusHs UNION ALL SELECT doc_id, h FROM bhs), " +
    s"${pfx}sz AS (SELECT doc_id, count(*) AS sz FROM ${pfx}uhs GROUP BY doc_id), " +
    s"${pfx}it AS (SELECT c.a_id, c.b_id, count(*) AS inter FROM ${pfx}cand c " +
    s"JOIN ${pfx}uhs x ON x.doc_id = c.a_id " +
    s"JOIN ${pfx}uhs y ON y.doc_id = c.b_id AND y.h = x.h GROUP BY 1, 2), " +
    s"${pfx}m AS (SELECT b_id AS doc_id, count(*) AS n_corpus_matches FROM ${pfx}it " +
    s"JOIN ${pfx}sz sa ON sa.doc_id = a_id JOIN ${pfx}sz sb ON sb.doc_id = b_id " +
    "WHERE inter * 2 >= sa.sz + sb.sz - inter GROUP BY 1)"

  private def incMinhashOracleSql: String =
    s"WITH ${shingleCteFor(3, "c", "WHERE doc_id < 250")}, ${bandsSqlFor("c")}, " +
    s"${shingleCteFor(3, "b", "WHERE doc_id >= 250")}, ${bandsSqlFor("b")}, " +
    incScreenTailSql("chs", "cbands")

  /** Takedown oracle: the SAME capped corpus chain (built on the full
    * corpus half — signatures don't un-happen), with the deleted
    * doc_ids tombstone-filtered from its two index outputs before the
    * shared screen tail — literally the Spark-side row filter, so the
    * equality is structural at any scale. */
  private def indexDeleteOracleSql: String =
    s"WITH ${shingleCteFor(3, "c", "WHERE doc_id < 250")}, ${bandsSqlFor("c")}, " +
    s"${shingleCteFor(3, "b", "WHERE doc_id >= 250")}, ${bandsSqlFor("b")}, " +
    "dhs AS (SELECT doc_id, h FROM chs WHERE doc_id % 10 <> 0), " +
    "dbnd AS (SELECT doc_id, band, bh FROM cbands WHERE doc_id % 10 <> 0), " +
    incScreenTailSql("dhs", "dbnd")

  /** Compaction-reconcile oracle: the tombstone screen (the SAME
    * dhs/dbnd filter as [[indexDeleteOracleSql]], t-prefixed tail) and
    * the compacted screen (an l-prefixed chain rebuilt from the LIVE
    * corpus — the DF cap recomputed on surviving counts, literally the
    * Spark-side [[buildMinhashIndex]] on the filtered docs, k-prefixed
    * tail) composed in ONE WITH, joined per batch doc. Lockstep group:
    * the %10 takedown rule and the 250 split move with
    * dedup_index_delete / dedup_incremental_minhash. */
  private def indexCompactOracleSql: String =
    s"WITH ${shingleCteFor(3, "c", "WHERE doc_id < 250")}, ${bandsSqlFor("c")}, " +
    s"${shingleCteFor(3, "b", "WHERE doc_id >= 250")}, ${bandsSqlFor("b")}, " +
    "dhs AS (SELECT doc_id, h FROM chs WHERE doc_id % 10 <> 0), " +
    "dbnd AS (SELECT doc_id, band, bh FROM cbands WHERE doc_id % 10 <> 0), " +
    s"${shingleCteFor(3, "l", "WHERE doc_id < 250 AND doc_id % 10 <> 0")}, " +
    s"${bandsSqlFor("l")}, " +
    incScreenCtesFor("t", "dhs", "dbnd") + ", " +
    incScreenCtesFor("k", "lhs", "lbands") + " " +
    "SELECT d.doc_id, " +
    "CAST(coalesce(tm.n_corpus_matches, 0) AS BIGINT) AS n_tomb, " +
    "CAST(coalesce(tm.n_corpus_matches, 0) = 0 AS INTEGER) AS keep_tomb, " +
    "CAST(coalesce(km.n_corpus_matches, 0) AS BIGINT) AS n_comp, " +
    "CAST(coalesce(km.n_corpus_matches, 0) = 0 AS INTEGER) AS keep_comp, " +
    "CAST(coalesce(tm.n_corpus_matches, 0) <> coalesce(km.n_corpus_matches, 0) " +
    "AS INTEGER) AS drift " +
    "FROM documents d LEFT JOIN tm ON tm.doc_id = d.doc_id " +
    "LEFT JOIN km ON km.doc_id = d.doc_id WHERE d.doc_id >= 250"

  /** [[compactPolicy]] oracle (cp-prefixed): the UNCAPPED corpus-half
    * shingle frame is `cpsh0` from the shared [[shingleCteFor]]
    * generator (its capped cprare/cpsh tail goes unreferenced — free in
    * DuckDB); signals and the decision mirror the Spark side literally
    * (cap 100, tomb threshold 200000, %10 rule, 250 split — all
    * lockstep). DuckDB sums of INTEGER are HUGEINT → every sum is cast
    * BIGINT. */
  private def compactPolicyOracleSql: String =
    s"WITH ${shingleCteFor(3, "cp", "WHERE doc_id < 250")}, " +
    "cpdf AS (SELECT h1, h2, CAST(count(*) AS BIGINT) AS df, " +
    "CAST(sum(CASE WHEN doc_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT) " +
    "AS df_live FROM cpsh0 GROUP BY h1, h2), " +
    "cpss AS (SELECT " +
    s"CAST(coalesce(sum(CASE WHEN df > $MaxShingleDf THEN 1 ELSE 0 END), 0) " +
    "AS BIGINT) AS n_over_cap, " +
    s"CAST(coalesce(sum(CASE WHEN df > $MaxShingleDf AND " +
    s"df_live <= $MaxShingleDf THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_heal " +
    "FROM cpdf), " +
    "cpds AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus, " +
    "CAST(coalesce(sum(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END), 0) " +
    "AS BIGINT) AS n_deleted FROM documents WHERE doc_id < 250), " +
    "cppre AS (SELECT n_corpus, n_deleted, " +
    "CASE WHEN n_corpus = 0 THEN CAST(0 AS BIGINT) " +
    "ELSE (n_deleted * 1000000) // n_corpus END AS tomb_frac_micro, " +
    "n_over_cap, n_heal FROM cpds CROSS JOIN cpss) " +
    "SELECT n_corpus, n_deleted, tomb_frac_micro, n_over_cap, n_heal, " +
    s"CAST($TombFracCompact AS BIGINT) AS tomb_threshold_micro, " +
    s"CAST(CASE WHEN tomb_frac_micro >= $TombFracCompact OR n_heal >= 1 " +
    "THEN 1 ELSE 0 END AS INTEGER) AS compact FROM cppre"

  /** SimHash fingerprint chain as a CTE ending in `shh(doc_id, simhash)`
    * — same two folds, same 60 sign-bit sums as the Spark side; shared
    * by the fingerprint query and the hamming-band pair oracle. */
  private def simhashCteSql: String = {
    val bitSums = (0 until SimBits).map { j =>
      val src = if (j < 30) s"(h1 >> $j)" else s"(h2 >> ${j - 30})"
      s"sum(CASE WHEN ($src & 1) = 1 THEN 1 ELSE -1 END) AS b$j"
    }.mkString(", ")
    val bitVals = (0 until SimBits)
      .map(j => s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    "tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), " +
    s"th AS (SELECT doc_id, ${polyHashSql("tok", 31L, P1)} AS h1, " +
    s"${polyHashSql("tok", 131L, P2)} AS h2 FROM tk), " +
    s"bs AS (SELECT doc_id, $bitSums FROM th GROUP BY doc_id), " +
    s"shh AS (SELECT doc_id, CAST($bitVals AS BIGINT) AS simhash FROM bs)"
  }

  private def simhashOracleSql: String =
    s"WITH $simhashCteSql SELECT doc_id, simhash FROM shh"

  /** Hamming-band pair oracle: same band split ((simhash >> 15·band) &
    * 32767) and XOR-popcount confirm as [[simhashPairs]]. */
  private def simhashPairsOracleSql: String =
    s"WITH $simhashCteSql, " +
    "bands AS (SELECT doc_id, simhash, band, " +
    s"(simhash >> ($HamBandBits*CAST(band AS INTEGER))) & ${(1L << HamBandBits) - 1} AS bk " +
    s"FROM shh, UNNEST(range(0,$HamBands)) AS u(band)), " +
    "p AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, " +
    "CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming " +
    "FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk " +
    "AND a.doc_id < b.doc_id) " +
    s"SELECT a_id, b_id, hamming FROM p WHERE hamming <= $MaxHamming"

  /** Duplicated-window starts chain (xgt/xg/xd/xs) — the DuckDB mirror
    * of [[dupWindowStarts]]; composed by BOTH substr oracles (lockstep
    * with the Spark shared base; xg-prefixed names disjoint from the
    * shingle chains per the CTE-namespace rule). */
  private def substrStartsCteSql: String =
    "xgt AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), " +
    "xg AS (SELECT doc_id, CAST(i AS BIGINT) AS p, " +
    "array_to_string(t[i:i+4], ' ') AS g " +
    "FROM xgt, UNNEST(range(1, len(t) - 3)) AS u(i) WHERE len(t) >= 5), " +
    "xd AS (SELECT g FROM xg GROUP BY g HAVING count(DISTINCT doc_id) >= 2), " +
    "xs AS (SELECT xg.doc_id, xg.p FROM xg JOIN xd USING (g))"

  val oracle: Map[String, String] = Map(
    // interval-union coverage: running max of exclusive interval ends
    // over the PRECEDING frame mirrors substrCross's window; all
    // operands non-negative so // and div agree
    "dedup_substr_cross" ->
      (s"WITH $substrStartsCteSql, " +
       "xi AS (SELECT doc_id, greatest(0, (p + 5) - greatest(coalesce(" +
       "max(p + 5) OVER (PARTITION BY doc_id ORDER BY p " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), p), p)) AS a " +
       "FROM xs), " +
       "xc AS (SELECT doc_id, CAST(sum(a) AS BIGINT) AS n_covered " +
       "FROM xi GROUP BY doc_id) " +
       "SELECT d.doc_id, CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens, " +
       "CAST(coalesce(xc.n_covered, 0) AS BIGINT) AS n_covered, " +
       "CASE WHEN len(string_split(d.text, ' ')) = 0 THEN CAST(0 AS BIGINT) " +
       "ELSE (CAST(coalesce(xc.n_covered, 0) AS BIGINT) * CAST(1000000 AS BIGINT)) " +
       "// CAST(len(string_split(d.text, ' ')) AS BIGINT) END AS dup_frac_micro " +
       "FROM documents d LEFT JOIN xc ON d.doc_id = xc.doc_id ORDER BY d.doc_id"),
    // excise apply: same xs starts → gaps-and-islands union (break flag
    // on running max of prior ends, prefix-sum island id) → complement
    // against [1, n+1). All-BIGINT; branch 2's max(n.n) is constant per
    // doc (n is functionally dependent on doc_id through the join)
    "dedup_substr_excise" ->
      (s"WITH $substrStartsCteSql, " +
       "xb AS (SELECT doc_id, p, CASE WHEN p > coalesce(max(p + 5) OVER " +
       "(PARTITION BY doc_id ORDER BY p " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), " +
       "CAST(-1 AS BIGINT)) THEN 1 ELSE 0 END AS brk FROM xs), " +
       "xl AS (SELECT doc_id, p, sum(brk) OVER " +
       "(PARTITION BY doc_id ORDER BY p) AS isl FROM xb), " +
       "xcov AS (SELECT doc_id, isl, min(p) AS cs, max(p + 5) AS ce " +
       "FROM xl GROUP BY doc_id, isl), " +
       "xnt AS (SELECT doc_id, " +
       "CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents), " +
       "xk AS (" +
       "SELECT doc_id, coalesce(lag(ce) OVER (PARTITION BY doc_id " +
       "ORDER BY cs), CAST(1 AS BIGINT)) AS ks, cs AS ke FROM xcov " +
       "UNION ALL " +
       "SELECT c.doc_id, max(c.ce) AS ks, max(n.n) + 1 AS ke " +
       "FROM xcov c JOIN xnt n ON c.doc_id = n.doc_id GROUP BY c.doc_id " +
       "UNION ALL " +
       "SELECT n.doc_id, CAST(1 AS BIGINT) AS ks, n.n + 1 AS ke " +
       "FROM xnt n WHERE n.doc_id NOT IN (SELECT doc_id FROM xcov)) " +
       "SELECT doc_id, ks AS keep_start, ke AS keep_end, " +
       "ke - ks AS n_keep FROM xk WHERE ks < ke " +
       "ORDER BY doc_id, keep_start"),
    "dedup_fuzzy" ->
      ("WITH nm AS (SELECT p_name AS name, count(*) AS n_rows, " +
       "split_part(p_name, ' ', 2) AS blk FROM part GROUP BY p_name) " +
       "SELECT a.name AS a_name, b.name AS b_name, " +
       "a.n_rows AS n_a, b.n_rows AS n_b, " +
       "CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist " +
       "FROM nm a JOIN nm b ON a.blk = b.blk AND a.name < b.name " +
       "WHERE levenshtein(a.name, b.name) <= 2"),
    // md5 grouping keys mirror the Spark side's narrow-shuffle-key plan
    // (same UTF-8 byte digest on both engines; groups are identical to
    // grouping by the text itself absent an md5 collision)
    "dedup_exact" ->
      ("SELECT min(doc_id) AS keep_id, count(*) AS n_copies " +
       "FROM documents GROUP BY md5(text)"),
    "dedup_exact_norm" ->
      ("SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM documents " +
       "GROUP BY md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))"),
    "dedup_ngram_jaccard" ->
      s"WITH $ngramPairCte SELECT a_id, b_id, inter, uni FROM jac",
    // dtc-prefixed tail over the SAME jac chain; threshold list and the
    // inter·100 >= t·uni predicate mirrored — lockstep with
    // thresholdCurve (and the family's 0.2 floor)
    // cr-prefixed tails + the shared jac chain; RAW-text dup groups
    // (HAVING >= 2), coalesced zero on a dup-free corpus, non-negative
    // mean division — lockstep with statsReport
    "corpus_stats_report" ->
      (s"WITH $ngramPairCte, " +
       "crb AS (SELECT count(*) AS n_docs, " +
       "count(DISTINCT source) AS n_sources FROM documents), " +
       "crt AS (SELECT count(*) AS n_tokens, count(DISTINCT tok) AS n_vocab " +
       "FROM (SELECT unnest(string_split(text, ' ')) AS tok " +
       "FROM documents) crq), " +
       "crd AS (SELECT count(*) AS n_dup_groups, " +
       "CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS n_dup_docs FROM " +
       "(SELECT count(*) AS c FROM documents GROUP BY text " +
       "HAVING count(*) > 1) crg), " +
       "crn AS (SELECT count(*) AS n_neardup_pairs FROM jac) " +
       "SELECT n_docs, n_sources, n_tokens, n_vocab, " +
       "(n_tokens * 1000000) // n_docs AS mean_tok_micro, " +
       "n_dup_groups, n_dup_docs, n_neardup_pairs " +
       "FROM crb, crt, crd, crn"),
    "dedup_threshold_curve" ->
      (s"WITH $ngramPairCte, " +
       "dtct AS (SELECT UNNEST([20, 30, 40, 50, 60, 70, 80, 90]) AS thr_pct), " +
       "dtcc AS (SELECT t.thr_pct, count(j.a_id) AS n_pairs FROM dtct t " +
       "LEFT JOIN jac j ON j.inter * 100 >= t.thr_pct * j.uni " +
       "GROUP BY t.thr_pct) " +
       "SELECT CAST(thr_pct AS INTEGER) AS thr_pct, " +
       "CAST(n_pairs AS BIGINT) AS n_pairs FROM dtcc ORDER BY thr_pct"),
    // so-prefixed tail over the SAME jac chain; unordered source pair
    // via least/greatest — lockstep with sourceOverlap
    "dedup_source_overlap" ->
      (s"WITH $ngramPairCte, " +
       "sosrc AS (SELECT doc_id, source FROM documents), " +
       "sop AS (SELECT least(a.source, b.source) AS src_a, " +
       "greatest(a.source, b.source) AS src_b FROM jac " +
       "JOIN sosrc a ON jac.a_id = a.doc_id " +
       "JOIN sosrc b ON jac.b_id = b.doc_id) " +
       "SELECT src_a, src_b, count(*) AS n_pairs FROM sop " +
       "GROUP BY src_a, src_b ORDER BY src_a, src_b"),
    // pnd-prefixed: paragraph units (text_chunk's 200/200 windows,
    // pid = doc_id*1e6 + idx), the SAME capped shingle chain via
    // shingleCteFor's `from` relation, the SAME inter*5 >= uni
    // threshold (jaccard lockstep group), cross-doc pairs only,
    // per-doc duplicated-paragraph fraction; all quantities nonneg so
    // // ≡ div; flagged at the 0.5 dupSpanFrac convention
    "dedup_para_neardup" ->
      (s"WITH $paraPairCte, " +
       "pndd AS (SELECT DISTINCT pid FROM " +
       "(SELECT a_id AS pid FROM pndx UNION ALL SELECT b_id FROM pndx) t), " +
       "pndn AS (SELECT doc_id, count(*) AS n_para FROM pndu GROUP BY doc_id), " +
       "pndc AS (SELECT pid // 1000000 AS doc_id, count(*) AS n_dup " +
       "FROM pndd GROUP BY 1) " +
       "SELECT n.doc_id, CAST(n.n_para AS BIGINT) AS n_para, " +
       "CAST(coalesce(c.n_dup, 0) AS BIGINT) AS n_dup_para, " +
       "(CAST(coalesce(c.n_dup, 0) AS BIGINT) * 1000000) // n.n_para " +
       "AS dup_frac_micro, " +
       "CAST((CAST(coalesce(c.n_dup, 0) AS BIGINT) * 1000000) // n.n_para " +
       ">= 500000 AS INTEGER) AS flagged " +
       "FROM pndn n LEFT JOIN pndc c USING (doc_id) ORDER BY n.doc_id"),
    // pnde/pndk tail over the SHARED pnd chain (measure and excise move
    // together): drop = b side of any cross-doc pair (min-pid survivor,
    // pairwise); len() is BIGINT in DuckDB, Spark side casts to long
    "dedup_para_excise" ->
      (s"WITH $paraPairCte, " +
       "pnde AS (SELECT DISTINCT b_id AS pid FROM pndx), " +
       "pndk AS (SELECT u.doc_id, u.pid, " +
       "CAST(len(string_split(u.ptext, ' ')) AS BIGINT) AS n_tok, " +
       "CASE WHEN e.pid IS NOT NULL THEN 1 ELSE 0 END AS drp " +
       "FROM pndu u LEFT JOIN pnde e USING (pid)) " +
       "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_para, " +
       "CAST(sum(drp) AS BIGINT) AS n_excised, " +
       "CAST(sum(n_tok) AS BIGINT) AS tok_total, " +
       "CAST(sum(CASE WHEN drp = 0 THEN n_tok ELSE 0 END) AS BIGINT) AS tok_kept, " +
       "((CAST(sum(n_tok) AS BIGINT) - " +
       "CAST(sum(CASE WHEN drp = 0 THEN n_tok ELSE 0 END) AS BIGINT)) " +
       "* 1000000) // CAST(sum(n_tok) AS BIGINT) AS saved_micro " +
       "FROM pndk GROUP BY doc_id ORDER BY doc_id"),
    // same candidate/stats CTEs as jac, containment threshold instead:
    // smaller side >= 80% contained (inter*5 >= min(sz)*4, exact ints)
    "dedup_containment" ->
      (s"WITH ${shingleCte(5)}, " +
       "sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id), " +
       "pr AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS inter " +
       "FROM sh x JOIN sh y ON x.h1 = y.h1 AND x.h2 = y.h2 " +
       "AND x.doc_id < y.doc_id GROUP BY 1, 2) " +
       "SELECT a_id, b_id, inter, sa.sz AS sz_a, sb.sz AS sz_b FROM pr " +
       "JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id " +
       "WHERE inter * 5 >= least(sa.sz, sb.sz) * 4"),
    // fh-prefixed; composes the shingle generator's UNCAPPED sh0
    // (double-hash keys); band edges powers of two to the cap boundary
    // (MaxShingleDf lockstep); over_cap = the shingles the candidate
    // stage drops
    "dedup_df_hist" -> {
      val names = Seq("df_1", "df_2", "df_3_4", "df_5_8", "df_9_16",
                      "df_17_32", "df_33_64", s"df_65_$MaxShingleDf",
                      "over_cap")
      val nameCase = names.zipWithIndex
        .map { case (s, i) => s"WHEN $i THEN '$s'" }.mkString(" ")
      (s"WITH ${shingleCteFor(3, "fh", "")}, " +
       "fhd AS (SELECT h1, h2, count(*) AS df FROM fhsh0 GROUP BY h1, h2), " +
       "fhb AS (SELECT CASE WHEN df = 1 THEN 0 WHEN df <= 2 THEN 1 " +
       "WHEN df <= 4 THEN 2 WHEN df <= 8 THEN 3 WHEN df <= 16 THEN 4 " +
       "WHEN df <= 32 THEN 5 WHEN df <= 64 THEN 6 " +
       s"WHEN df <= $MaxShingleDf THEN 7 ELSE 8 END AS bucket_id, df FROM fhd), " +
       "fha AS (SELECT bucket_id, count(*) AS n_shingles, " +
       "CAST(sum(df) AS BIGINT) AS n_postings FROM fhb GROUP BY bucket_id), " +
       "fht AS (SELECT CAST(sum(n_shingles) AS BIGINT) AS tot FROM fha) " +
       s"SELECT bucket_id, CASE bucket_id $nameCase ELSE '?' END AS bucket, " +
       "n_shingles, n_postings, " +
       "(n_shingles * CAST(1000000 AS BIGINT)) // tot AS share_micro " +
       "FROM fha, fht ORDER BY bucket_id")
    },
    // nv-prefixed; STRING shingles where Spark keys on the 16-byte
    // double hash (equal absent a 2^-59 collision — the shingleGroups
    // rule); short docs (< 3 tokens) read novelty 1e6 via the CASE
    "text_ngram_novelty" ->
      ("WITH nvt AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), " +
       "nvs AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s " +
       "FROM nvt, UNNEST(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3), " +
       "nvf AS (SELECT s, min(doc_id) AS fd FROM nvs GROUP BY s), " +
       "nvp AS (SELECT nvs.doc_id, count(*) AS n_sh, " +
       "CAST(sum(CASE WHEN nvf.fd = nvs.doc_id THEN 1 ELSE 0 END) AS BIGINT) " +
       "AS n_novel FROM nvs JOIN nvf USING (s) GROUP BY nvs.doc_id) " +
       "SELECT d.doc_id, CAST(coalesce(p.n_sh, 0) AS BIGINT) AS n_sh, " +
       "CAST(coalesce(p.n_novel, 0) AS BIGINT) AS n_novel, " +
       "CASE WHEN coalesce(p.n_sh, 0) = 0 THEN CAST(1000000 AS BIGINT) " +
       "ELSE (p.n_novel * CAST(1000000 AS BIGINT)) // p.n_sh END AS novelty_micro " +
       "FROM documents d LEFT JOIN nvp p USING (doc_id) ORDER BY d.doc_id"),
    // dsv-prefixed tail over the cluster labels (clusterLabCte — the
    // jaccard-threshold lockstep group gains this report); min-doc
    // survivor rule mirrors dedup_keep
    "corpus_dedup_savings" ->
      (s"WITH RECURSIVE $clusterLabCte, " +
       "dsvt AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) " +
       "AS n_tok FROM documents), " +
       "dsvk AS (SELECT cluster, min(doc_id) AS keep_id FROM lab GROUP BY cluster), " +
       "dsvl AS (SELECT l.doc_id, t.n_tok, " +
       "CASE WHEN l.doc_id = k.keep_id THEN 1 ELSE 0 END AS kept " +
       "FROM lab l JOIN dsvk k USING (cluster) JOIN dsvt t USING (doc_id)), " +
       "dsva AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, " +
       "CAST(sum(kept) AS BIGINT) AS n_kept, " +
       "CAST(sum(n_tok) AS BIGINT) AS tok_total, " +
       "CAST(sum(n_tok * kept) AS BIGINT) AS tok_kept FROM dsvl) " +
       "SELECT n_docs, n_kept, n_docs - n_kept AS n_dropped, tok_total, " +
       "tok_kept, tok_total - tok_kept AS tok_dropped, " +
       "((tok_total - tok_kept) * CAST(1000000 AS BIGINT)) // tok_total " +
       "AS savings_micro FROM dsva"),
    // bf-prefixed; bases/bits literals lockstep with BloomBases/
    // BloomBits; corpus split 250 = n/2 at sf0.01 (adaptive-knob rule);
    // the bit array is the DISTINCT position set — the oracle
    // reproduces the EXACT filter via the portable fold
    "dedup_bloom_screen" -> {
      val posSqls = BloomBases.map(b =>
        s"${polyHashSql("nt", b, 1000003L)} % $BloomBits")
      ("WITH bfn AS (SELECT doc_id, " +
       "regexp_replace(lower(trim(text)), ' +', ' ', 'g') AS nt FROM documents), " +
       "bfc AS (SELECT * FROM bfn WHERE doc_id < 250), " +
       "bfb AS (SELECT * FROM bfn WHERE doc_id >= 250), " +
       s"bfh AS (${posSqls.map(p => s"SELECT doc_id, $p AS pos FROM bfc")
                          .mkString(" UNION ALL ")}), " +
       "bfbits AS (SELECT DISTINCT pos FROM bfh), " +
       s"bfq AS (SELECT DISTINCT doc_id, pos FROM (${
         posSqls.map(p => s"SELECT doc_id, $p AS pos FROM bfb")
                .mkString(" UNION ALL ")}) t), " +
       "bfm AS (SELECT q.doc_id, count(*) AS np, " +
       "sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS nm " +
       "FROM bfq q LEFT JOIN bfbits b ON q.pos = b.pos GROUP BY q.doc_id), " +
       "bfk AS (SELECT DISTINCT md5(nt) AS k FROM bfc), " +
       "bfd AS (SELECT b.doc_id, CASE WHEN k.k IS NOT NULL THEN 1 ELSE 0 END " +
       "AS is_dup FROM bfb b LEFT JOIN bfk k ON md5(b.nt) = k.k) " +
       "SELECT m.doc_id, CAST(m.nm = m.np AS INTEGER) AS flagged, d.is_dup, " +
       "CASE WHEN m.nm = m.np AND d.is_dup = 1 THEN 'tp' " +
       "WHEN m.nm = m.np THEN 'fp' WHEN d.is_dup = 1 THEN 'fn' " +
       "ELSE 'tn' END AS verdict " +
       "FROM bfm m JOIN bfd d ON m.doc_id = d.doc_id ORDER BY m.doc_id")
    },
    "dedup_incremental" ->
      (s"WITH $ngramPairCte, " +
       "m AS (SELECT b_id AS doc_id, count(*) AS n_corpus_matches FROM jac " +
       "WHERE a_id < 250 AND b_id >= 250 AND inter * 2 >= uni GROUP BY 1) " +
       "SELECT d.doc_id, " +
       "CAST(coalesce(m.n_corpus_matches, 0) AS BIGINT) AS n_corpus_matches, " +
       "CAST(coalesce(m.n_corpus_matches, 0) = 0 AS INTEGER) AS keep " +
       "FROM documents d LEFT JOIN m USING (doc_id) WHERE d.doc_id >= 250"),
    "dedup_minhash_lsh" -> minhashOracleSql,
    "dedup_minhash_eval" -> minhashEvalOracleSql,
    // the 32-signature re-fold per (bands, rows) config references its
    // upstream CTEs multiply — DuckDB's default inlining re-derived the
    // chain per config (60.8 s at sf0.01; materialized 0.1 s, rows
    // bit-identical — the VERDICT r18 item-1 discipline). Non-recursive
    // (the RECURSIVE families must never take this hint).
    "dedup_band_sweep" -> OracleHints.materializeCtes(bandSweepOracleSql),
    "dedup_incremental_minhash" -> incMinhashOracleSql,
    // the disk-index screen computes the identical result — same oracle
    "dedup_index_persist" -> incMinhashOracleSql,
    "dedup_index_delete" -> indexDeleteOracleSql,
    "dedup_index_compact" -> indexCompactOracleSql,
    "dedup_compact_policy" -> compactPolicyOracleSql,
    "dedup_simhash" -> simhashOracleSql,
    "dedup_simhash_pairs" -> simhashPairsOracleSql,
    "dedup_clusters" ->
      s"WITH RECURSIVE $clusterLabCte SELECT doc_id, cluster FROM lab",
    "dedup_cluster_stats" ->
      (s"WITH RECURSIVE $clusterLabCte, " +
       "csz AS (SELECT cluster, count(*) AS cluster_size FROM lab GROUP BY cluster) " +
       "SELECT cluster_size, count(*) AS n_clusters, " +
       "CAST(sum(cluster_size) AS BIGINT) AS n_docs " +
       "FROM csz GROUP BY cluster_size ORDER BY cluster_size"),
    "dedup_keep" ->
      (s"WITH RECURSIVE $clusterLabCte " +
       "SELECT min(doc_id) AS doc_id, count(*) AS cluster_size FROM lab GROUP BY cluster"),
    // kb-prefixed tail composing the cluster chain with TextOps'
    // quality-trainer chain (q-prefixed names, disjoint by the prefix
    // rule) — survivor = (score_micro desc, doc_id asc) rank 1 per
    // cluster; all-integer keys, no float discipline needed
    "dedup_keep_best" ->
      (s"WITH RECURSIVE $clusterLabCte, ${TextOps.qualityTrainCteSql}, " +
       "kbs AS (SELECT doc_id, CAST(sum(w_micro) AS BIGINT) AS score_micro " +
       "FROM qtb JOIN qw ON qtb.b = qw.bucket GROUP BY doc_id), " +
       "kbj AS (SELECT l.cluster, l.doc_id, s.score_micro " +
       "FROM lab l JOIN kbs s USING (doc_id)), " +
       "kbr AS (SELECT cluster, doc_id, score_micro, " +
       "row_number() OVER (PARTITION BY cluster " +
       "ORDER BY score_micro DESC, doc_id ASC) AS rn, " +
       "count(*) OVER (PARTITION BY cluster) AS cluster_size, " +
       "min(doc_id) OVER (PARTITION BY cluster) AS min_id FROM kbj) " +
       "SELECT cluster, doc_id, score_micro, " +
       "CAST(cluster_size AS BIGINT) AS cluster_size, " +
       "CAST(doc_id <> min_id AS INTEGER) AS changed_pick " +
       "FROM kbr WHERE rn = 1 ORDER BY cluster"),
    // dk-prefixed tail over the cluster labels: A-ES keys with weight
    // 1/cluster_size as the DIVISION-FREE product (−lnu)·cluster_size;
    // u scramble, micronized-ln-first, k literal 5 and the doc_id
    // tie-break all lockstep with dedupWeightedSample (and the ws
    // family's discipline)
    "dedup_weighted_sample" ->
      (s"WITH RECURSIVE $clusterLabCte, " +
       "dkz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size " +
       "FROM lab GROUP BY cluster), " +
       "dkk AS (SELECT d.source, l.doc_id, z.cluster_size, " +
       s"(${Similarity.saltOrdSql("l.doc_id")} % 1000000) + 1 AS u_micro " +
       "FROM lab l JOIN documents d USING (doc_id) " +
       "JOIN dkz z ON z.cluster = l.cluster), " +
       "dkl AS (SELECT source, doc_id, cluster_size, " +
       "(-(CAST(round(ln(CAST(u_micro AS DOUBLE) / CAST(1000000 AS DOUBLE)) " +
       "* 1e6) AS BIGINT))) * cluster_size AS key_micro FROM dkk), " +
       "dkr AS (SELECT source, doc_id, cluster_size, key_micro, " +
       "row_number() OVER (PARTITION BY source " +
       "ORDER BY key_micro ASC, doc_id ASC) AS rn FROM dkl) " +
       "SELECT source, doc_id, CAST(rn AS INTEGER) AS rn, cluster_size, " +
       "key_micro FROM dkr WHERE rn <= 5"),
    // the clusters chain + the corpus_split Knuth-scramble rule applied
    // to the CLUSTER label
    "corpus_split_safe" ->
      (s"WITH RECURSIVE $clusterLabCte " +
       "SELECT doc_id, cluster, CASE WHEN b < 80 THEN 'train' " +
       "WHEN b < 90 THEN 'validation' ELSE 'test' END AS split " +
       "FROM (SELECT doc_id, cluster, " +
       s"${Similarity.saltOrdSql("cluster")} % 100 AS b FROM lab) t"),
    "dedup_sketch_merge" -> sketchMergeOracleSql)
}
