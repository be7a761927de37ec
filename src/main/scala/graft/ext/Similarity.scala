package graft.ext

import graft.Tables
import graft.ops.Num
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (64-dim float vectors) — the
  * north-star ANN surface: brute-force cosine top-k as the baseline, and
  * random-hyperplane LSH bucketing as the scale path (bucket join beats
  * the O(n²) cross product at 100 TB).
  *
  * All vector math is built-in higher-order functions (`zip_with` +
  * `aggregate`), codegen'd, no UDFs. Hyperplanes are derived from a
  * deterministic LCG so the identical ±1 literals appear in the generated
  * DuckDB oracle SQL.
  */
object Similarity {

  /** Dot product via the codegen'd [[graft.functions.ArrayDot]]
    * expression — bit-identical to the former
    * `aggregate(zip_with(...))` HOF fold (same left-to-right double
    * accumulation; see ArrayDot's scaladoc), but one tight primitive
    * loop instead of interpreted lambda dispatch per element. Every
    * oracle is unchanged. */
  private def dotCols(a: Column, b: Column): Column =
    graft.functions.ArrayDot.col(a, b)

  private def cosine(a: Column, b: Column): Column =
    dotCols(a, b) / (sqrt(dotCols(a, a)) * sqrt(dotCols(b, b)))

  /** Element-wise vector mean as ONE typed Aggregator
    * ([[graft.functions.VecSum]]) — replaces the posexplode → groupBy
    * (key, pos) → avg shape whose 64× row blowup hit the exchange
    * before aggregation. The map side now combines to one
    * (sums[64], counts[64]) buffer per key; value semantics (and the
    * 6-dp-rounded outputs every oracle checks) are unchanged. */
  private val vecMean = udaf(new graft.functions.VecSum,
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())

  /** Double-array variant for residual space (IVF-PQ). */
  private val vecMeanD = udaf(new graft.functions.VecSumD,
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]())

  /** Bounded top-[[NProbe]] cell ranking as a typed Aggregator
    * ([[graft.functions.TopKPairsAggregator]]) — replaces the
    * `row_number over (partition by vec_id order by csim desc, cell)`
    * window on the n×cells scans. The window form exchanges and SORTS
    * every (vec, cell, csim) row: at 150 k vectors × the 4096-cell
    * clamp that is a ~600 M-row sort that outgrows per-task execution
    * memory and spills multi-pass (measured 2× data → 9× CPU / 19 GB
    * spill — round-14 BASELINE). The aggregate keeps NProbe pairs per
    * vector per partition, combines MAP-SIDE, ships n·NProbe rows, and
    * never sorts — so past the cell clamp the scan is genuinely linear
    * in n. Selection and rank are IDENTICAL to the window (largest
    * csim first, ties to the lower cell); every oracle is unchanged. */
  // lazy: NProbe is declared later in the file — a plain val would
  // capture the uninitialized 0 during object construction
  private lazy val topNProbe = udaf(
    new graft.functions.TopKPairsAggregator(NProbe),
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())

  /** Bounded top-3 SERVE ranking over a corpus-probe candidate frame
    * (a_id, b_id, sim, …) — selection EXACTLY `row_number over
    * (sim desc, b_id asc) <= 3` (the TopKPairsAggregator contract,
    * −0.0/NaN discipline included). The round-14 ranking-architecture
    * rule extended to the serve tail: when EVERY vector is a probe
    * (ivfTopK, annTopK, the trained serve, the NN-descent re-rank), the
    * rerank window exchange-and-sorts all n×occupancy candidate rows —
    * measured 14.4 GB spill at 768 k vectors (BASELINE round 15) —
    * while the aggregate map-side-combines to 3 pairs per probe.
    * Probe-bounded reranks (100-row eval probes, delete/filtered/upsert
    * serves) legitimately stay window-based. Oracles unchanged. */
  private lazy val topServe = udaf(
    new graft.functions.TopKPairsAggregator(3),
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())

  private def serveTop3(cand: DataFrame): DataFrame =
    cand.groupBy("a_id")
      .agg(topServe(col("sim"), col("b_id")).as("tk"))
      .select(col("a_id"), posexplode(col("tk")))
      .select(col("a_id"), col("col._2").as("b_id"),
              (col("pos") + 1).cast("int").as("rn"), col("col._1").as("sim"))

  /** Expand a [[topNProbe]] result column `tk` back to the ranked long
    * form (vec_id, cell, csim, rn) every consumer expects. */
  private def explodeRanked(df: DataFrame): DataFrame =
    df.select(col("vec_id"), posexplode(col("tk")))
      .select(col("vec_id"), col("col._2").as("cell"),
              col("col._1").as("csim"),
              (col("pos") + 1).cast("int").as("rn"))

  /** Long-form centroid rows from a vecMean result: (key…, pos, m) with
    * means rounded at 6 dp for the cross-engine check — posexplode here
    * runs on the ALREADY-AGGREGATED tiny frame (keys×64 rows). */
  private def meanLongForm(grouped: DataFrame, keyCol: String): DataFrame =
    grouped
      .select(col(keyCol), posexplode(col("mv")))
      .select(col(keyCol), col("pos").cast("int").as("pos"),
              Num.rnd(col("col"), 6).as("m"))

  /** L2 norm per vector (fold determinism probe for the oracle). */
  def norms(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
              Num.rnd(sqrt(dotCols(col("embedding"), col("embedding"))), 6).as("nrm"))

  /** Brute-force cosine top-10 against the vec_id=0 query vector.
    * TakeOrderedAndProject (no global sort); the query side is a 1-row
    * broadcast, the big side streams — scales linearly. */
  def bruteTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    // query norm computed ONCE in the broadcast row, not per candidate
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("qnrm"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
              Num.rnd(dotCols(col("embedding"), col("qv")) /
                        (sqrt(dotCols(col("embedding"), col("embedding"))) * col("qnrm")),
                      6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(10)
  }

  /** Deterministic ±1 hyperplane entries via LCG (same numbers are
    * emitted as literals into the oracle SQL). */
  private[graft] def plane(j: Int, dim: Int = 64): Seq[Double] =
    (0 until dim).map { i =>
      val x = (1103515245L * (j * dim + i) + 12345L) >> 16
      if ((x & 1L) == 1L) 1.0 else -1.0
    }

  /** Scale-aware index sizing: the round-1 design froze 8 planes (256
    * buckets) and 16 IVF cells forever, so the in-bucket self-join was
    * O(n²/256) — quadratic at 100 TB. Bucket count must grow with n:
    * planes = clamp(8, 20, ⌈log2(n / 8)⌉) targets ~8 vectors per bucket
    * (2^20 ≈ 1M buckets at the top), cells = clamp(16, 4096, ⌈n/32⌉).
    * At sf0.01 (n=500) both formulas yield exactly the round-1 constants
    * (8 planes, 16 cells), which is the regime the static oracle SQL
    * encodes — the driver verifies at sf0.01, so the oracle stays exact
    * while bench/production scales get a bigger index. The count that
    * feeds the formula is one metadata-cheap job, memoized per
    * (session, dir) — the same role AQE's runtime stats play. */
  private def embCount(spark: SparkSession, dir: String): Long =
    CountMemo.get(spark, dir, "embeddings")(
      Tables.embeddings(spark, dir).count())

  private[graft] def numPlanes(n: Long): Int = {
    val want = math.ceil(math.log(math.max(n, 1L) / 8.0) / math.log(2.0)).toInt
    math.max(8, math.min(20, want))
  }
  private[graft] def ivfCells(n: Long): Int =
    math.max(16, math.min(4096, math.ceil(n / 32.0).toInt))

  /** Rebalance a compute-heavy scan to the session's core count before
    * an n×cells centroid product. Parquet split sizing is byte-based
    * (`maxPartitionBytes`), so a compact embedding table arrives in a
    * handful of splits even when the per-row work downstream is
    * cells×64 mul-adds: the sf1 scaling run (bench_sf1.json) measured
    * the whole assign family at ≤8 tasks on 32 cores — a parallelism
    * ceiling, not a data bottleneck. The round-robin exchange carries
    * only the table's own bytes (MBs here; on a real cluster the table
    * already arrives in ≥cores splits, so this stays a same-magnitude
    * rebalance). Downstream math is row-independent, so partitioning
    * cannot change any output. */
  private def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Hard cap on candidates drawn per bucket (deterministic: lowest
    * vec_ids kept). A skewed bucket of M rows yields at most M·cap pairs
    * instead of M² — linear, never quadratic. Sized far above any bucket
    * at test SFs (no effect on oracle results); at 100 TB it bounds the
    * worst case that plane-count growth alone can't. HONESTY NOTE: when
    * the cap fires, the b-side is truncated to the cap lowest vec_ids —
    * pairs among higher-id members of an oversized bucket are not
    * examined, so results are id-biased, not a uniform sample. The cap
    * firing means a bucket is ~128× over the ~8-vector target — raise
    * numPlanes (or re-shard the bucket) rather than rely on the cap;
    * it is a guardrail against quadratic blowup, not a sampler. */
  // SPARK_GRAFT_BUCKET_CAP is a SCALE-MEASUREMENT override only (the
  // round-15 post-cap flat-line observation forces the cap at sf6
  // instead of generating 4.2 M vectors): results CHANGE when the cap
  // binds (documented sampling behavior), so Verify/Bench gate runs and
  // production must never set it — the default is the contract.
  private val MaxBucketCandidates =
    sys.env.get("SPARK_GRAFT_BUCKET_CAP") match {
      case None => 1024
      case Some(raw) => raw.toIntOption.filter(_ > 0).getOrElse(
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_BUCKET_CAP must be a positive int, got '$raw'"))
    }

  /** True when the scale-measurement cap override is active — gate
    * entry points (Verify) use this to fail fast, since the 1024
    * default is the oracle contract (ADVICE r15). */
  private[graft] def bucketCapOverridden: Boolean =
    sys.env.contains("SPARK_GRAFT_BUCKET_CAP")

  /** Salted deterministic order for cap truncation: a Knuth
    * multiplicative scramble of the id, so an oversized bucket degrades
    * to a pseudo-uniform SAMPLE instead of "the cap lowest vec_ids"
    * (round 3's order was id-biased when the cap fired). Pure integer
    * arithmetic — the identical formula is emitted into the oracle CTEs.
    * The pre-mod bounds the product below 2^63 for ALL non-negative ids
    * (max (2^31-1)·2654435761 ≈ 5.7e18 < Long.MaxValue), so no id range
    * can overflow — which THROWS under Spark 4 ANSI and errors in
    * DuckDB. */
  private[graft] def saltOrd(id: Column): Column =
    pmod(pmod(id, lit(2147483648L)) * lit(2654435761L), lit(2147483648L))
  private[graft] def saltOrdSql(e: String): String =
    s"(((($e) % 2147483648) * 2654435761) % 2147483648)"

  /** Shared candidate stage for the bucket/cell ANN family: self-join on
    * the partition key with the b-side capped, exact cosine per pair
    * from precomputed norms (ONE 64-dim fold per candidate). Callers
    * filter (a != b or a < b) and rank/threshold.
    *
    * Cap firings are OBSERVABLE: an `observe` metric (CollectMetrics —
    * computed during the normal action, no extra pass) reports how many
    * candidate rows the cap dropped and the largest bucket seen;
    * [[CapMetrics]] registers a listener that WARN-logs any truncation,
    * so silently-degraded neighbor sets can't go unnoticed — the
    * operator's own guidance is to raise numPlanes when this fires. */
  private[graft] def pairCandidates(withKey: DataFrame, key: String,
                                  cap: Int = MaxBucketCandidates): DataFrame =
    pairCandidatesAB(withKey, withKey, key, cap)

  /** Asymmetric form: `aKeyed` supplies the probe side (may carry several
    * key rows per vector — multi-probe IVF), `bKeyed` the indexed side
    * (home key only, cap applies here). Both need (vec_id, embedding,
    * key, nrm). */
  private[graft] def pairCandidatesAB(aKeyed: DataFrame, bKeyed: DataFrame,
                                      key: String, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = aKeyed.select(col("vec_id").as("a_id"), col("embedding").as("va"),
                          col(key), col("nrm").as("nrm_a"))
    val wCap = Window.partitionBy(key)
      .orderBy(saltOrd(col("b_id")).asc, col("b_id").asc)
    val b = bKeyed.select(col("vec_id").as("b_id"), col("embedding").as("vb"),
                          col(key), col("nrm").as("nrm_b"))
      .withColumn("rnb", row_number().over(wCap))
      // the instance counter keeps the metric name unique when two
      // independent builds of this stage land in ONE plan (e.g.
      // sim_nn_descent_eval joins the baseline and the refined graph,
      // each embedding its own candidate stage) — Spark rejects
      // same-named CollectMetrics with different results
      // (DUPLICATED_METRICS_NAME). CapMetrics prefix-matches, so every
      // instance still WARN-logs on truncation.
      .observe(s"graft_bucket_cap_${key}_${CapSeq.incrementAndGet()}",
        // coalesce: over 0 rows sum/max are NULL, which must read as
        // "nothing truncated", not crash the metrics listener
        coalesce(sum(when(col("rnb") > cap, 1L).otherwise(0L)), lit(0L))
          .as("rows_truncated"),
        coalesce(max(col("rnb")), lit(0)).as("max_bucket_rows"))
      .filter(col("rnb") <= cap).drop("rnb")
    a.join(b, Seq(key))
      .select(col("a_id"), col("b_id"),
              Num.rnd(dotCols(col("va"), col("vb")) / (col("nrm_a") * col("nrm_b")), 6)
                .as("sim"))
  }

  /** Monotone id for cap-metric names — uniqueness within any one plan. */
  private val CapSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private def bucketCol(planes: Int): Column =
    (0 until planes).map { j =>
      val h = array(plane(j).map(lit): _*)
      when(dotCols(col("embedding"), h) > 0, 1 << j).otherwise(0)
    }.reduce(_ + _).as("bucket")

  /** LSH bucket assignment: random-hyperplane sign bits → bucket id.
    * Near vectors collide with high probability. */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), bucketCol(numPlanes(embCount(spark, dir))))

  /** LSH bucket-balance entropy — the index-health number an ANN
    * operator watches before trusting its candidate volumes: Shannon
    * entropy of the bucket-size distribution vs the ln(n_buckets)
    * ceiling, as a micro-unit balance ratio. Skewed hyperplanes (or a
    * drifted corpus) collapse mass into few buckets → candidate caps
    * fire and recall quietly degrades; balance ≈ 1e6 is the healthy
    * reading. Same micronized-ln discipline as the entropy family
    * (each ln rounded to µ-nats FIRST, then exact BIGINT; all
    * non-negative so div ≡ //). One bucket-size agg + a one-row fold —
    * free at any corpus scale. */
  /** One-row micronized-ln entropy fold over a (key, c) size frame —
    * shared by [[bucketEntropy]] (LSH buckets) and [[cellBalance]]
    * (trained-IVF home cells): the two index-health twins must apply
    * the identical discipline. */
  private def entropyFold(sizes: DataFrame): DataFrame = {
    def lnMicro(c: Column): Column = round(log(c) * lit(1e6)).cast("long")
    sizes
      .agg(count(lit(1)).as("n_buckets"), sum("c").as("n_vecs"),
           max("c").as("max_bucket"),
           sum(col("c") * lnMicro(col("c"))).as("sclnc"))
      .withColumn("h_micro",
        lnMicro(col("n_vecs")) - expr("sclnc div n_vecs"))
      .withColumn("h_max_micro", lnMicro(col("n_buckets")))
      .withColumn("balance_micro",
        when(col("n_buckets") === 1L, lit(1000000L))
          .otherwise(expr("(h_micro * CAST(1000000 AS BIGINT)) div h_max_micro")))
      .select("n_buckets", "n_vecs", "max_bucket",
              "h_micro", "h_max_micro", "balance_micro")
  }

  def bucketEntropy(spark: SparkSession, dir: String): DataFrame =
    entropyFold(lshBuckets(spark, dir)
      .groupBy("bucket").agg(count(lit(1)).as("c")))

  /** IVF cell-balance entropy — the trained-quantizer twin of
    * [[bucketEntropy]] (random hyperplanes vs learned centroids): the
    * entropy of HOME-cell occupancy from the memoized assignment
    * (owner sim_ivf_assign family). Imbalanced cells mean nprobe
    * recall varies by query region and the per-cell candidate cap
    * fires early — this is the number that says "retrain the
    * quantizer". Same fold, same guards, cell-named columns. */
  def cellBalance(spark: SparkSession, dir: String): DataFrame =
    entropyFold(ivfAssignRanked(spark, dir).filter(col("rn") === 1)
      .groupBy("cell").agg(count(lit(1)).as("c")))
      .toDF("n_cells", "n_vecs", "max_cell",
            "h_micro", "h_max_micro", "balance_micro")

  /** ANN top-3 per query via LSH: self-join within buckets (candidate set
    * ~n/256 per vector instead of n), exact cosine re-rank, keep 3.
    * The bucketed join is the 100 TB path: shuffle by bucket, no cross
    * product. */
  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    // norms are precomputed once per vector (not per pair): the pairwise
    // stage then does ONE 64-dim fold per candidate instead of three.
    val withB = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              bucketCol(numPlanes(embCount(spark, dir))),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
    serveTop3(pairCandidates(withB, "bucket")
      .filter(col("a_id") =!= col("b_id")))
      .select("a_id", "b_id", "rn", "sim")
  }

  /** Embedding-cosine near-dup (the dedup-by-embedding path): candidate
    * pairs from LSH buckets, exact cosine confirm at a threshold. Same
    * bucket-join scale shape as annTopK — never O(n²). The threshold is
    * 0.4 because the synthetic vectors are near-orthogonal (max pairwise
    * cosine ~0.51 at sf0.01): a 0.9 cut matches nothing and would make
    * the oracle check vacuous; at 0.4 real pairs survive, so the cosine
    * path is actually verified. */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val withB = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              bucketCol(numPlanes(embCount(spark, dir))),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
    pairCandidates(withB, "bucket")
      .filter(col("a_id") < col("b_id"))
      .filter(col("sim") >= 0.4)
  }

  /** Probe width for IVF search: every query probes its `NProbe` nearest
    * cells (indexed vectors still live in ONE home cell). nprobe=1 missed
    * true neighbors that fell just across a cell boundary — the classic
    * IVF recall cliff; nprobe=2 roughly doubles the candidate set
    * (cost ~2× the in-cell join, still no cross product) for most of the
    * recall that higher nprobe buys. Static so the oracle SQL encodes the
    * same constant at every scale. */
  private[graft] val NProbe = 2

  /** IVF-style ANN: the first `ivfCells(n)` vectors act as the coarse
    * quantizer ("trained" centroids — a stub quantizer standing in for
    * k-means, deterministic); every vector is RANKED against the (tiny,
    * broadcast) centroid table and the top [[NProbe]] cells are kept —
    * rn = 1 is the home-cell assignment, rn > 1 the extra probe targets.
    * Memoized once per (session, dir): the n×cells cosine scan is the
    * expensive half and assignment/search/training all start from it. */
  private[ext] def ivfAssignRanked(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "ivfassign"),
      rankedAtNprobe(spark, dir, NProbe).localCheckpoint())

  /** The n×cells bounded top-k centroid ranking at an EXPLICIT probe
    * width — the memoized [[ivfAssignRanked]] is the k = [[NProbe]]
    * instance (same aggregator selection, so the memo is byte-identical
    * to the pre-refactor build); [[serveAtNprobe]]'s k > NProbe arm is
    * the only other caller, deliberately UN-memoized: it runs only when
    * [[nprobePlanned]]'s chooser picks a width the production memo
    * doesn't carry, a query-time cost like probe descent. */
  private def rankedAtNprobe(spark: SparkSession, dir: String,
                             k: Int): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
    val cents = emb.filter(col("vec_id") < ivfCells(embCount(spark, dir)))
      .select(col("vec_id").as("cell"), col("embedding").as("cv"),
              col("nrm").as("cnrm"))
    val topK = udaf(
      new graft.functions.TopKPairsAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    // bounded top-k aggregate, not a window: the n×cells scan
    // map-side-combines to k pairs per vector — no full sort,
    // no spill, linear in n past the cell clamp (see topNProbe doc)
    explodeRanked(
      fanOut(emb).crossJoin(broadcast(cents))
        .select(col("vec_id"),
                Num.rnd(dotCols(col("embedding"), col("cv")) /
                          (col("nrm") * col("cnrm")), 6).as("csim"),
                col("cell"))
        .groupBy("vec_id")
        .agg(topK(col("csim"), col("cell")).as("tk")))
  }

  /** Home-cell (rank-1) coarse assignment — the `sim_ivf_assign` query. */
  def ivfAssign(spark: SparkSession, dir: String): DataFrame =
    ivfAssignRanked(spark, dir)
      .filter(col("rn") === 1)
      .select("vec_id", "cell", "csim")

  /** IVF search: top-3 neighbors per vector — each query probes its
    * [[NProbe]] nearest cells, candidates are the indexed vectors whose
    * HOME cell matches a probed cell (shuffle by cell, b-side capped),
    * exact cosine re-rank. A pair appears at most once (the b side has
    * one home cell), so no dedup stage is needed. */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame =
    serveTop3(ivfCandidates(spark, dir))
      .select("a_id", "b_id", "rn", "sim")

  /** The multi-probe candidate stage (a_id, b_id, 6-dp sim) shared by
    * [[ivfTopK]] and [[rangeSearch]] — its oracle mirror is
    * ivfTopKCteSql's chain through `p` (lockstep). */
  private[ext] def ivfCandidates(spark: SparkSession, dir: String): DataFrame = {
    val ranked = ivfAssignRanked(spark, dir)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
    val probes = emb.join(ranked.select("vec_id", "cell"), Seq("vec_id"))
    val indexed = emb.join(ranked.filter(col("rn") === 1)
                             .select("vec_id", "cell"), Seq("vec_id"))
    pairCandidatesAB(probes, indexed, "cell", MaxBucketCandidates)
      .filter(col("a_id") =!= col("b_id"))
  }

  /** Occupancy threshold for [[cellSplit]] — at sf0.01 (500 vectors /
    * 16 cells, mean occupancy 31) it sits AT the mean so both branches
    * occur naturally; mirrored literally in the oracle (lockstep). */
  private[graft] val SplitOccupancy = 32L

  /** Occupancy-triggered cell SPLIT (sim_cell_split) — the re-shard
    * maintenance job the bucket cap's own guidance prescribes
    * ([[pairCandidates]] scaladoc: "raise numPlanes or re-shard the
    * bucket rather than rely on the cap"): every home cell past
    * [[SplitOccupancy]] members is split by MEDIAN-THRESHOLD BISECTION
    * — the model per hot cell is (seed direction = the lowest member
    * vec_id's embedding, τ = the cell's lower-median 6-dp cosine to it,
    * rank (n+1) div 2 under (s0sim desc, vec_id asc) — the agg_median
    * exact-selection discipline); members with s0sim ≥ τ form child 0,
    * the rest child 1, and a probe routes by the SAME compare at query
    * time. SPLIT-RULE HISTORY (BASELINE round 16): the round-15 rule
    * ("two lowest member ids", nearest-of-two) measured DEGENERATE at
    * 768 k — the biggest child kept 96 % of members and candidate
    * volume fell only 6 %; a farthest-seed (2-means++-style) variant
    * measured IDENTICALLY degenerate, because in 64 dims nearly every
    * member is closer to the cell center than to any single extreme
    * point, so ANY nearest-of-two-points cut shaves a thin cap. The
    * median threshold is balanced BY CONSTRUCTION (up to tie mass at
    * τ — an identical-vector clump keeps child 0 and reads in the
    * report as an unsplittable cell, which is the honest answer).
    * Scale shape: occupancy is one |cells|-row agg; the model is one
    * min(vec_id) agg + one exact rank selection per cell (a window
    * over hot MEMBERS — one row each, never an n×cells expansion; the
    * qv/md positional-selection family); re-assignment and probe
    * routing are a single threshold compare — NO pick window at all. */
  def cellSplit(spark: SparkSession, dir: String): DataFrame = {
    val (occ, _, _, _, assigned) = cellSplitParts(spark, dir)
    cellSplitReportOf(occ, assigned)
  }

  /** The per-cell split report over an (occupancy, child-picks) pair —
    * shared by [[cellSplit]] (stub-quantizer home cells) and
    * [[cellSplitTrained]] (Lloyd-trained home cells) so the two
    * reports carry ONE shape. */
  private def cellSplitReportOf(occ: DataFrame,
                                assigned: DataFrame): DataFrame = {
    val childSizes = assigned.groupBy("cell")
      .agg(sum(when(col("sub") === 0, 1L).otherwise(0L)).as("c0"),
           sum(when(col("sub") === 1, 1L).otherwise(0L)).as("c1"))
    occ.join(childSizes, Seq("cell"), "left")
      .select(col("cell"), col("n_before"),
        col("c0").isNotNull.cast("int").as("split"),
        coalesce(col("c0"), lit(0L)).as("n_child0"),
        coalesce(col("c1"), lit(0L)).as("n_child1"),
        coalesce(greatest(col("c0"), col("c1")), col("n_before"))
          .as("n_max_after"))
      .orderBy("cell")
  }

  /** Occupancy split over the TRAINED quantizer's home cells
    * (sim_cell_split_trained) — production indexes serve Lloyd-trained
    * cells ([[ivfTopKTrained]] / sim_index_persist), so the
    * maintenance loop must read occupancy THERE: the identical
    * median-τ rule ([[splitRoundParts]] takes any (vec_id, cell)
    * assignment) applied to [[ivfTrainedRanked]]'s rn = 1 home cells,
    * same report shape as [[cellSplit]]. Composes the memoized trained
    * ranking — the split adds one occupancy agg, one τ selection over
    * hot members, and one threshold compare. */
  def cellSplitTrained(spark: SparkSession, dir: String): DataFrame = {
    val (occ, _, _, assigned, _, _) = trainedSplitParts(spark, dir)
    cellSplitReportOf(occ, assigned)
  }

  /** The TRAINED split's working frames — [[splitRoundParts]] over the
    * Lloyd-trained home assignment, with the model and child picks
    * memoized once per (session, dir) (memo keys "tsplitseeds"/
    * "tsplitasg", owner in Bench's list: sim_cell_split_trained)
    * because both the [[cellSplitTrained]] report and the
    * [[splitTopKTrained]] serve consume them — the audited trained
    * split and the applied trained split can never drift. Also returns
    * the trained probe ranking and the home members so the serve
    * composes the SAME frame instances the report audited (one
    * definition site for the trained home/member frames — ADVICE
    * r17). */
  private def trainedSplitParts(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame,
         DataFrame) = {
    val ranked = ivfTrainedRanked(spark, dir)
    val home = ranked.filter(col("rn") === 1).select("vec_id", "cell")
    val members = embWithNrm(spark, dir).join(home, Seq("vec_id"))
    val occ = home.groupBy("cell").agg(count(lit(1)).as("n_before"))
    val hot = occ.filter(col("n_before") > SplitOccupancy).select("cell")
    val seeds = CkptMemo.getOrElseUpdate((spark, dir, "tsplitseeds"),
      splitSeeds(spark, dir, members, hot).localCheckpoint())
    val assigned = CkptMemo.getOrElseUpdate((spark, dir, "tsplitasg"),
      assignToSubSeeds(members, seeds).localCheckpoint())
    (occ, hot, seeds, assigned, ranked, members)
  }

  /** Search over the TRAINED split index (sim_split_topk_trained) —
    * the round-16 verdict's apply gap: production serves the
    * Lloyd-trained cells ([[ivfTopKTrained]] / sim_index_persist), so
    * the occupancy-split maintenance loop's APPLY half must exist
    * THERE, not only on the stub quantizer. Same composition as
    * [[splitTopK]] — postings re-home hot trained cells' members to
    * ncell = cell·2 + sub, probes descend by the model's s0sim ≥ τ
    * compare — through the SHARED [[splitServeFrom]] tail over the
    * TRAINED probe ranking, so an all-cool probe (its [[NProbe]]
    * trained cells all under [[SplitOccupancy]]) is bit-identical to
    * [[ivfTopKTrained]] (CellSplitSpec pins it). */
  def splitTopKTrained(spark: SparkSession, dir: String): DataFrame =
    // memoized once per (session, dir): the query and the trainedsplit
    // frontier leg both read it (the splitband precedent); owner in
    // Bench's list: sim_split_topk_trained
    CkptMemo.getOrElseUpdate((spark, dir, "tsplitserve"), {
      val (_, hot, seeds, assigned, ranked, members) =
        trainedSplitParts(spark, dir)
      splitServeFrom(spark, dir, splitPostings(hot, members, assigned), seeds,
        ranked.select("vec_id", "cell")).localCheckpoint()
    })

  /** Recall of the TRAINED unsplit serve vs the SHARED exact truth —
    * prices what Lloyd training buys (or costs) in recall beside the
    * stub `ivf` leg, the one quantizer-quality number the frontier was
    * missing; joins as the `trained` leg (shared-truth contract). */
  def trainedRecallEval(spark: SparkSession, dir: String,
                        probeN: Long = 100): DataFrame =
    recallVsSharedTruth(spark, dir, ivfTopKTrained(spark, dir), probeN)

  /** Recall of the TRAINED split serve vs the SHARED exact truth —
    * the `trainedsplit` frontier leg. Pointwise ≤ the `trained` leg:
    * a probed hot cell's candidates shrink to one child, and a global
    * top-3 item always survives any candidate subset containing it
    * (nothing scores above it), so hits are monotone in the candidate
    * set (CellSplitSpec pins the inequality). */
  def trainedSplitRecallEval(spark: SparkSession, dir: String,
                             probeN: Long = 100): DataFrame =
    recallVsSharedTruth(spark, dir, splitTopKTrained(spark, dir), probeN)

  /** The split's working frames — (per-cell occupancy, hot cells,
    * home-cell members with embeddings, split model, hot-cell
    * member→child assignment (cell, vec_id, sub)) — shared by the
    * [[cellSplit]] report and the [[splitTopK]] serve so the applied
    * index can never drift from the audited one. The seed table and
    * the child picks are memoized once per (session, dir) — memo keys
    * "splitseeds"/"splitasg", owner in Bench's list: sim_cell_split —
    * because FOUR queries consume them (report, split serve, recall
    * eval, persisted serve) plus the deep chain's round 1. */
  private[ext] def cellSplitParts(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val home = ivfAssignRanked(spark, dir).filter(col("rn") === 1)
      .select("vec_id", "cell")
    val emb = embWithNrm(spark, dir)
    val members = emb.join(home, Seq("vec_id"))
    val occ = home.groupBy("cell").agg(count(lit(1)).as("n_before"))
    val hot = occ.filter(col("n_before") > SplitOccupancy).select("cell")
    val seeds = CkptMemo.getOrElseUpdate((spark, dir, "splitseeds"),
      splitSeeds(spark, dir, members, hot).localCheckpoint())
    val assigned = CkptMemo.getOrElseUpdate((spark, dir, "splitasg"),
      assignToSubSeeds(members, seeds).localCheckpoint())
    (occ, hot, members, seeds, assigned)
  }

  /** Median-threshold child pick for hot-cell members — (cell, vec_id,
    * sub): sub 0 iff the member's 6-dp cosine to the cell's seed
    * direction clears the model's τ — ONE broadcast join + compare,
    * no window. */
  private def assignToSubSeeds(members: DataFrame, seeds: DataFrame)
      : DataFrame =
    members.join(broadcast(seeds), Seq("cell"))
      .select(col("cell"), col("vec_id"),
        when(Num.rnd(dotCols(col("embedding"), col("sv")) /
                       (col("nrm") * col("snrm")), 6) >= col("tau"),
             lit(0)).otherwise(lit(1)).as("sub"))

  /** One split round over an arbitrary (vec_id, cell) assignment —
    * (occupancy of the SOURCE, hot cells, split model, child picks).
    * Rounds ≥ 2 of [[cellSplitRounds]] run this directly (hot sets
    * shrink geometrically, so later rounds are cheap); round 1 reuses
    * the memoized depth-1 frames via [[cellSplitParts]]. */
  private def splitRoundParts(spark: SparkSession, dir: String,
                              asg: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val emb = embWithNrm(spark, dir)
    val members = emb.join(asg, Seq("vec_id"))
    val occ = asg.groupBy("cell").agg(count(lit(1)).as("n_before"))
    val hot = occ.filter(col("n_before") > SplitOccupancy).select("cell")
    val seeds = splitSeeds(spark, dir, members, hot)
    (occ, hot, seeds, assignToSubSeeds(members, seeds))
  }

  /** The post-round full assignment: hot members re-homed to
    * cell·2 + sub, cool members to cell·2 — the bijective encoding at
    * every depth (distinct sources stay distinct; a source is either
    * split or not, never both). */
  private def nextSplitAsg(asg: DataFrame, hot: DataFrame,
                           assigned: DataFrame): DataFrame =
    assigned.select(col("vec_id"),
        (col("cell") * 2 + col("sub")).cast("long").as("cell"))
      .unionByName(asg.join(hot, Seq("cell"), "left_anti")
        .select(col("vec_id"), (col("cell") * 2).cast("long").as("cell")))

  /** The deep-split round states for k = 1..depth: (occupancy of the
    * round's source = the snapshot after k−1 rounds, hot cells,
    * split model, full assignment AFTER the round). Round 1 IS the
    * audited depth-1 split ([[cellSplitParts]]' memoized frames);
    * every later round applies the identical rule to the previous
    * round's assignment — the bpeTrainRounds prefix discipline on the
    * index side. */
  private def cellSplitRounds(spark: SparkSession, dir: String, depth: Int)
      : Seq[(DataFrame, DataFrame, DataFrame, DataFrame)] = {
    require(depth >= 1, s"split depth must be >= 1, got $depth")
    var asg = ivfAssignRanked(spark, dir).filter(col("rn") === 1)
      .select("vec_id", "cell")
    (1 to depth).map { k =>
      val (occ, hot, seeds, assigned) =
        if (k == 1) {
          val (o, h, _, s, a) = cellSplitParts(spark, dir)
          (o, h, s, a)
        } else splitRoundParts(spark, dir, asg)
      asg = nextSplitAsg(asg, hot, assigned)
      (occ, hot, seeds, asg)
    }
  }

  /** Search over the SPLIT index (sim_split_topk) — the APPLY half of
    * [[cellSplit]]: hot-cell members are re-homed to their child cell
    * (ncell = cell·2 + sub; cool cells keep cell·2 — bijective, so
    * cool-cell results are bit-identical to [[ivfTopK]]'s slices), and
    * each probe routes a probed HOT cell by its own s0sim ≥ τ compare
    * at query time (one compare per probed hot cell — query-time
    * work, exactly like probe lists). What the split buys: candidates in a
    * split cell drop to ~occupancy/2 per probe — the at-the-source
    * remedy for the occupancy² regime the round-15 knee measured,
    * instead of the cap's sampling. What it costs: a true neighbor in
    * the hot cell's OTHER child is no longer seen —
    * [[splitRecallEval]] (frontier leg `split`) puts the number on
    * that loss vs the shared truth. Corpus-probe serve ⇒ bounded
    * [[serveTop3]], never a window. */
  def splitTopK(spark: SparkSession, dir: String): DataFrame =
    // memoized once per (session, dir): THREE consumers re-rank from
    // this serve (the query itself, sim_split_recall_eval's screen,
    // sim_knn_mutual_split's edge build) — the knnmutual precedent;
    // owner in Bench's list: sim_split_topk
    CkptMemo.getOrElseUpdate((spark, dir, "splitserve"), {
      val (_, hot, members, seeds, assigned) = cellSplitParts(spark, dir)
      splitServeFrom(spark, dir, splitPostings(hot, members, assigned), seeds,
          ivfAssignRanked(spark, dir).select("vec_id", "cell"))
        .localCheckpoint()
    })

  /** The split index's postings — (vec_id, ncell) with ncell =
    * cell·2 + sub for hot-cell members, cell·2 for cool (bijective) —
    * shared by [[splitTopK]] (served in-session) and
    * [[splitIndexPersistSearch]] (written to durable parquet). */
  private[ext] def splitPostings(hot: DataFrame, members: DataFrame,
                            assigned: DataFrame): DataFrame =
    assigned
      .select(col("vec_id"), (col("cell") * 2 + col("sub")).as("ncell"))
      .unionByName(members.join(hot, Seq("cell"), "left_anti")
        .select(col("vec_id"), (col("cell") * 2).as("ncell")))

  /** One probe-side descent step: a probed HOT cell routes to the
    * child its own `s0sim ≥ τ` compare selects (the exact rule that
    * placed the members — query-time work, one compare per probed hot
    * cell), a cool cell maps to cell·2. Shared by the serve paths and
    * [[splitDeepTopK]]'s per-round fold. `probe` is (vec_id, cell),
    * possibly [[NProbe]] rows per vector — each probed cell descends
    * independently. */
  private[ext] def probeDescend(emb: DataFrame, probe: DataFrame,
                           hot: DataFrame, seeds: DataFrame): DataFrame = {
    val hotPick = probe.join(emb, Seq("vec_id"))
      .join(broadcast(seeds), Seq("cell"))
      .select(col("vec_id"), (col("cell") * 2 +
        when(Num.rnd(dotCols(col("embedding"), col("sv")) /
                       (col("nrm") * col("snrm")), 6) >= col("tau"),
             lit(0)).otherwise(lit(1))).cast("long").as("cell"))
    val cool = probe.join(hot, Seq("cell"), "left_anti")
      .select(col("vec_id"), (col("cell") * 2).cast("long").as("cell"))
    hotPick.unionByName(cool)
  }

  /** The split-index serve over a GIVEN (vec_id, ncell) postings frame,
    * split model, and (vec_id, cell) probe rows (whatever quantizer
    * ranked them — stub or Lloyd-trained) — the probe side routes its
    * probed cells by the model's s0sim ≥ τ compare at QUERY time (the
    * durable index stores postings; the seed table is the model, hot
    * cells = its distinct cells). Shared by [[splitTopK]] /
    * [[splitIndexPersistSearch]] (stub probes, in-session vs reloaded
    * frames), [[splitTopKTrained]] (trained probes), and
    * [[graft.streaming.VecStream]]'s probe stream (arrived probes only
    * — per-probe ranking is batch-local because the index side is
    * complete) — the trainedServeFrom discipline, so no serve path can
    * diverge from the audited one. */
  private[ext] def splitServeFrom(spark: SparkSession, dir: String,
                             postings: DataFrame,
                             seeds: DataFrame,
                             probed: DataFrame): DataFrame = {
    val emb = embWithNrm(spark, dir)
    val hot = seeds.select("cell").distinct()
    val indexed = emb.join(postings, Seq("vec_id"))
    val probes = emb.join(
      probeDescend(emb, probed, hot, seeds).withColumnRenamed("cell", "ncell"),
      Seq("vec_id"))
    serveTop3(pairCandidatesAB(probes, indexed, "ncell", MaxBucketCandidates)
      .filter(col("a_id") =!= col("b_id")))
      .select("a_id", "b_id", "rn", "sim")
  }

  /** Durable posting write, PARTITIONED BY the cell column with ONE
    * file per cell: a bare partitionBy from k shuffle partitions
    * writes up to k files per cell directory — k×|cells| tiny files,
    * which the round-18 PQ knee run measured as the dominant cost of
    * sim_ivfpq_persist at 192 k vectors / 4096 cells (571 s, ~260 k
    * files; BASELINE round 18). The matching repartition routes each
    * cell to exactly one task — the graphedges bucketed-table
    * discipline applied to every durable posting write. Layout-only:
    * reloads read the same rows. */
  private def writePostings(df: DataFrame, byCol: String,
                            path: String): Unit =
    df.repartition(col(byCol))
      .write.mode("overwrite").partitionBy(byCol).parquet(path)

  /** Persisted split-index round trip (sim_split_persist) — the
    * [[ivfIndexPersistSearch]] shape for the SPLIT index (round-15
    * verdict gap #3: the maintenance job's output was session-only):
    * postings (vec_id, ncell) PARTITIONED BY ncell — a hot child can
    * be audited or re-split from its own files, pruning the rest at
    * the listing — plus the split model (cell, sv, snrm, tau;
    * model-sized: one row per split cell), both written to durable
    * parquet and served from the RELOAD through the SAME
    * [[splitServeFrom]] tail as [[splitTopK]]. The oracle is
    * sim_split_topk's VERBATIM (the shared [[splitTopKOracleSql]] val
    * — only the index's home moved; the dedup_index_persist /
    * sim_index_persist rule). Partition-column round-trip: ncell comes
    * back as the directory's inferred INT — cast back to LONG so the
    * serve joins stay type-identical. Eager writes at query
    * construction (the eager-persist family). */
  def splitIndexPersistSearch(spark: SparkSession, dir: String): DataFrame = {
    val (_, hot, members, seeds, assigned) = cellSplitParts(spark, dir)
    val postingsPath = Tables.scratch("split_index_postings")
    writePostings(splitPostings(hot, members, assigned), "ncell",
      postingsPath)
    val seedsPath = Tables.scratch("split_index_seeds")
    seeds.write.mode("overwrite").parquet(seedsPath)
    val reloaded = spark.read.parquet(postingsPath)
      .withColumn("ncell", col("ncell").cast("long"))
    splitServeFrom(spark, dir, reloaded, spark.read.parquet(seedsPath),
      ivfAssignRanked(spark, dir).select("vec_id", "cell"))
  }

  /** INCREMENTAL split maintenance from the persisted index
    * (sim_split_incremental) — proves [[splitIndexPersistSearch]]'s
    * scaladoc claim end-to-end ("a hot child can be audited or
    * re-split from its own files"): the frozen-quantizer base corpus
    * (vec_id < n/2 — the [[ivfIncrementalAssign]] split contract)
    * is depth-1-split and PERSISTED (ncell-partitioned postings +
    * model); an arrival batch (vec_id ≥ n/2) is assigned to the frozen
    * cells and descends the persisted model per vector; then ONE split
    * round runs on ONLY the cells the arrivals pushed past
    * [[SplitOccupancy]], with the round's member scan reading the
    * persisted postings PRUNED to the new-hot ncells at the file
    * listing (PartitionFilters — CellSplitSpec asserts the scan). The
    * new-hot work list is collected driver-side as model-sized
    * maintenance METADATA (≤ |cells| rows — the bookmark-ledger /
    * CountMemo precedent, never data rows). Output = the
    * [[cellSplitReportOf]] shape over the COMBINED occupancy;
    * correctness argument: per-vector assignment and the median-τ rule
    * only read a hot cell's own members, so incremental-descend +
    * pruned-member-split ≡ a from-scratch split round of the combined
    * corpus — the oracle rebuilds from scratch and hash equality is
    * the proof. At sf0.01 the 250-vector base has NO hot cell (max
    * occupancy 19), so the persisted model is legitimately EMPTY and
    * arrivals descend through it unchanged — the spec fixture drives
    * the non-empty-model path (a hot base cell whose children the
    * arrivals re-heat). */
  def splitIncremental(spark: SparkSession, dir: String): DataFrame = {
    val (occ, assigned1, _, _) = splitIncrementalParts(spark, dir, "report")
    cellSplitReportOf(occ, assigned1)
  }

  /** The incremental chain's working frames — (combined occupancy,
    * incremental-round child picks, FINAL depth-2 assignment, per-round
    * model table). All four are LAZY plans (no memo: the final
    * assignment and models have exactly ONE consumer —
    * [[splitIncrementalServe]], whose parquet write IS their
    * materialization; an earlier memoized variant doubled the report's
    * cost for nothing, bench round 17). The base-index persist writes
    * and the model-sized hot-list collect re-run per call (idempotent
    * overwrite / bounded metadata); the report's plan keeps the LIVE
    * pruned postings scans (CellSplitSpec inspects them). `tag` keys
    * the scratch paths PER CALLER (report vs serve vs deep) — the two
    * queries return lazy plans over these files, so a shared path
    * would let a later caller's overwrite invalidate an earlier
    * caller's not-yet-materialized FileIndex (ADVICE r17). */
  private def splitIncrementalParts(spark: SparkSession, dir: String,
                                    tag: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    splitIncrementalPartsFrom(spark, dir, incBaseHome(spark, dir),
      CkptMemo.getOrElseUpdate((spark, dir, "incarrhome"), {
        val split = embCount(spark, dir) / 2
        assignToCentroids(
            embWithNrm(spark, dir).filter(col("vec_id") >= split),
            frozenBaseCentroids(spark, dir))
          .select("vec_id", "cell").localCheckpoint()
      }),
      tag, memoArrDesc = true)
  }

  /** The frozen-quantizer BASE home assignment (vec_id < n/2 against
    * the frozen centroids) — identical across the three incremental
    * queries AND the stream-maintain seam, so it is memoized once per
    * (session, dir) (memo "incbasehome", owner sim_split_incremental
    * in Bench's list; VERDICT r18 item 2: the report/serve/deep trio
    * rebuilt this exact stage three times, ~19 % of the bench). */
  private def incBaseHome(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "incbasehome"), {
      val split = embCount(spark, dir) / 2
      assignToCentroids(
          embWithNrm(spark, dir).filter(col("vec_id") < split),
          frozenBaseCentroids(spark, dir))
        .select("vec_id", "cell").localCheckpoint()
    })

  /** [[splitIncrementalParts]] over an EXPLICIT (base home, arrival
    * home) assignment pair — the seam
    * [[graft.streaming.VecStream.maintainFromSignalToParquet]] shares
    * with the batch chain (arrivals assigned per micro-batch through
    * the same frozen model), so stream-detected and batch-detected
    * maintenance are one code path. `hotParents` (the stream signal's
    * split_needed COARSE cells, driver-side model-sized metadata)
    * restricts the new-hot scan to those cells' children — a provable
    * NO-OP on the result (a coarse cell's occupancy is the sum of its
    * children's, so a hot ncell's parent is always flagged;
    * StreamingSpec pins report equality), but it means the maintenance
    * round plans only the work the detector enqueued. */
  private[ext] def splitIncrementalPartsFrom(spark: SparkSession,
                                             dir: String,
                                             baseHome: DataFrame,
                                             arrHome0: DataFrame,
                                             tag: String,
                                             hotParents: Option[Seq[Long]] =
                                               None,
                                             memoArrDesc: Boolean = false)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val emb = embWithNrm(spark, dir)
    // the base depth-1 split round is a pure function of the canonical
    // baseHome (every caller — the three batch tags AND the stream
    // seam — passes the SAME frozen-quantizer assignment for a given
    // (session, dir)), so its model and child picks are memoized once
    // (memos "incsplit0s"/"incsplit0a", owner sim_split_incremental;
    // VERDICT r18 item 2). occ/hot stay cheap aggs over the
    // checkpointed baseHome.
    val members0 = emb.join(baseHome, Seq("vec_id"))
    val occ0 = baseHome.groupBy("cell").agg(count(lit(1)).as("n_before"))
    val hot0 = occ0.filter(col("n_before") > SplitOccupancy).select("cell")
    val seeds0 = CkptMemo.getOrElseUpdate((spark, dir, "incsplit0s"),
      splitSeeds(spark, dir, members0, hot0).localCheckpoint())
    val assigned0 = CkptMemo.getOrElseUpdate((spark, dir, "incsplit0a"),
      assignToSubSeeds(members0, seeds0).localCheckpoint())
    val postingsPath = Tables.scratch(s"split_inc_postings_$tag")
    writePostings(splitPostings(hot0, members0, assigned0), "ncell",
      postingsPath)
    val modelPath = Tables.scratch(s"split_inc_model_$tag")
    seeds0.write.mode("overwrite").parquet(modelPath)
    // explicit schema: a no-hot-cell base writes an EMPTY model table
    // (sf0.01 does) and the reload must serve through it unchanged
    val model = spark.read.schema(seeds0.schema).parquet(modelPath)
    // the arrival descent is canonical only for the batch trio (the
    // stream seam descends ITS OWN arrHome) — memoized behind the
    // caller flag (memo "incarrdesc", same owner)
    def arrDesc() = probeDescend(emb, arrHome0,
      model.select("cell").distinct(), model)
    val arrN =
      if (memoArrDesc)
        CkptMemo.getOrElseUpdate((spark, dir, "incarrdesc"),
          arrDesc().localCheckpoint())
      else arrDesc()
    val reloaded = spark.read.parquet(postingsPath)
      .withColumn("ncell", col("ncell").cast("long"))
    val comb = reloaded.select(col("vec_id"), col("ncell").as("cell"))
      .unionByName(arrN)
    val occ = comb.groupBy("cell").agg(count(lit(1)).as("n_before"))
    val newHotAll = occ.filter(col("n_before") > SplitOccupancy)
      .select("cell")
    // ncell = cell·2 + sub at depth 1, so parent = ncell div 2
    val newHot = hotParents.fold(newHotAll)(ps =>
      newHotAll.filter(expr("cell div 2").isin(ps: _*)))
    // the maintenance work list (driver-side metadata, model-sized)
    val hotList = newHot.collect().map(_.getLong(0))
    // the pruning isin below compares against the directory-inferred
    // INT partition column — every ncell must fit INT, which the
    // ivfCells clamp (≤ 131k cells, ncell = cell·2 + sub) guarantees
    // today; a future depth/encoding change must not silently turn the
    // partition filter into an empty match (VERDICT r17)
    require(hotList.forall(n => n >= 0 && n <= Int.MaxValue),
      s"new-hot ncell outside INT range (${hotList.take(3).mkString(",")}…)" +
      " — the partition-pruning filter would match nothing; widen the " +
      "partition column handling before raising the cell/depth encoding")
    // member scan: persisted postings pruned to the new-hot ncells at
    // the listing (filter BEFORE the long cast so the partition filter
    // lands on the directory-inferred INT column), plus the arrivals
    // that descended into those cells
    val prunedBase = spark.read.parquet(postingsPath)
      .filter(col("ncell").isin(hotList.map(_.toInt): _*))
      .select(col("vec_id"), col("ncell").cast("long").as("cell"))
    val hotAsg = prunedBase.unionByName(
      arrN.join(newHot, Seq("cell"), "left_semi"))
    val membersH = emb.join(hotAsg, Seq("vec_id"))
    val seeds1 = splitSeeds(spark, dir, membersH, newHot)
    val assigned1 = assignToSubSeeds(membersH, seeds1)
    val finalA = nextSplitAsg(comb, newHot, assigned1)
    val models = model.withColumn("round", lit(1))
      .unionByName(seeds1.withColumn("round", lit(2)))
    (occ, assigned1, finalA, models)
  }

  /** STREAM-TRIGGERED incremental maintenance — the repair half the
    * hot-cell detector ([[graft.streaming.VecStream
    * .hotCellSignalToParquet]]) was missing (round-17 verdict item 4:
    * "a scheduler would enqueue the split" was a comment, not code):
    * run the incremental round over STREAM-ASSIGNED arrivals with the
    * new-hot scan restricted to the signal's split_needed cells, then
    * PERSIST the maintained index back (ncell-partitioned postings +
    * round-columned models — the [[splitIncrementalServe]] layout, so
    * the repaired index serves through [[splitDeepServeFrom]]
    * unchanged). Returns the [[cellSplitReportOf]]-shaped report;
    * stream-detected ≡ batch-detected maintenance because every piece
    * is the batch seam ([[splitIncrementalPartsFrom]]) — StreamingSpec
    * pins report equality against sim_split_incremental on the same
    * arrival split. */
  private[graft] def splitIncrementalMaintain(spark: SparkSession,
                                              dir: String,
                                              arrHome: DataFrame,
                                              flaggedCells: Seq[Long],
                                              postingsOut: String,
                                              modelsOut: String): DataFrame = {
    val (occ, assigned1, finalA, models) = splitIncrementalPartsFrom(
      spark, dir, incBaseHome(spark, dir), arrHome, "stream",
      Some(flaggedCells))
    writePostings(finalA.withColumnRenamed("cell", "ncell"), "ncell",
      postingsOut)
    models.write.mode("overwrite").parquet(modelsOut)
    cellSplitReportOf(occ, assigned1)
  }

  /** Rank a (vec_id, embedding, nrm) frame against a (cell, cv, cnrm)
    * centroid table — the bounded top-[[NProbe]] aggregate every
    * assignment path uses (no window sort). */
  private def rankedAgainstCentroids(vecs: DataFrame,
                                     cents: DataFrame): DataFrame =
    explodeRanked(
      fanOut(vecs).crossJoin(broadcast(cents))
        .select(col("vec_id"),
                Num.rnd(dotCols(col("embedding"), col("cv")) /
                          (col("nrm") * col("cnrm")), 6).as("csim"),
                col("cell"))
        .groupBy("vec_id")
        .agg(topNProbe(col("csim"), col("cell")).as("tk")))

  /** Serve the incrementally-maintained index
    * (sim_split_incremental_serve) — closes [[splitIncremental]]'s
    * maintain → PERSIST BACK → SERVE loop: the post-round assignment
    * (depth-2 ncell space) is written as ncell-partitioned postings
    * plus ONE model table with round 1 = the base split's model and
    * round 2 = the incremental round's (round 1 is legitimately EMPTY
    * at sf0.01 — the flip of the deep-persist converged case), and
    * queries are served from the RELOAD through the SHARED
    * [[splitDeepServeFrom]] tail: probes rank the FROZEN base
    * quantizer's [[NProbe]] cells, then fold one τ-compare descent per
    * persisted round. The oracle rebuilds the whole combined chain
    * from scratch and re-derives the serve — hash equality proves
    * maintained-index serving ≡ from-scratch serving. */
  def splitIncrementalServe(spark: SparkSession, dir: String): DataFrame = {
    val (_, _, finalA, models) = splitIncrementalParts(spark, dir, "serve")
    val postPath = Tables.scratch("split_inc2_postings")
    writePostings(finalA.withColumnRenamed("cell", "ncell"), "ncell",
      postPath)
    val modPath = Tables.scratch("split_inc2_models")
    models.write.mode("overwrite").parquet(modPath)
    val reloaded = spark.read.parquet(postPath)
      .withColumn("ncell", col("ncell").cast("long"))
    val m = spark.read.schema(models.schema).parquet(modPath)
    val probe0 = rankedAgainstCentroids(embWithNrm(spark, dir),
        frozenBaseCentroids(spark, dir))
      .select("vec_id", "cell")
    splitDeepServeFrom(spark, dir, reloaded,
      (1 to 2).map(k => m.filter(col("round") === k).drop("round")),
      probe0)
  }

  /** MULTI-ROUND incremental maintenance (sim_split_incremental_deep)
    * — the round-17 verdict's iterate-to-depth gap: a heavy arrival
    * batch can leave a split cell's CHILDREN still hot after
    * [[splitIncremental]]'s single round, so the maintenance loop must
    * fold rounds until no hot cell or [[SplitDepth]] (the
    * [[splitPlan]] fail-closed contract's bound). Output = the
    * [[cellSplitDeep]] trajectory shape over the incremental chain:
    * row 0 = the combined (post-arrival-descent) occupancy, row k =
    * the occupancy after k incremental rounds. Each round ≥ 2 models
    * the real maintain loop: the current assignment is PERSISTED BACK
    * as ncell-partitioned postings, the round's member scan re-reads
    * them PRUNED to that round's new-hot ncells at the file listing
    * (the [[splitIncrementalParts]] discipline, per round), and the
    * work list is collected as model-sized metadata. A converged round
    * runs NO split work — the snapshot repeats the settled stats (the
    * oracle's bijective ×2 relabel preserves n_cells/n_hot/max_occ, so
    * skipping the no-op keeps hash equality; the honest early-stop).
    * The oracle folds [[splitIncrementalChainSql]] through
    * [[SplitDepth]] from-scratch rounds — hash equality proves
    * iterated-pruned-persisted maintenance ≡ a from-scratch recursive
    * split of the combined corpus. At sf0.01 round 1 de-hots every
    * cell, so round 2 is the converged no-op; the CellSplitSpec
    * fixture drives a genuinely 2-round incremental repair. */
  def splitIncrementalDeep(spark: SparkSession, dir: String): DataFrame = {
    val (occ0, _, finalA0, _) = splitIncrementalParts(spark, dir, "deep")
    def occOf(asg: DataFrame): DataFrame =
      asg.groupBy("cell").agg(count(lit(1)).as("n_before"))
    def snap(k: Int, occ: DataFrame): DataFrame =
      occ.agg(count(lit(1)).as("n_cells"),
           sum(when(col("n_before") > SplitOccupancy, 1L).otherwise(0L))
             .as("n_hot"),
           max("n_before").as("max_occ"))
        .select(lit(k.toLong).as("round"), col("n_cells"), col("n_hot"),
                col("max_occ"))
    val emb = embWithNrm(spark, dir)
    var asg = finalA0
    var snaps = Seq(snap(0, occ0))
    for (k <- 2 to SplitDepth) {
      // persist back FIRST: the reload is the round's — and the
      // previous snapshot's — ZERO-LINEAGE source. The maintain loop
      // reads its own durable index (the real operational shape), and
      // it keeps the composed plan bounded: an all-lazy variant
      // re-planned the frozen-centroid assignment subtree ~370× in
      // one tree (round-18 plan audit) because every snapshot and
      // round re-referenced the full chain.
      val p = Tables.scratch(s"split_inc_deep_r$k")
      writePostings(asg.withColumnRenamed("cell", "ncell"), "ncell", p)
      val reloaded = spark.read.parquet(p)
        .select(col("vec_id"), col("ncell").cast("long").as("cell"))
      snaps = snaps :+ snap(k - 1, occOf(reloaded))
      val newHot = occOf(reloaded)
        .filter(col("n_before") > SplitOccupancy).select("cell")
      // per-round maintenance work list (driver-side, model-sized)
      val hotList = newHot.collect().map(_.getLong(0))
      require(hotList.forall(n => n >= 0 && n <= Int.MaxValue),
        "new-hot ncell outside INT range — the partition filter would " +
        "match nothing (the ivfCells-clamp assumption)")
      asg =
        if (hotList.isEmpty) reloaded
        else {
          val pruned = spark.read.parquet(p)
            .filter(col("ncell").isin(hotList.map(_.toInt): _*))
            .select(col("vec_id"), col("ncell").cast("long").as("cell"))
          val membersH = emb.join(pruned, Seq("vec_id"))
          val seedsK = splitSeeds(spark, dir, membersH, newHot)
          nextSplitAsg(reloaded, newHot,
            assignToSubSeeds(membersH, seedsK))
        }
    }
    snaps = snaps :+ snap(SplitDepth, occOf(asg))
    snaps.reduce(_ unionByName _).orderBy("round")
  }

  /** Default depth for the RECURSIVE split queries — 2 rounds. The
    * median-τ cut halves every sf0.01 hot cell under the threshold in
    * one round, so round 2 is a provable no-op there (a bijective
    * ncell relabel — CellSplitSpec pins deep serve ≡ depth-1 serve);
    * the crafted-fixture spec drives a genuinely recursive chain
    * (packed cell whose 33-member children stay hot) AND the
    * fail-closed plan branch (an identical-vector clump no rule can
    * split). Mirrored literally in the cs<k>-prefixed oracle chains
    * (lockstep). */
  private[graft] val SplitDepth = 2

  /** Recursive split REPORT (sim_cell_split_deep) — the occupancy
    * trajectory of iterating [[cellSplit]] until depth [[SplitDepth]]:
    * row k = the cell snapshot AFTER k rounds (n_cells, n_hot = cells
    * still past [[SplitOccupancy]], max_occ). Row 0 is the unsplit
    * home assignment; n_hot at the last row > 0 means more rounds are
    * needed — the number that drives the maintenance loop's
    * stop-or-continue decision (round-15 verdict gap #2: one split
    * left occupancy-188 cells at ~94). Each round is one |cells|-row
    * agg + one median-τ model selection (a per-cell positional rank
    * over the shrinking hot set's members) — never a member sort over
    * the whole corpus. */
  def cellSplitDeep(spark: SparkSession, dir: String,
                    depth: Int = SplitDepth): DataFrame = {
    val rounds = cellSplitRounds(spark, dir, depth)
    def snap(k: Int, occ: DataFrame): DataFrame =
      occ.agg(count(lit(1)).as("n_cells"),
           sum(when(col("n_before") > SplitOccupancy, 1L).otherwise(0L))
             .as("n_hot"),
           max("n_before").as("max_occ"))
        .select(lit(k.toLong).as("round"), col("n_cells"), col("n_hot"),
                col("max_occ"))
    val snaps = rounds.zipWithIndex.map { case ((occ, _, _, _), i) =>
      snap(i, occ)
    } :+ snap(depth,
      rounds.last._4.groupBy("cell").agg(count(lit(1)).as("n_before")))
    snaps.reduce(_ unionByName _).orderBy("round")
  }

  /** Search over the RECURSIVELY split index (sim_split_deep_topk) —
    * the depth-[[SplitDepth]] generalization of [[splitTopK]]: the
    * index applies [[nextSplitAsg]] per round (ncell = cell·2^depth +
    * path, bijective at every depth — an unsplit source keeps path bit
    * 0), and each probe folds [[probeDescend]] once per round (≤ depth
    * threshold compares per probed cell, query-time). Depth 1 is EXACTLY
    * [[splitTopK]] (CellSplitSpec pins row equality), and a probe
    * whose descent never touches a hot cell gets [[ivfTopK]]'s
    * identical top-3 at ANY depth (the bijection keeps cool members
    * together; CellSplitSpec pins it at depth 2 on sf0.01 and on the
    * recursive fixture). */
  def splitDeepTopK(spark: SparkSession, dir: String,
                    depth: Int = SplitDepth): DataFrame = {
    def build() = {
      val rounds = cellSplitRounds(spark, dir, depth)
      splitDeepServeFrom(spark, dir,
        rounds.last._4.withColumnRenamed("cell", "ncell"),
        rounds.map(_._3),
        ivfAssignRanked(spark, dir).select("vec_id", "cell"))
    }
    // the default-depth serve is memoized (consumers: the query, the
    // deepsplit frontier leg, sim_split_deep_recall_eval; owner in
    // Bench's list: sim_split_deep_topk); explicit non-default depths
    // (spec probes) stay un-memoized
    if (depth == SplitDepth)
      CkptMemo.getOrElseUpdate((spark, dir, "splitdeep"),
        build().localCheckpoint())
    else build()
  }

  /** The deep-split serve over a GIVEN (vec_id, ncell) postings frame
    * and the per-round model list — probes fold one τ-compare descent
    * per round (each round's hot set IS its model's distinct cells).
    * Shared by [[splitDeepTopK]] (in-session frames) and
    * [[splitDeepIndexPersistSearch]] (the same frames reloaded from
    * durable parquet) — the splitServeFrom discipline at depth d. */
  private def splitDeepServeFrom(spark: SparkSession, dir: String,
                                 postings: DataFrame,
                                 modelsByRound: Seq[DataFrame],
                                 probed: DataFrame): DataFrame = {
    val emb = embWithNrm(spark, dir)
    val probeMap = modelsByRound.foldLeft(probed) { (p, seeds) =>
      probeDescend(emb, p, seeds.select("cell").distinct(), seeds)
    }
    serveTop3(pairCandidatesAB(
        emb.join(probeMap.withColumnRenamed("cell", "ncell"), Seq("vec_id")),
        emb.join(postings, Seq("vec_id")),
        "ncell", MaxBucketCandidates)
      .filter(col("a_id") =!= col("b_id")))
      .select("a_id", "b_id", "rn", "sim")
  }

  /** Persisted RECURSIVE split index (sim_split_deep_persist) — the
    * [[splitIndexPersistSearch]] shape at depth [[SplitDepth]], so the
    * depth [[splitPlan]] chooses can be made durable: postings
    * (vec_id, ncell at full depth) PARTITIONED BY ncell, plus ONE
    * model table carrying every round's (cell, sv, snrm, tau) under a
    * `round` column (round k's cells live in round k−1's ncell space —
    * the probe descent consumes them in order). A converged round's
    * model slice is legitimately EMPTY (sf0.01 round 2 — the reload
    * path must and does serve through it unchanged). Serve runs from
    * the RELOAD through the same [[splitDeepServeFrom]] tail as the
    * in-session deep serve; the oracle is sim_split_deep_topk's
    * VERBATIM (only the storage moved). */
  def splitDeepIndexPersistSearch(spark: SparkSession, dir: String,
                                  depth: Int = SplitDepth): DataFrame = {
    val rounds = cellSplitRounds(spark, dir, depth)
    val postingsPath = Tables.scratch("split_deep_postings")
    writePostings(rounds.last._4.withColumnRenamed("cell", "ncell"),
      "ncell", postingsPath)
    val modelsPath = Tables.scratch("split_deep_models")
    rounds.zipWithIndex
      .map { case ((_, _, seeds, _), i) =>
        seeds.withColumn("round", lit(i + 1)) }
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(modelsPath)
    val reloadedIdx = spark.read.parquet(postingsPath)
      .withColumn("ncell", col("ncell").cast("long"))
    val models = spark.read.parquet(modelsPath)
    splitDeepServeFrom(spark, dir, reloadedIdx,
      (1 to depth).map(k => models.filter(col("round") === k).drop("round")),
      ivfAssignRanked(spark, dir).select("vec_id", "cell"))
  }

  /** Recall of the split-index serve vs the SHARED exact truth — the
    * single number that prices [[splitTopK]]'s candidate halving;
    * joins the frontier as the `split` leg (shared-truth contract,
    * GraphSearchSpec's n_truth assert covers it). */
  def splitRecallEval(spark: SparkSession, dir: String,
                      probeN: Long = 100): DataFrame =
    recallVsSharedTruth(spark, dir, splitTopK(spark, dir), probeN)

  /** Recall of the RECURSIVE split serve ([[splitDeepTopK]], depth
    * [[SplitDepth]]) vs the SHARED exact truth — prices the extra
    * candidate halving the second round buys; joins the frontier as
    * the `deepsplit` leg (shared-truth contract, GraphSearchSpec's
    * n_truth assert covers it). */
  def splitDeepRecallEval(spark: SparkSession, dir: String,
                          probeN: Long = 100): DataFrame =
    recallVsSharedTruth(spark, dir, splitDeepTopK(spark, dir), probeN)

  /** The shared-truth recall fold: screen hits vs the memoized exact
    * top-3 per probe — one metric row (the eval-family shape), shared
    * by the two split legs so their metric forms can never drift. */
  /** The eval family's probe-sample predicate. Default = the leading
    * probeN ids (vec_id < probeN — the oracle literal 100). Setting
    * SPARK_GRAFT_PROBE_HELDOUT flips EVERY eval probe filter to the
    * TRAILING probeN ids (vec_id ≥ n − probeN), which are never stub
    * quantizer seeds (seeds are the leading ivfCells ids): at knee
    * scales each leading probe IS a centroid, structurally inflating
    * absolute recall (~97 % vs sf0.01's ~40 % regime — BASELINE r18;
    * VERDICT r18 item 4). SCALE-MEASUREMENT-ONLY (the
    * SPARK_GRAFT_BUCKET_CAP precedent): Verify/Bench gates and
    * production never set it, so every sf0.01 oracle literal is
    * untouched; the "simtruth" memo key carries the mode. */
  private def probeHeldOut: Boolean =
    sys.env.contains("SPARK_GRAFT_PROBE_HELDOUT")
  private def probeSample(spark: SparkSession, dir: String, probeN: Long,
                          id: Column): Column =
    if (probeHeldOut) id >= lit(embCount(spark, dir) - probeN)
    else id < lit(probeN)

  private def recallVsSharedTruth(spark: SparkSession, dir: String,
                                  served: DataFrame,
                                  probeN: Long): DataFrame = {
    val exact = exactTruthTop3(spark, dir, probeN)
    val screen = served
      .filter(probeSample(spark, dir, probeN, col("a_id")))
      .select("a_id", "b_id")
    val hit = exact.join(screen, Seq("a_id", "b_id"))
    exact.agg(count(lit(1)).as("n_truth"))
      .crossJoin(screen.agg(count(lit(1)).as("n_screen")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_truth"), col("n_screen"), col("n_hit"),
        expr("CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
          "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_truth END")
          .as("recall_micro"),
        expr("CASE WHEN n_screen = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_screen END")
          .as("precision_micro"))
  }

  /** Margin (µ-cosine) for the BOUNDARY DUAL-PROBE band
    * ([[splitBandTopK]]): a probe whose |s0sim − τ| to a probed hot
    * cell's split model lands INSIDE the band probes BOTH children
    * (the true neighbor it would otherwise lose sits across the cut
    * almost surely near the cut); outside the band it descends to one
    * child as [[splitTopK]] does. Both engines compare EXACT integer
    * micro-cosines (round(s0sim·1e6) − round(τ·1e6) as BIGINT — s0sim
    * and τ are already 6-dp-grained so the micronization is
    * integer-exact), so the band membership can never drift at the
    * ulp level. Default 50000 µ chosen from the [[splitBandSweep]]
    * grid at sf0.01 (recall 356666 → 370000 µ of the unsplit 396666 µ
    * for 27605 vs 24959 candidates — the middle of the
    * candidates-vs-recall curve); mirrored literally in the oracle
    * (lockstep). */
  private[graft] val SplitBandMargin = 50000L

  /** The [[splitBandSweep]] margin grid — 0 IS the plain split serve
    * (an empty band: the margin-0 row must equal sim_split_recall_eval
    * cell-for-cell) and the [[SplitBandMargin]] row must equal
    * sim_split_band_recall_eval (CellSplitSpec pins both); mirrored
    * literally in the sweep oracle's arm list (lockstep). */
  private[graft] val SplitBandSweepMargins =
    Seq(0L, 20000L, 50000L, 100000L, 150000L)
  // the planner's baseline arm IS the margin-0 row (fail-closed floor)
  // and the planner oracle derives its baseline CTE from this grid by
  // indexOf(0L) — a grid without 0 would silently turn the baseline
  // into a non-zero arm on one side only (ADVICE r18)
  require(SplitBandSweepMargins.contains(0L),
    "SplitBandSweepMargins must contain the margin-0 baseline arm")

  /** Band-aware probe descent — [[probeDescend]] plus the boundary
    * dual-probe: every probed hot cell emits its compare-selected
    * child, and ADDITIONALLY the other child when the probe's
    * |s0sim − τ| is inside `marginMicro` (exact integer µ compare).
    * Emitted (vec_id, cell) rows stay DISTINCT — the two children of
    * one probed cell are distinct ncells and distinct probed cells
    * have disjoint children — so the serve keeps the
    * pair-appears-at-most-once invariant with no dedup stage. */
  private[ext] def probeDescendBand(emb: DataFrame, probe: DataFrame,
                                    hot: DataFrame, seeds: DataFrame,
                                    marginMicro: Long): DataFrame = {
    val hotRows = probe.join(emb, Seq("vec_id"))
      .join(broadcast(seeds), Seq("cell"))
      .select(col("vec_id"), col("cell"), col("tau"),
        Num.rnd(dotCols(col("embedding"), col("sv")) /
                  (col("nrm") * col("snrm")), 6).as("s0sim"))
    val pick = when(col("s0sim") >= col("tau"), lit(0)).otherwise(lit(1))
    val other = when(col("s0sim") >= col("tau"), lit(1)).otherwise(lit(0))
    val primary = hotRows
      .select(col("vec_id"), (col("cell") * 2 + pick).cast("long").as("cell"))
    val secondary = hotRows
      .filter(abs(round(col("s0sim") * lit(1e6), 0).cast("long") -
                  round(col("tau") * lit(1e6), 0).cast("long"))
                < lit(marginMicro))
      .select(col("vec_id"), (col("cell") * 2 + other).cast("long").as("cell"))
    val cool = probe.join(hot, Seq("cell"), "left_anti")
      .select(col("vec_id"), (col("cell") * 2).cast("long").as("cell"))
    primary.unionByName(secondary).unionByName(cool)
  }

  /** The band serve over a GIVEN postings/model pair at a GIVEN margin
    * — [[splitServeFrom]] with [[probeDescendBand]] on the probe side;
    * the indexed side is UNCHANGED (the band is query-time work only —
    * the durable index and its model never move when the margin is
    * tuned). */
  private def splitBandServeFrom(spark: SparkSession, dir: String,
                                 postings: DataFrame, seeds: DataFrame,
                                 marginMicro: Long): DataFrame = {
    val emb = embWithNrm(spark, dir)
    val hot = seeds.select("cell").distinct()
    val indexed = emb.join(postings, Seq("vec_id"))
    val probed = ivfAssignRanked(spark, dir).select("vec_id", "cell")
    val probes = emb.join(
      probeDescendBand(emb, probed, hot, seeds, marginMicro)
        .withColumnRenamed("cell", "ncell"),
      Seq("vec_id"))
    serveTop3(pairCandidatesAB(probes, indexed, "ncell", MaxBucketCandidates)
      .filter(col("a_id") =!= col("b_id")))
      .select("a_id", "b_id", "rn", "sim")
  }

  /** Boundary dual-probe split serve (sim_split_band_topk) — the
    * round-16 verdict's highest-leverage item: [[splitTopK]]'s
    * candidate halving costs ~4 recall points because a true neighbor
    * in a probed hot cell's OTHER child is unseen, and those losses
    * concentrate near the cut; paying double candidates for ONLY the
    * in-band probes ([[SplitBandMargin]]) recovers a third of the gap
    * at sf0.01 for ~11% extra candidates (the [[splitBandSweep]] grid
    * is the measured curve). Out-of-band probes and all-cool probes
    * are BIT-IDENTICAL to [[splitTopK]] / [[ivfTopK]] (same descent,
    * same bijection — CellSplitSpec pins both). Memoized once per
    * (session, dir) — memo key "splitband", owner in Bench's list:
    * sim_split_band_topk — because the recall leg re-ranks from it. */
  def splitBandTopK(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "splitband"), {
      val (_, hot, members, seeds, assigned) = cellSplitParts(spark, dir)
      splitBandServeFrom(spark, dir, splitPostings(hot, members, assigned),
        seeds, SplitBandMargin).localCheckpoint()
    })

  /** The split serve restricted to a GIVEN probe-ID frame — the seam
    * [[splitTopK]]'s full-corpus serve and
    * [[graft.streaming.VecStream.splitSearchToParquet]]'s arriving
    * probe micro-batches share (the filteredTopKFor discipline):
    * per-probe ranking is complete within one call because the index
    * side — the memoized split postings + model — is the full static
    * corpus, so stream ≡ batch at ANY arrival split (StreamingSpec
    * pins it row-for-row against sim_split_topk). */
  private[graft] def splitTopKForProbes(spark: SparkSession, dir: String,
                                        probeIds: DataFrame): DataFrame = {
    val (_, hot, members, seeds, assigned) = cellSplitParts(spark, dir)
    splitServeFrom(spark, dir, splitPostings(hot, members, assigned), seeds,
      ivfAssignRanked(spark, dir).select("vec_id", "cell")
        .join(probeIds.select("vec_id"), Seq("vec_id"), "left_semi"))
  }

  /** Spec probe: the band serve at an EXPLICIT margin, unmemoized —
    * CellSplitSpec drives margin 0 (must equal [[splitTopK]] exactly:
    * an empty band never fires the dual probe) and the monotone
    * candidate-superset property. Production serves go through the
    * memoized [[splitBandTopK]] at [[SplitBandMargin]]. */
  private[graft] def splitBandTopKAt(spark: SparkSession, dir: String,
                                     marginMicro: Long): DataFrame = {
    val (_, hot, members, seeds, assigned) = cellSplitParts(spark, dir)
    splitBandServeFrom(spark, dir, splitPostings(hot, members, assigned),
      seeds, marginMicro)
  }

  /** Recall of the band serve vs the SHARED exact truth — the number
    * that prices the dual-probe's recall recovery; joins the frontier
    * as the `band` leg (shared-truth contract, GraphSearchSpec's
    * n_truth assert covers it). */
  def splitBandRecallEval(spark: SparkSession, dir: String,
                          probeN: Long = 100): DataFrame =
    recallVsSharedTruth(spark, dir, splitBandTopK(spark, dir), probeN)

  /** Band-margin SWEEP (sim_split_band_sweep) — the measure half
    * behind [[SplitBandMargin]]'s default: one row per grid margin
    * with the candidate count (the cost axis) and recall vs the
    * shared truth (the benefit axis), over the eval-family 100-probe
    * sample (the nprobe_sweep precedent — per-probe serving is
    * batch-local because the indexed side is complete, so the sample
    * serve IS the full serve's probe slice; CellSplitSpec pins the
    * margin-0 row to sim_split_recall_eval and the default-margin row
    * to sim_split_band_recall_eval cell-for-cell). */
  def splitBandSweep(spark: SparkSession, dir: String,
                     probeN: Long = 100): DataFrame =
    // memoized 5-row sweep frame ("bandsweepfrm", owner
    // sim_split_band_sweep in Bench's list): the planner re-reads the
    // SAME sweep to choose its margin — before round 19 both queries
    // re-ran all five serve arms (~24 s task time each at sf0.1)
    CkptMemo.getOrElseUpdate((spark, dir, "bandsweepfrm", probeN, probeHeldOut),
      splitBandSweepBuild(spark, dir, probeN).localCheckpoint())

  private def splitBandSweepBuild(spark: SparkSession, dir: String,
                                  probeN: Long): DataFrame = {
    val (_, hot, members, seeds, assigned) = cellSplitParts(spark, dir)
    val postings = splitPostings(hot, members, assigned)
    val emb = embWithNrm(spark, dir)
    val hotCells = seeds.select("cell").distinct()
    val indexed = emb.join(postings, Seq("vec_id"))
    val probed = ivfAssignRanked(spark, dir).select("vec_id", "cell")
      .filter(probeSample(spark, dir, probeN, col("vec_id")))
    val truth = exactTruthTop3(spark, dir, probeN)
    SplitBandSweepMargins.map { m =>
      val probes = emb.join(
        probeDescendBand(emb, probed, hotCells, seeds, m)
          .withColumnRenamed("cell", "ncell"),
        Seq("vec_id"))
      val cand = pairCandidatesAB(probes, indexed, "ncell",
          MaxBucketCandidates)
        .filter(col("a_id") =!= col("b_id"))
      val screen = serveTop3(cand).select("a_id", "b_id")
      val hit = truth.join(screen, Seq("a_id", "b_id"))
      cand.agg(count(lit(1)).as("n_cand"))
        .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
        .crossJoin(screen.agg(count(lit(1)).as("n_screen")))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(lit(m).as("margin_micro"), col("n_cand"), col("n_truth"),
          col("n_screen"), col("n_hit"),
          expr("CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
            "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_truth END")
            .as("recall_micro"))
    }.reduce(_ unionByName _).orderBy("margin_micro")
  }

  /** Max extra candidate pairs the band planner will pay per recovered
    * true hit ([[splitBandPlanned]]'s decision literal, mirrored in
    * its oracle — lockstep): a grid margin qualifies iff its CUMULATIVE
    * gain over margin 0 satisfies Δn_hit · 100 ≥ Δn_cand on the
    * 100-probe sweep sample. At sf0.01 every step is cheap (cumulative
    * 75–97 cand/hit — the whole grid qualifies, chosen = 150000µ,
    * which recovers full unsplit-IVF recall for ~20 % extra
    * candidates); on a tie-degenerate corpus (recall already 1e6, the
    * BASELINE round-17 replica finding) the gain is 0 while the cost
    * is huge, so ONLY margin 0 qualifies — the planner fails closed to
    * the plain split serve instead of over-firing on tie mass. */
  private[graft] val BandPlanCandPerHit = 100L

  /** PLAN-DRIVEN band serve (sim_split_band_planned) — closes the
    * measure → decide → APPLY loop on the band margin (round-17
    * verdict item 2: [[splitBandSweep]] measured the
    * candidates-vs-recall curve but nothing consumed it — the exact
    * gap [[splitServePlanned]] closed for depth): pick the LARGEST
    * grid margin whose cumulative recall gain is worth its candidate
    * cost ([[BandPlanCandPerHit]]), then serve the band at exactly
    * that margin with a `margin_used` column stamping the decision.
    * Margin 0 qualifies trivially (0 ≥ 0) — the fail-closed floor: a
    * corpus where the band buys nothing (tie-mass replicas) serves the
    * plain split index. The sweep is read driver-side as a grid-sized
    * decision frame (5 rows — the CountMemo plan-metadata precedent);
    * the oracle composes the SAME sweep arms
    * ([[bandSweepArmsCtesSql]]), the same decision rule, and one
    * full-probe serve arm per grid margin filtered by the choice —
    * measure, decision, and serve move in lockstep. */
  def splitBandPlanned(spark: SparkSession, dir: String): DataFrame = {
    val sweep = splitBandSweep(spark, dir).collect()
    val base = sweep.find(_.getLong(0) == 0L).get
    val (c0, h0) = (base.getLong(1), base.getLong(4))
    val chosen = sweep.filter(r =>
        (r.getLong(4) - h0) * BandPlanCandPerHit >= r.getLong(1) - c0)
      .map(_.getLong(0)).max
    val served =
      if (chosen == 0L) splitTopK(spark, dir)
      else if (chosen == SplitBandMargin) splitBandTopK(spark, dir)
      else splitBandTopKAt(spark, dir, chosen)
    served.select(col("a_id"), col("b_id"), col("rn"), col("sim"),
      lit(chosen).as("margin_used"))
  }

  /** Split-depth CHOOSER (sim_split_plan) — the decision operator over
    * the [[cellSplitDeep]] trajectory, the bpePick /
    * qualityGateCalibrated fail-closed pattern applied to index
    * maintenance: chosen_depth = the smallest round whose snapshot has
    * NO hot cell left (the depth the maintenance job should run);
    * when no snapshot within [[SplitDepth]] qualifies the plan fails
    * CLOSED — sentinel depth 1e9, converged 0 — telling the operator
    * to raise the depth (or the threshold) DELIBERATELY rather than
    * silently serving an over-occupied index. Context columns carry
    * the final snapshot's n_hot / max_occ so the report is actionable
    * on its own. */
  def splitPlan(spark: SparkSession, dir: String): DataFrame = {
    val rep = cellSplitDeep(spark, dir)
    rep.agg(
        min(when(col("n_hot") === 0L, col("round"))).as("conv"),
        max(when(col("round") === SplitDepth.toLong, col("n_hot")))
          .as("n_hot_final"),
        max(when(col("round") === SplitDepth.toLong, col("max_occ")))
          .as("max_occ_final"))
      .select(
        coalesce(col("conv"), lit(1000000000L)).as("chosen_depth"),
        col("conv").isNotNull.cast("int").as("converged"),
        col("n_hot_final"), col("max_occ_final"))
  }

  /** PLAN-DRIVEN split serve (sim_split_serve_planned) — closes the
    * measure → decide → APPLY loop on split depth (round-16 verdict
    * item 5: [[splitPlan]] chose a depth but nothing consumed the
    * choice): serve the index at exactly the depth the plan chose,
    * with a `depth_used` column so the decision is auditable in the
    * output. Fail-closed branches: sentinel (no depth within
    * [[SplitDepth]] de-hots every cell — the unsplittable-clump
    * fixture) serves the UNSPLIT index and WARN-logs rather than
    * pretending a depth suffices; converged-at-0 (nothing hot) also
    * serves unsplit. The chosen depth is read driver-side as a ONE-ROW
    * decision scalar (the CountMemo adaptive-knob precedent — plan
    * metadata, never data rows); arms mirror [[SplitDepth]] = 2
    * (depth 1 = [[splitTopK]], depth 2 = [[splitDeepTopK]]) and the
    * oracle composes [[splitPlanOracleSql]]'s chooser with the SAME
    * serve chains, each arm filtered by the chosen depth — measure,
    * decision, and serve move in lockstep. */
  def splitServePlanned(spark: SparkSession, dir: String): DataFrame = {
    val p = splitPlan(spark, dir).collect().head
    val chosen = p.getLong(0)
    // context columns are diagnostics only — never let a NULL final
    // snapshot turn the fail-closed WARN into an NPE (ADVICE r17)
    def ctx(i: Int): String = if (p.isNullAt(i)) "?" else p.getLong(i).toString
    val depthUsed =
      if (chosen == 1000000000L) {
        org.slf4j.LoggerFactory.getLogger("graft.Similarity").warn(
          s"split plan failed closed at $dir (n_hot_final=${ctx(2)}, " +
          s"max_occ_final=${ctx(3)}): serving the UNSPLIT index — " +
          "raise SplitDepth or SplitOccupancy deliberately")
        0L
      } else chosen
    val served = depthUsed match {
      case 0L => ivfTopK(spark, dir)
      case 1L => splitTopK(spark, dir)
      case d  => splitDeepTopK(spark, dir, d.toInt)
    }
    served.select(col("a_id"), col("b_id"), col("rn"), col("sim"),
      lit(depthUsed).as("depth_used"))
  }

  /** Split MODEL for the hot cells — (cell, sv, snrm, tau): sv = the
    * lowest member vec_id's embedding (the deterministic seed
    * direction), τ = the cell's lower-median member cosine to it —
    * exact positional SELECTION of a stored 6-dp value (rank
    * (n+1) div 2 under (s0sim desc, vec_id asc); never interpolation —
    * the agg_median cross-engine rule), so `s0sim ≥ τ` cuts the cell
    * in half by construction and routes probes identically. */
  private def splitSeeds(spark: SparkSession, dir: String,
                         members: DataFrame, hot: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = embWithNrm(spark, dir)
    val m = members.join(hot, Seq("cell"))
    val s0 = m.groupBy("cell").agg(min("vec_id").as("svid0"))
      .join(emb.select(col("vec_id").as("svid0"), col("embedding").as("sv"),
                       col("nrm").as("snrm")), Seq("svid0"))
    val sims = m.join(broadcast(s0), Seq("cell"))
      .select(col("cell"), col("vec_id"),
        Num.rnd(dotCols(col("embedding"), col("sv")) /
                  (col("nrm") * col("snrm")), 6).as("s0sim"))
    val w = Window.partitionBy("cell")
      .orderBy(col("s0sim").desc, col("vec_id").asc)
    val wc = Window.partitionBy("cell")
    val tau = sims
      .withColumn("srn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wc))
      .filter(col("srn") === expr("(n + 1) div 2"))
      .select(col("cell"), col("s0sim").as("tau"))
    s0.join(tau, Seq("cell")).select("cell", "sv", "snrm", "tau")
  }

  /** Per-cell LABEL PURITY over the IVF home-cell partition — the
    * cluster-quality eval (how homogeneous is each coarse cell?) that
    * grades a quantizer beyond recall: for every home cell, the
    * majority label, member count, and integer purity percentage
    * (100·majority div n — nonneg, `//` ≡ div). Composes the memoized
    * [[ivfAssignRanked]] home assignment with the embeddings' label
    * column; output is |cells| rows at any corpus scale. Ties on the
    * majority break label-ascending on both engines. */
  def cellPurity(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val home = ivfAssignRanked(spark, dir).filter(col("rn") === 1)
      .select("vec_id", "cell")
    val emb = Tables.embeddings(spark, dir).select("vec_id", "label")
    val pc = home.join(emb, Seq("vec_id"))
      .groupBy("cell", "label").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("cell").orderBy(col("c").desc, col("label").asc)
    val wc = Window.partitionBy("cell")
    pc.withColumn("rn2", row_number().over(w))
      .withColumn("n", sum("c").over(wc))
      .filter(col("rn2") === 1)
      .select(col("cell"), col("label").as("major_label"),
              col("n").as("n_vecs"), col("c").as("n_major"),
              expr("(100 * c) div n").as("purity_pct"))
  }

  /** Simplified SILHOUETTE over the IVF home-cell partition — the
    * geometry-based cluster-quality eval completing the family
    * ([[cellPurity]] grades by labels, graph_cell_modularity by edge
    * structure): per vector, a = cosine distance to its HOME centroid
    * (1 − csim₁), b = distance to the RUNNER-UP centroid (1 − csim₂),
    * s = (b − a)/max(a,b) — the centroid-based simplification
    * (Hruschka et al.) that replaces silhouette's O(n²) pairwise means
    * with the already-memoized n×cells ranking, the ONLY form that
    * survives 100 TB. Home = argmax csim ⇒ a ≤ b ⇒ max = b and
    * s = (csim₁ − csim₂)/(1 − csim₂) ∈ [0, 1] (near 1 = deep inside
    * its cell, near 0 = on a cell boundary — exactly the vectors
    * multi-probe exists for). Float discipline: csims are the memoized
    * 6-dp values, the one division is IEEE-exactly-rounded on identical
    * operands, micronized to integer out (no signed-zero rule needed);
    * c2 = 1 degenerate rows (/0: DuckDB NULL vs Spark ANSI error) are
    * gated identically on both sides. Consumes [[ivfAssignRanked]]'s
    * rn ≤ 2 rows as-is — zero new distance computation. */
  def silhouette(spark: SparkSession, dir: String): DataFrame = {
    val ranked = ivfAssignRanked(spark, dir)
    val c1 = ranked.filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("csim").as("c1"))
    val c2 = ranked.filter(col("rn") === 2)
      .select(col("vec_id"), col("csim").as("c2"))
    c1.join(c2, Seq("vec_id"))
      .filter(lit(1.0) - col("c2") > 0)
      .withColumn("s_micro",
        round((col("c1") - col("c2")) / (lit(1.0) - col("c2")) * lit(1e6))
          .cast("long"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"),
           sum("s_micro").as("sum_s"),
           min("s_micro").as("min_s_micro"))
      .withColumn("mean_s_micro", expr("sum_s div n_vecs"))
      .select("cell", "n_vecs", "mean_s_micro", "min_s_micro")
      .orderBy("cell")
  }

  /** Pairwise-similarity HISTOGRAM over the probe sample — the
    * threshold-tuning chart for the embedding family (the
    * dedup_threshold_curve analog in cosine space: where does the
    * corpus's similarity mass sit, and where is the near-dup knee?):
    * cosine of every (probe, corpus) pair for the standard 100-vector
    * probe sample (the eval-family literal), bucketed into ten 0.2-wide
    * bins over [−1, 1]. Probe-bounded LINEAR cost — 100·n codegen'd
    * dot products via [[graft.functions.ArrayDot]], never all-pairs;
    * the bin arithmetic runs on the 6-dp-rounded sim with binary-exact
    * constants (+1.0, ×5 — both IEEE-exact) so bucket edges are
    * engine-agnostic; empty bins still emit (left join + coalesce, the
    * threshold-curve convention). 10 rows out at any scale. */
  def simHist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
    val probes = emb.filter(col("vec_id") < 100)
      .select(col("vec_id").as("a_id"), col("embedding").as("va"),
              col("nrm").as("na"))
    val sims = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("a_id"))
      .select(Num.rnd(dotCols(col("embedding"), col("va")) /
                        (col("nrm") * col("na")), 6).as("sim"))
    val tot = sims.agg(count(lit(1)).as("n_pairs"))
    val counted = sims
      .withColumn("bucket",
        least(floor((col("sim") + lit(1.0)) * lit(5)).cast("int"), lit(9)))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    (0 until 10).toDF("bucket")
      .join(counted, Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bucket"), coalesce(col("n"), lit(0L)).as("n"),
              expr("(coalesce(n, 0) * 1000000) div n_pairs").as("share_micro"))
      .orderBy("bucket")
  }

  /** RANGE search — the second fundamental ANN operation next to top-k
    * (radius query: EVERY neighbor at cosine ≥ τ, however many): same
    * probed candidate stage as [[ivfTopK]], thresholded instead of
    * ranked — no window at all, so the per-query cost is pure candidate
    * generation and the output is unbounded-k (the shape semantic-dedup
    * confirmation and near-dup audits actually want; top-k truncates
    * dense neighborhoods). τ = 0.4 matches the dedup_embedding /
    * semantic-dedup threshold family; comparison happens on the 6-dp
    * ROUNDED sim, and the oracle casts the literal to DOUBLE (DuckDB
    * decimal-literal rule) so both engines compare identical doubles. */
  def rangeSearch(spark: SparkSession, dir: String): DataFrame =
    ivfCandidates(spark, dir)
      .filter(col("sim") >= 0.4)
      .select("a_id", "b_id", "sim")

  /** Mutual-kNN graph edges — keep only pairs where EACH endpoint ranks
    * the other in its top-3 ([[ivfTopK]]'s result joined to its own
    * reversal). Mutuality is the standard symmetrization for building
    * an embedding-neighborhood graph to cluster (SemDeDup-style
    * cluster-then-dedup, community detection): one-directional
    * neighbors are mostly hub artifacts. Input is the already-bounded
    * k·n top-k frame, so this adds one |topk|-row self-join on the pair
    * key — nothing rescans the embeddings. Cosine is symmetric (and
    * 6-dp-rounded identically on both orientations), so the surviving
    * (a<b) row's sim equals its mirror's.
    *
    * Materialized ONCE per (session, dir): the edge frame is ≤(k/2)·n
    * rows but its lineage is the whole IVF top-k chain (assign → bucket
    * join → window), and FOUR graph consumers each referenced it 2-4×
    * inside one plan — round 7 measured graph_label_prop at 17.4 s vs
    * 0.9 s for this frame itself, pure recompute. Eager-memoized like
    * graphedges (NOT in PlanShapeSpec's laziness allowlist; Bench
    * owner: sim_knn_mutual). */
  def knnMutual(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "knnmutual"), {
      val t = ivfTopK(spark, dir).select("a_id", "b_id", "sim")
      val rev = t.select(col("b_id").as("a_id"), col("a_id").as("b_id"))
      t.join(rev, Seq("a_id", "b_id"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), col("sim"))
        .localCheckpoint()
    })

  /** Mutual-kNN graph over the SPLIT index's serve
    * (sim_knn_mutual_split) — the pair-family consumer the split was
    * built for: a graph build's dominant cost at scale IS its serve's
    * in-cell candidate stage (the knee table, BASELINE rounds 15/16),
    * so serving the edge build from [[splitTopK]] inherits the
    * measured candidate halving. Same mutual rule as [[knnMutual]];
    * deliberately NOT a replacement for the `knnmutual` memo — the
    * graph_* family stays on the audited unsplit edges, and this is
    * the migration-path query that prices the split for graph builds
    * (its recall side is the frontier's `split` leg). Memo
    * "knnmutualsplit", owner sim_knn_mutual_split in Bench's list. */
  def knnMutualSplit(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "knnmutualsplit"), {
      // [[splitTopK]] is the memoized splitserve frame — already a
      // materialization barrier, so the mutual self-join reads it on
      // both sides instead of re-running the descent+candidate stages
      // twice (measured 531 vs 425 s task CPU at 768 k when the serve
      // was un-memoized and un-barriered, BASELINE round 16)
      val t = splitTopK(spark, dir).select("a_id", "b_id", "sim")
      val rev = t.select(col("b_id").as("a_id"), col("a_id").as("b_id"))
      t.join(rev, Seq("a_id", "b_id"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), col("sim"))
        .localCheckpoint()
    })

  /** One NN-DESCENT refinement round (Dong et al., "Efficient K-Nearest
    * Neighbor Graph Construction for Generic Similarity Measures",
    * WWW 2011) — the missing ANN-graph-CONSTRUCTION shape: a neighbor
    * of my neighbor is likely my neighbor, so the round (a) generates
    * wedge candidates a–b through a shared MUTUAL neighbor v, (b)
    * scores only the new pairs with exact cosine, and (c) re-selects
    * top-3 per node from current ∪ wedge candidates. Bounded by
    * construction: the mutual graph has degree ≤ 3, so adjacency is
    * ≤ 3·|V| rows and wedge volume ≤ k²·|V| at any corpus size — never
    * all-pairs, and the exact-cosine spend is proportional to the
    * wedge count, not the corpus. Candidates are a SUPERSET of the
    * current top-k, so per-rank sim can only improve (NnDescentSpec
    * pins monotonicity; [[nnDescentEval]] puts a recall number on it).
    * Plan: one self-join of the memoized [[knnMutual]] adjacency on
    * the shared node, distinct() so multi-wedge pairs score once, two
    * embedding joins for the new cosines, union with [[ivfTopK]], one
    * ranking window. */
  def nnDescent(spark: SparkSession, dir: String): DataFrame =
    // memoized serve frame ("nndserve", owner sim_nn_descent in Bench's
    // list): the wedge-scored refinement is re-read by its eval and the
    // frontier's nn_descent leg — before round 19 each re-ran the wedge
    // join + re-rank (3 builds per bench)
    CkptMemo.getOrElseUpdate((spark, dir, "nndserve"),
      nnDescentBuild(spark, dir).localCheckpoint())

  private def nnDescentBuild(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mu = knnMutual(spark, dir)
    val adj = mu.select(col("a_id").as("v"), col("b_id").as("n"))
      .unionByName(mu.select(col("b_id").as("v"), col("a_id").as("n")))
    val wedge = adj.select(col("v"), col("n").as("a_id"))
      .join(adj.select(col("v"), col("n").as("b_id")), Seq("v"))
      .filter(col("a_id") =!= col("b_id"))
      .select("a_id", "b_id").distinct()
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
    val scored = wedge
      .join(emb.select(col("vec_id").as("a_id"), col("embedding").as("av"),
                       col("nrm").as("an")), Seq("a_id"))
      .join(emb.select(col("vec_id").as("b_id"), col("embedding").as("bv"),
                       col("nrm").as("bn")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
              Num.rnd(dotCols(col("av"), col("bv")) /
                        (col("an") * col("bn")), 6).as("sim"))
    serveTop3(ivfTopK(spark, dir).select("a_id", "b_id", "sim")
      .unionByName(scored).distinct())
      .select("a_id", "b_id", "rn", "sim")
  }

  /** The eval family's shared EXACT ground truth — per probe (vec_id <
    * probeN), the exact 6-dp-cosine top-3 over the FULL corpus, self
    * excluded, ties by b_id: one broadcast of the probe table against a
    * single streamed corpus pass. All eight recall legs and the sweep
    * measure against this same definition, and before round 13 each
    * rebuilt it independently — sim_eval_frontier paid the 100-probe ×
    * corpus product ~8× (VERDICT r12). Memoized per (session, dir,
    * probeN) via [[CkptMemo]] (key "simtruth", owner in Bench's list:
    * sim_eval_frontier); eager localCheckpoint at construction, the
    * Dedup-pair-frame pattern. Legs whose APPROX side differs (int8,
    * jl, matryoshka, rrf, sign, graph, nn_descent) share only this
    * truth frame — their screens stay their own. probeN is part of the
    * key because specs probe at 10 (the eval-family default is 100). */
  /** The memo holds the RANKED top-[[TruthDepth]] (with rn) so
    * [[recallAtK]]'s k-sweep and the legs' top-3 slice share ONE
    * probe × corpus pass; a top-3 slice of the deeper ranking is
    * identical to ranking-then-cutting at 3 (same window order). */
  private val TruthDepth = 10

  private[ext] def exactTruthRanked(spark: SparkSession, dir: String,
                                    probeN: Long): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "simtruth", probeN, probeHeldOut), {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"),
                sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
      val q = emb.filter(probeSample(spark, dir, probeN, col("vec_id")))
        .select(col("vec_id").as("a_id"), col("embedding").as("qv"),
                col("nrm").as("qnrm"))
      val w = Window.partitionBy("a_id")
        .orderBy(col("sim").desc, col("b_id").asc)
      fanOut(emb).crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("a_id"))
        .select(col("a_id"), col("vec_id").as("b_id"),
                Num.rnd(dotCols(col("embedding"), col("qv")) /
                          (col("nrm") * col("qnrm")), 6).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= TruthDepth)
        .select("a_id", "b_id", "rn")
        .localCheckpoint()
    })

  private[ext] def exactTruthTop3(spark: SparkSession, dir: String,
                                  probeN: Long): DataFrame =
    exactTruthRanked(spark, dir, probeN)
      .filter(col("rn") <= 3).select("a_id", "b_id")

  /** Recall gain of the [[nnDescent]] round vs the [[ivfTopK]] baseline
    * it refines — same fixed probe sample and exact ground truth as
    * [[ivfRecallEval]], two screens side by side. The refinement is
    * cheap (wedge-bounded), so this row is the evidence it pays for
    * itself: recall_ref_micro ≥ recall_base_micro by the superset
    * property, and strictly greater whenever a true neighbor is
    * reachable through a mutual wedge but missed by the probed cells. */
  def nnDescentEval(spark: SparkSession, dir: String,
                    probeN: Long = 100): DataFrame = {
    val exact = exactTruthTop3(spark, dir, probeN)
    val base = ivfTopK(spark, dir).filter(probeSample(spark, dir, probeN, col("a_id")))
      .select("a_id", "b_id")
    val ref = nnDescent(spark, dir).filter(probeSample(spark, dir, probeN, col("a_id")))
      .select("a_id", "b_id")
    exact.agg(count(lit(1)).as("n_truth"))
      .crossJoin(exact.join(base, Seq("a_id", "b_id"))
        .agg(count(lit(1)).as("n_hit_base")))
      .crossJoin(exact.join(ref, Seq("a_id", "b_id"))
        .agg(count(lit(1)).as("n_hit_ref")))
      .select(col("n_truth"), col("n_hit_base"), col("n_hit_ref"),
        expr("CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
          "ELSE (n_hit_base * CAST(1000000 AS BIGINT)) div n_truth END")
          .as("recall_base_micro"),
        expr("CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
          "ELSE (n_hit_ref * CAST(1000000 AS BIGINT)) div n_truth END")
          .as("recall_ref_micro"))
  }

  /** ANN recall EVAL HARNESS — the [[Dedup.minhashEval]] counterpart
    * for the vector index: on a FIXED-SIZE probe sample (vec_id <
    * 100 — constant query-side cost at any corpus scale, the recurring
    * index-health check a production ANN service runs), compute (a)
    * ground truth = exact cosine top-3 per probe query against the FULL
    * corpus (one broadcast of the 100-row probe table against a single
    * streamed pass over the embeddings — the brute-force cost is paid
    * for 100 queries, never n), and (b) the production [[ivfTopK]]
    * answer for the same queries, then report recall/precision in
    * integer micro-units. nprobe=2 over 16 seed cells MUST lose some
    * true neighbors (the IVF recall cliff the [[NProbe]] docstring
    * describes) — the harness exists to put a number on that loss
    * instead of trusting it, and to catch regressions when cell count,
    * nprobe, or the bucket cap change. Tie-breaks ride the 6-dp-rounded
    * sim + vec_id order, so both engines rank identically. */
  def ivfRecallEval(spark: SparkSession, dir: String,
                    probeN: Long = 100): DataFrame = {
    val exact = exactTruthTop3(spark, dir, probeN)
    val screen = ivfTopK(spark, dir)
      .filter(probeSample(spark, dir, probeN, col("a_id")))
      .select("a_id", "b_id")
    val hit = exact.join(screen, Seq("a_id", "b_id"))
    exact.agg(count(lit(1)).as("n_truth"))
      .crossJoin(screen.agg(count(lit(1)).as("n_screen")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_truth"), col("n_screen"), col("n_hit"),
        expr("CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
          "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_truth END")
          .as("recall_micro"),
        expr("CASE WHEN n_screen = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_screen END")
          .as("precision_micro"))
  }

  /** Recall@k CURVE — the other axis of the [[nprobeSweep]] tuning
    * table: at fixed nprobe, how does the index degrade as the caller
    * asks for MORE neighbors (k ∈ {1, 3, 5, 10})? Truth-k and screen-k
    * are both prefix slices of one ranking each (the memoized
    * [[exactTruthRanked]] frame and one window over the candidate
    * stage), swept relationally against a 4-row broadcast grid — no
    * per-k recomputation. The k=3 row reproduces [[ivfRecallEval]]
    * EXACTLY (RecallAtKSpec pins it), and hits are monotone
    * non-decreasing in k by the prefix-superset property. k ≤
    * [[TruthDepth]] by construction. */
  def recallAtK(spark: SparkSession, dir: String,
                probeN: Long = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val ks = Seq(1, 3, 5, 10).toDF("k")
    val ranked = exactTruthRanked(spark, dir, probeN)
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
    val scr = ivfCandidates(spark, dir).filter(probeSample(spark, dir, probeN, col("a_id")))
      .withColumn("srn", row_number().over(w))
      .select("a_id", "b_id", "srn")
    val tr = ranked.crossJoin(broadcast(ks)).filter(col("rn") <= col("k"))
      .select("k", "a_id", "b_id")
    val sc = scr.crossJoin(broadcast(ks)).filter(col("srn") <= col("k"))
      .select("k", "a_id", "b_id")
    val nt = tr.groupBy("k").agg(count(lit(1)).as("n_truth"))
    val ns = sc.groupBy("k").agg(count(lit(1)).as("n_screen"))
    val nh = tr.join(sc, Seq("k", "a_id", "b_id"))
      .groupBy("k").agg(count(lit(1)).as("n_hit"))
    nt.join(ns, Seq("k")).join(nh, Seq("k"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .select(col("k"), col("n_truth"), col("n_screen"), col("n_hit"),
        expr("CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
             "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_truth END")
          .as("recall_micro"),
        expr("CASE WHEN n_screen = 0 THEN CAST(0 AS BIGINT) " +
             "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_screen END")
          .as("precision_micro"))
      .orderBy("k")
  }

  /** Mean reciprocal rank of the TRUE nearest neighbor in the served
    * top-3 (sim_mrr_eval) — the retrieval metric the recall family
    * doesn't give: recall counts hits anywhere in the cut, MRR weights
    * WHERE the index puts the one answer that matters most (the exact
    * NN). Truth = rank 1 of the SHARED [[exactTruthRanked]] memo; this
    * is a shared-truth eval but deliberately NOT a frontier leg — its
    * row is rank-weighted (n_probes/n_found/rr_sum/mrr_micro), not the
    * n_truth/n_hit/recall shape the frontier compares cell-for-cell.
    * Screen = the production [[ivfTopK]] serving cut (rn ≤ 3). Per
    * probe RR = 1e6 div rank when the NN is served, else 0;
    * MRR = Σ RR div n_probes — all quantities non-negative so
    * div ≡ `//`. Probe cost fixed at 100 queries at any corpus scale;
    * MrrSpec ties the row to a driver-side recompute and its bounds. */
  def mrrEval(spark: SparkSession, dir: String,
              probeN: Long = 100): DataFrame = {
    val truth1 = exactTruthRanked(spark, dir, probeN)
      .filter(col("rn") === 1).select("a_id", "b_id")
    val screen = ivfTopK(spark, dir)
      .filter(probeSample(spark, dir, probeN, col("a_id")))
      .select(col("a_id"), col("b_id"), col("rn"))
    truth1.join(screen, Seq("a_id", "b_id"), "left")
      .agg(count(lit(1)).as("n_probes"),
           sum(when(col("rn").isNotNull, 1L).otherwise(0L)).as("n_found"),
           sum(when(col("rn").isNotNull,
                    expr("CAST(1000000 AS BIGINT) div rn"))
                 .otherwise(0L)).as("rr_sum"))
      .select(col("n_probes"), col("n_found"), col("rr_sum"),
              expr("rr_sum div n_probes").as("mrr_micro"))
  }

  /** Index TAKEDOWN search — the governance operation every serving
    * index needs (right-to-be-forgotten / licensing removal): 10% of
    * the corpus (vec_id % 10 = 0) is deleted, and search runs over the
    * SURVIVING index without retraining. Centroids are POSITIONS, not
    * members — they survive a member takedown — and per-vector cell
    * assignment is independent, so filtering the live set into the
    * same memoized-assignment candidate stage (re-capping on the
    * remaining members) is EXACTLY a from-scratch index over the
    * remaining corpus; the oracle rebuilds from scratch and the hash
    * equality is the proof, plus the structural guarantee that no
    * deleted id can appear in any result. Probe side = the eval-family
    * fixed sample ∩ live. */
  def ivfDeleteSearch(spark: SparkSession, dir: String,
                      probeN: Long = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = ivfAssignRanked(spark, dir)
    val emb = Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 10 =!= 0)
      .select(col("vec_id"), col("embedding"),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
    val probes = emb.filter(probeSample(spark, dir, probeN, col("vec_id")))
      .join(ranked.select("vec_id", "cell"), Seq("vec_id"))
    val indexed = emb.join(ranked.filter(col("rn") === 1)
                             .select("vec_id", "cell"), Seq("vec_id"))
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
    pairCandidatesAB(probes, indexed, "cell", MaxBucketCandidates)
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("a_id"), col("b_id"), col("sim"),
              col("rn").cast("int").as("rn"))
  }

  /** FILTERED vector search — the metadata-predicate ANN every vector
    * store ships (return neighbors satisfying a filter, here: candidate
    * label must equal the probe's OWN label — a per-probe predicate,
    * the hard shape; a global predicate would just pre-filter the
    * index). PRE-filter semantics by construction: the bucket key is
    * the COMPOSITE (cell, label) — the equality predicate becomes part
    * of the join key, so only matching candidates are ever generated
    * and the bucket cap re-applies per (cell, label) slice, exactly an
    * index built per label partition (the [[ivfDeleteSearch]]
    * filter-before-cap rebuild rule; post-filtering a capped top-k
    * would silently lose recall when the filter is selective). A probe
    * whose probed cells hold no same-label member returns no rows —
    * the honest filtered-search contract. */
  def filteredTopK(spark: SparkSession, dir: String,
                   probeN: Long = 100): DataFrame =
    // memoized serve ("fltopk", owner sim_filtered_topk in Bench's
    // list — pinned: sim_filtered_recall sorts before it and would
    // steal the build): the recall eval re-ran the identical
    // (cell, label)-bucketed serve (round 20); keyed (probeN, heldout)
    CkptMemo.getOrElseUpdate((spark, dir, "fltopk", probeN, probeHeldOut),
      filteredTopKFor(spark, dir,
        Tables.embeddings(spark, dir)
          .filter(probeSample(spark, dir, probeN, col("vec_id")))
          .select("vec_id", "embedding", "label")).localCheckpoint())

  /** The filtered-search composition over a GIVEN probe frame (vec_id,
    * embedding, label) — the seam [[filteredTopK]] (fixed batch probe
    * sample) and [[graft.streaming.VecStream]] (arriving probe
    * micro-batches) share, so the online and offline serve paths can
    * never diverge. Per-probe ranking is complete within one call
    * because the index side is the full static corpus. */
  private[graft] def filteredTopKFor(spark: SparkSession, dir: String,
                                     probeVecs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = ivfAssignRanked(spark, dir)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
    val probes = probeVecs
      .select(col("vec_id"), col("embedding"), col("label"),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
      .join(ranked.select("vec_id", "cell"), Seq("vec_id"))
      .withColumn("ck", concat_ws("#", col("cell"), col("label")))
    val indexed = emb.join(ranked.filter(col("rn") === 1)
                             .select("vec_id", "cell"), Seq("vec_id"))
      .withColumn("ck", concat_ws("#", col("cell"), col("label")))
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
    pairCandidatesAB(probes, indexed, "ck", MaxBucketCandidates)
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("a_id"), col("b_id"), col("sim"),
              col("rn").cast("int").as("rn"))
  }

  /** Recall eval for [[filteredTopK]] — truth = the exact SAME-LABEL
    * top-3 per probe (the filtered contract's own truth; a DIFFERENT
    * definition than the frontier's unfiltered truth, which is why
    * this deliberately is NOT a frontier leg — the frontier compares
    * methods under one truth). Same fixed-probe / micro-unit outputs
    * as [[ivfRecallEval]]; the number quantifies what the (cell,
    * label)-sliced index loses at cell boundaries when the predicate
    * thins each bucket. */
  def filteredRecallEval(spark: SparkSession, dir: String,
                         probeN: Long = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
    val q = emb.filter(probeSample(spark, dir, probeN, col("vec_id")))
      .select(col("vec_id").as("a_id"), col("embedding").as("qv"),
              col("label").as("qlabel"), col("nrm").as("qnrm"))
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
    val truth = fanOut(emb).crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("a_id") && col("label") === col("qlabel"))
      .select(col("a_id"), col("vec_id").as("b_id"),
              Num.rnd(dotCols(col("embedding"), col("qv")) /
                        (col("nrm") * col("qnrm")), 6).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("a_id", "b_id")
    val screen = filteredTopK(spark, dir, probeN).select("a_id", "b_id")
    val hit = truth.join(screen, Seq("a_id", "b_id"))
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(screen.agg(count(lit(1)).as("n_screen")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_truth"), col("n_screen"), col("n_hit"),
        expr("CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
          "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_truth END")
          .as("recall_micro"),
        expr("CASE WHEN n_screen = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_screen END")
          .as("precision_micro"))
  }

  /** nprobe SWEEP — the tuning table behind the [[NProbe]] doc's
    * "raise for recall, lower for cost" guidance: for nprobe ∈
    * {1, 2, 4}, candidate volume (the cost proxy — each probed cell
    * adds ~one in-cell join's work) and top-3 recall vs exact ground
    * truth, on the same fixed probe sample as [[ivfRecallEval]]
    * (vec_id < probeN — constant query-side cost at any corpus scale).
    * The probe side re-ranks only the 100 probe vectors against the
    * broadcast centroid table (NOT the memoized corpus-wide ranking,
    * which is capped at rn ≤ [[NProbe]] and must stay that way — the
    * production index pays for exactly nprobe ranks, the sweep pays 4
    * for 100 rows); the indexed side reuses the memoized home-cell
    * assignment and applies the same saltOrd bucket cap as
    * [[pairCandidatesAB]], so the nprobe=2 row reproduces
    * [[ivfRecallEval]]'s numbers exactly (NprobeSweepSpec pins it).
    * One candidates frame, three prn-filtered rankings — the per-k
    * screens share the join. */
  def nprobeSweep(spark: SparkSession, dir: String,
                  probeN: Long = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
    val cents = emb.filter(col("vec_id") < ivfCells(embCount(spark, dir)))
      .select(col("vec_id").as("cell"), col("embedding").as("cv"),
              col("nrm").as("cnrm"))
    val wp = Window.partitionBy("a_id").orderBy(col("csim").desc, col("cell").asc)
    val probeRanks = emb.filter(probeSample(spark, dir, probeN, col("vec_id")))
      .select(col("vec_id").as("a_id"), col("embedding").as("qv"),
              col("nrm").as("qnrm"))
      .crossJoin(broadcast(cents))
      .select(col("a_id"), col("qv"), col("qnrm"), col("cell"),
              Num.rnd(dotCols(col("qv"), col("cv")) /
                        (col("qnrm") * col("cnrm")), 6).as("csim"))
      .withColumn("prn", row_number().over(wp))
      .filter(col("prn") <= 4)
      .drop("csim")
    val wCap = Window.partitionBy("cell")
      .orderBy(saltOrd(col("vec_id")).asc, col("vec_id").asc)
    val capped = emb
      .join(ivfAssignRanked(spark, dir).filter(col("rn") === 1)
              .select("vec_id", "cell"), Seq("vec_id"))
      .withColumn("rnb", row_number().over(wCap))
      .filter(col("rnb") <= MaxBucketCandidates)
    val cand = probeRanks.join(capped, Seq("cell"))
      .filter(col("vec_id") =!= col("a_id"))
      .select(col("a_id"), col("vec_id").as("b_id"), col("prn"),
              Num.rnd(dotCols(col("qv"), col("embedding")) /
                        (col("qnrm") * col("nrm")), 6).as("sim"))
    val wr = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
    // memoized truth (already a checkpoint); the k-loop below takes ~6
    // actions over the candidate frame — checkpoint it once too, the
    // bandSweepOf pattern, so every branch reuses one materialization
    val exact = exactTruthTop3(spark, dir, probeN)
    val candCk = cand.localCheckpoint()
    Seq(1, 2, 4).map { k =>
      val ck = candCk.filter(col("prn") <= k)
      val scr = ck.withColumn("rn", row_number().over(wr))
        .filter(col("rn") <= 3).select("a_id", "b_id")
      exact.agg(count(lit(1)).as("n_truth"))
        .crossJoin(ck.agg(count(lit(1)).as("n_cand")))
        .crossJoin(scr.agg(count(lit(1)).as("n_screen")))
        .crossJoin(exact.join(scr, Seq("a_id", "b_id"))
                     .agg(count(lit(1)).as("n_hit")))
        .select(lit(k).as("nprobe"), col("n_cand"), col("n_truth"),
                col("n_screen"), col("n_hit"),
          expr("CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
               "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_truth END")
            .as("recall_micro"))
    }.reduce(_ unionByName _).orderBy("nprobe")
  }

  /** Candidate-efficiency literal for the [[nprobePlanned]] chooser: a
    * probe width k from the sweep grid qualifies iff its CUMULATIVE
    * extra hits over the k = 1 arm pay for its cumulative extra
    * candidates at this many candidates per hit —
    * (h_k − h_1) · C ≥ (c_k − c_1). k = 1 qualifies trivially (0 ≥ 0),
    * the fail-closed floor (the band planner's margin-0 rule): a corpus
    * whose extra probes buy nothing serves the cheapest width. 150, NOT
    * the band planner's per-hit 100: the sweep prices whole cumulative
    * arms, and at sf0.01 the marginal cost sits at ~127–130 candidates
    * per extra hit on BOTH steps (24 hits / 3124 cand at k = 2, 74 /
    * 9403 at k = 4) — 150 accepts that price with ~15 % margin (chosen
    * = 4 at sf0.01), where 100 would floor every arm. Mirrored
    * literally in the oracle chooser — lockstep with the {1, 2, 4}
    * sweep grid. */
  private[graft] val NprobePlanCandPerHit = 150L

  /** nprobe PLANNED (measure → decide → apply, the sim_split_band_planned
    * pattern closed over probe width): read the [[nprobeSweep]] rows,
    * choose the LARGEST grid width whose cumulative hits-per-candidate
    * efficiency vs the k = 1 arm beats 1/[[NprobePlanCandPerHit]]
    * (fail-closed floor k = 1), and serve the FULL corpus at the chosen
    * width with an `nprobe_used` read-out column (the
    * sim_split_serve_planned depth_used convention). The decision input
    * is a grid-sized driver collect (3 rows — the bookmark/plan-scalar
    * metadata precedent, never data rows). The oracle composes the
    * SHARED sweep chain + the same rule + one serve arm per grid width
    * from [[ivfChainCtesFor]], filtered by the choice — measure,
    * decision and serve read one chain on both engines. */
  def nprobePlanned(spark: SparkSession, dir: String,
                    probeN: Long = 100): DataFrame = {
    val byK = nprobeSweep(spark, dir, probeN)
      .select(col("nprobe"), col("n_cand"), col("n_hit")).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
    val chosen = chooseNprobe(byK)
    serveAtNprobe(spark, dir, chosen)
      .withColumn("nprobe_used", lit(chosen))
  }

  /** The pure chooser over sweep rows (width → (n_cand, n_hit)) —
    * extracted so the decision logic is unit-testable on synthetic
    * rows (NprobePlannedSpec drives the fail-closed floor and the
    * all-free widest case); the oracle's npch CTE mirrors it. Note
    * extra probed cells that turn out EMPTY make a wider arm free
    * (Δcand = 0 ⇒ it qualifies at zero extra hits) — taking it is the
    * correct reading, not a floor miss. */
  private[graft] def chooseNprobe(byK: Map[Int, (Long, Long)]): Int = {
    val (c1, h1) = byK(1)
    byK.keysIterator.filter { k =>
      val (ck, hk) = byK(k)
      (hk - h1) * NprobePlanCandPerHit >= (ck - c1)
    }.max
  }

  /** The full-corpus IVF serve at an explicit probe width — the
    * chosen-arm executor behind [[nprobePlanned]]. k ≤ [[NProbe]]
    * SLICES the production ranking memo (rank prefixes of a bounded
    * top-k are exactly the narrower top-k); k > NProbe re-ranks at
    * query time via [[rankedAtNprobe]]. The indexed side (home cells +
    * salted cap) is width-independent and always comes from the memo,
    * so k = NProbe reproduces [[ivfTopK]] row-for-row
    * (NprobePlannedSpec pins it). */
  private[graft] def serveAtNprobe(spark: SparkSession, dir: String,
                                 k: Int): DataFrame =
    if (k == NProbe)
      // the production width IS the production serve — one seam
      serveTop3(ivfCandidates(spark, dir)).select("a_id", "b_id", "rn", "sim")
    else {
      val ranked = ivfAssignRanked(spark, dir)
      val rankedK =
        if (k < NProbe) ranked.filter(col("rn") <= k)
        else rankedAtNprobe(spark, dir, k)
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"),
                sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
      val probes = emb.join(rankedK.select("vec_id", "cell"), Seq("vec_id"))
      val indexed = emb.join(ranked.filter(col("rn") === 1)
                               .select("vec_id", "cell"), Seq("vec_id"))
      serveTop3(pairCandidatesAB(probes, indexed, "cell", MaxBucketCandidates)
          .filter(col("a_id") =!= col("b_id")))
        .select("a_id", "b_id", "rn", "sim")
    }

  /** Int8-quantization recall eval — the third leg of the eval-harness
    * family ([[Dedup.minhashEval]] for the sketch, [[ivfRecallEval]]
    * for the index, this for the COMPRESSION): how much top-3 recall
    * does the [[quantize]] storage format cost? Serving shape is
    * asymmetric (ADC-style): the query stays full-precision float, the
    * corpus is DEQUANTIZED from its per-vector (mn, mx, int8 codes) —
    * exactly what a store that persists only codes can reconstruct.
    * Ground truth = exact float cosine top-3 on the same fixed probe
    * sample (vec_id < 100 — constant query-side cost at any corpus
    * scale). The dequantization expression mirrors [[quantize]]'s code
    * formula term for term (keep in lockstep); every arithmetic step is
    * IEEE exact-rounded double ops in fixed order, so both engines rank
    * identically. Both searches are one broadcast of the probe table
    * against one streamed corpus pass — brute-force cost is paid for
    * 100 queries, never n². */
  def int8RecallEval(spark: SparkSession, dir: String,
                     probeN: Long = 100): DataFrame =
    // memoized 1-row result ("int8recall", owner sim_eval_frontier —
    // the jlrecall rule, round 20)
    CkptMemo.getOrElseUpdate((spark, dir, "int8recall", probeN, probeHeldOut),
      int8RecallEvalUncached(spark, dir, probeN).localCheckpoint())

  private def int8RecallEvalUncached(spark: SparkSession, dir: String,
                                     probeN: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val st = base.select(col("vec_id"), col("embedding"),
      array_min(col("embedding")).cast("double").as("mn"),
      array_max(col("embedding")).cast("double").as("mx"))
    // code = least(255, floor((v-mn)/(mx-mn)*255))  — quantize's formula;
    // dequant = mn + code*(mx-mn)/255 (code cast back to double)
    val dqv = transform(col("embedding"), v =>
      when(col("mx") > col("mn"),
        col("mn") +
          least(lit(255L), floor((v.cast("double") - col("mn")) /
                                 (col("mx") - col("mn")) * 255)).cast("double") *
          (col("mx") - col("mn")) / lit(255.0))
        .otherwise(col("mn")))
    val dq = st.select(col("vec_id"), dqv.as("d"))
      .select(col("vec_id"), col("d"),
              sqrt(dotCols(col("d"), col("d"))).as("dnrm"))
    val q = base.filter(probeSample(spark, dir, probeN, col("vec_id")))
      .select(col("vec_id").as("a_id"), col("embedding").as("qv"),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("qnrm"))
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
    def top3(corpus: DataFrame, vec: Column, nrm: Column): DataFrame =
      fanOut(corpus).crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("a_id"))
        .select(col("a_id"), col("vec_id").as("b_id"),
                Num.rnd(dotCols(vec, col("qv")) / (nrm * col("qnrm")), 6)
                  .as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("a_id", "b_id")
    val truth = exactTruthTop3(spark, dir, probeN)
    val approx = top3(dq, col("d"), col("dnrm"))
    val hit = truth.join(approx, Seq("a_id", "b_id"))
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_truth"), col("n_hit"),
        expr("CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
          "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_truth END")
          .as("recall_micro"))
  }

  // ---- sign-bit binary quantization (Hamming index) ----

  /** One packed 32-bit sign word: bit i of the word is set iff
    * `embedding[lo + i] >= 0` (raw sign — the corpus is zero-centered
    * per dimension, see [[dimStats]], so no centering pass is needed and
    * the oracle stays a pure per-row expression). Packing is a one-shot
    * 32-element fold per vector (not a hot loop — the HOT path,
    * Hamming scoring, runs on the packed BIGINTs via codegen'd
    * bit_count/xor, 2 machine ops per candidate). Float `>= 0` is exact
    * on both engines (IEEE: −0.0 >= 0.0 is true on both). */
  private def packWord(lo: Int): Column =
    expr(s"aggregate(transform(slice(embedding, ${lo + 1}, 32), " +
      "(v, i) -> IF(v >= CAST(0 AS DOUBLE), " +
      "shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))), " +
      "CAST(0 AS BIGINT), (a, b) -> a + b)")

  /** Sign-bit binary quantization — 64 dims → two BIGINT words (16 bytes
    * per vector, a 16× compression over float32): the cheapest of the
    * three storage tiers (sign < int8 [[quantize]] < PQ [[pqCodes]]).
    * At 100 TB the entire sign index for a billion vectors is ~16 GB —
    * it fits in executor memory where even int8 codes don't, and
    * Hamming distance over packed words is 2 xor+popcount ops, so a
    * full-corpus screen is memory-bandwidth-bound, never FLOP-bound.
    * `nbits` (the popcount) is the per-vector summary a monitoring
    * layer watches for degenerate all-positive/all-negative batches. */
  def signBits(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), packWord(0).as("w1"), packWord(32).as("w2"))
      .withColumn("nbits", expr("CAST(bit_count(w1) + bit_count(w2) AS INT)"))

  /** Packed words + probe split shared by [[hammingTopK]] and
    * [[signRecallEval]] — the Spark analog of [[signCteSql]] (keep in
    * lockstep). */
  private def signShortlist(spark: SparkSession, dir: String,
                            probeN: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pk = signBits(spark, dir).select("vec_id", "w1", "w2")
    val pr = pk.filter(probeSample(spark, dir, probeN, col("vec_id")))
      .select(col("vec_id").as("a_id"), col("w1").as("q1"), col("w2").as("q2"))
    val wH = Window.partitionBy("a_id").orderBy(col("hd").asc, col("b_id").asc)
    fanOut(pk).crossJoin(broadcast(pr))
      .filter(col("vec_id") =!= col("a_id"))
      .select(col("a_id"), col("vec_id").as("b_id"),
        expr("CAST(bit_count(w1 ^ q1) + bit_count(w2 ^ q2) AS INT)").as("hd"))
      .withColumn("rh", row_number().over(wH))
      .filter(col("rh") <= SignShortlist)
      .select("a_id", "b_id", "hd")
  }

  /** Hamming shortlist width before the exact re-rank — mirrored as a
    * literal in [[signCteSql]] (keep in lockstep). */
  private val SignShortlist = 8

  /** Hamming top-k with exact re-rank — the serving path of the sign
    * index: screen the corpus by Hamming distance on the packed words
    * (top-[[SignShortlist]] per probe, ties by b_id), then re-rank the
    * shortlist by exact float cosine and keep top-3. Identical
    * shortlist-then-exact shape as [[pqRerankTopK]]: the float vectors
    * are touched for only |probes|·shortlist rows, never the full
    * corpus product. Probe set is the fixed vec_id < 100 slice (same
    * eval-harness contract as [[int8RecallEval]]). */
  def hammingTopK(spark: SparkSession, dir: String,
                  probeN: Long = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val short = signShortlist(spark, dir, probeN)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
    val q = emb.filter(probeSample(spark, dir, probeN, col("vec_id")))
      .select(col("vec_id").as("a_id"), col("embedding").as("qv"),
              col("nrm").as("qnrm"))
    val wS = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
    short
      .join(emb.select(col("vec_id").as("b_id"), col("embedding").as("bv"),
                       col("nrm").as("bnrm")), Seq("b_id"))
      .join(broadcast(q), Seq("a_id"))
      .select(col("a_id"), col("b_id"), col("hd"),
        Num.rnd(dotCols(col("bv"), col("qv")) / (col("bnrm") * col("qnrm")), 6)
          .as("sim"))
      .withColumn("rn", row_number().over(wS))
      .filter(col("rn") <= 3)
      .select("a_id", "b_id", "rn", "hd", "sim")
  }

  /** Sign-screen recall eval — the fourth leg of the eval-harness family
    * ([[Dedup.minhashEval]] sketch, [[ivfRecallEval]] index,
    * [[int8RecallEval]] compression, this for the BINARY tier): does the
    * [[SignShortlist]]-wide Hamming screen retain the exact cosine top-3?
    * Same fixed-probe contract (vec_id < 100) and the same
    * recall/precision micro-unit outputs as [[ivfRecallEval]] — pure
    * integer division, exactly reproducible. */
  def signRecallEval(spark: SparkSession, dir: String,
                     probeN: Long = 100): DataFrame =
    // memoized 1-row result ("signrecall", owner sim_eval_frontier —
    // the jlrecall rule, round 20)
    CkptMemo.getOrElseUpdate((spark, dir, "signrecall", probeN, probeHeldOut),
      signRecallEvalUncached(spark, dir, probeN).localCheckpoint())

  private def signRecallEvalUncached(spark: SparkSession, dir: String,
                                     probeN: Long): DataFrame = {
    val truth = exactTruthTop3(spark, dir, probeN)
    val screen = signShortlist(spark, dir, probeN).select("a_id", "b_id")
    val hit = truth.join(screen, Seq("a_id", "b_id"))
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(screen.agg(count(lit(1)).as("n_screen")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_truth"), col("n_screen"), col("n_hit"),
        expr("CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
          "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_truth END")
          .as("recall_micro"),
        expr("CASE WHEN n_screen = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_screen END")
          .as("precision_micro"))
  }

  // ---- reciprocal-rank fusion of two retrieval tiers ----

  /** Per-leg candidate depth and the standard RRF smoothing constant
    * (K = 60, Cormack/Clarke/Buettcher 2009) — both mirrored as
    * literals in the oracle chain (lockstep). Depth is DEFINED as
    * [[SignShortlist]] (not an independent 8) so the two fused legs
    * contribute symmetric list lengths by construction — changing the
    * sign shortlist width moves the RRF depth with it, keeping the
    * documented symmetry contract enforced rather than coincidental. */
  private val RrfDepth = SignShortlist
  private val RrfK = 60

  /** Reciprocal-rank FUSION of the two cheap retrieval tiers the index
    * already serves — the standard hybrid-retrieval shape (fuse a
    * lexical/coarse ranking with a semantic one by rank, never by
    * score, because the legs' score scales are incomparable): per
    * probe, leg A = the IVF multi-probe ranking (top-[[RrfDepth]] by
    * 6-dp cosine), leg B = the sign-bit Hamming shortlist ranking
    * (top-[[SignShortlist]] by hd), fused by
    * score = Σ_legs 1e6 div ([[RrfK]] + rank) — EXACT integer
    * arithmetic (nonneg ⇒ div ≡ //), so both engines fuse
    * bit-identically; a candidate missing from one leg simply
    * contributes 0 (the FULL OUTER join). Final rank under
    * (score desc, b_id asc), top-3 out. Cost: two already-bounded
    * shortlists per probe — |probes|·8 rows each — one outer join on
    * (a_id, b_id), no new corpus scan; at 100 TB the fusion stage is
    * query-side-only work. */
  def rrfFusion(spark: SparkSession, dir: String,
                probeN: Long = 100): DataFrame =
    // memoized serve frame ("rrfserve", owner sim_rrf_fusion in Bench's
    // list; probeN + held-out mode in the key): the fused top-3 is
    // re-read by sim_rrf_recall and the frontier's rrf leg
    CkptMemo.getOrElseUpdate((spark, dir, "rrfserve", probeN, probeHeldOut),
      rrfFusionBuild(spark, dir, probeN).localCheckpoint())

  private def rrfFusionBuild(spark: SparkSession, dir: String,
                             probeN: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wa = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
    val legA = ivfCandidates(spark, dir)
      .filter(probeSample(spark, dir, probeN, col("a_id")))
      .withColumn("ra", row_number().over(wa))
      .filter(col("ra") <= RrfDepth)
      .select("a_id", "b_id", "ra")
    val wb = Window.partitionBy("a_id").orderBy(col("hd").asc, col("b_id").asc)
    val legB = signShortlist(spark, dir, probeN)
      .withColumn("rb", row_number().over(wb))
      .select("a_id", "b_id", "rb")
    val wf = Window.partitionBy("a_id")
      .orderBy(col("rrf_micro").desc, col("b_id").asc)
    legA.join(legB, Seq("a_id", "b_id"), "full_outer")
      .withColumn("rrf_micro",
        expr(s"coalesce(CAST(1000000 AS BIGINT) div ($RrfK + ra), " +
             "CAST(0 AS BIGINT)) + " +
             s"coalesce(CAST(1000000 AS BIGINT) div ($RrfK + rb), " +
             "CAST(0 AS BIGINT))"))
      .withColumn("rn", row_number().over(wf))
      .filter(col("rn") <= 3)
      .select(col("a_id"), col("b_id"), col("rrf_micro"),
              col("rn").cast("int").as("rn"))
  }

  /** RRF recall eval — does rank fusion of the IVF and sign tiers beat
    * either alone? Same fixed-probe/truth contract and micro-unit
    * outputs as [[ivfRecallEval]]/[[signRecallEval]]; the eighth
    * frontier leg. The fused top-3 can only draw from the union of
    * the two legs' shortlists, so its recall is bounded by the union's
    * — the measured number tells whether rank agreement (a candidate
    * surfacing in BOTH cheap tiers) is a better top-3 signal than
    * either tier's own score. */
  def rrfRecallEval(spark: SparkSession, dir: String,
                    probeN: Long = 100): DataFrame = {
    val truth = exactTruthTop3(spark, dir, probeN)
    val screen = rrfFusion(spark, dir, probeN).select("a_id", "b_id")
    val hit = truth.join(screen, Seq("a_id", "b_id"))
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(screen.agg(count(lit(1)).as("n_screen")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_truth"), col("n_screen"), col("n_hit"),
        expr("CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
          "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_truth END")
          .as("recall_micro"),
        expr("CASE WHEN n_screen = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_screen END")
          .as("precision_micro"))
  }

  // ---- greedy graph search over the mutual-kNN graph (HNSW layer-0) ----

  /** Beam width and expansion rounds for [[graphSearch]] — mirrored as
    * literals in the oracle chain (lockstep). */
  private val GraphBeam = 4
  private val GraphSearchRounds = 2

  /** Greedy beam search over the mutual-kNN graph — the SERVING shape
    * of graph-based ANN, as a two-tier cascade (the production
    * architecture: a cheap coarse screen picks ENTRY vertices, the
    * graph walk refines): per probe the beam seeds with the sign-bit
    * Hamming top-[[GraphBeam]] (16 bytes/vector, xor+popcount — the
    * [[signShortlist]] tier), then each of 2 rounds expands the beam
    * by its mutual-kNN neighbors, scores candidates by exact cosine,
    * and keeps the best [[GraphBeam]] under (sim desc, b_id asc). A
    * single fixed entry was measured at 1% recall on this corpus —
    * the mutual-top-3 graph is component-fragmented and a walk cannot
    * cross components, which is WHY real graph indexes pair the walk
    * with a coarse entry picker. Per round the candidate volume is
    * ≤ |probes|·B·(deg+1) — degree-bounded, so float vectors are
    * touched for a few dozen rows per probe, never the corpus
    * product; the walk rides the SAME memoized graph every graph_*
    * query uses (owner sim_knn_mutual). Output: final beam's top-3. */
  def graphSearch(spark: SparkSession, dir: String,
                  probeN: Long = 100): DataFrame =
    // memoized serve frame ("gssearch", owner sim_graph_search in
    // Bench's list; probeN + held-out mode in the key, the simtruth
    // rule): the 2-round beam walk is re-read by its eval and the
    // frontier's graph leg — before round 19 each re-ran the walk
    CkptMemo.getOrElseUpdate((spark, dir, "gssearch", probeN, probeHeldOut),
      graphSearchBuild(spark, dir, probeN).localCheckpoint())

  private def graphSearchBuild(spark: SparkSession, dir: String,
                               probeN: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mu = knnMutual(spark, dir).select("a_id", "b_id")
    val und = mu.select(col("a_id").as("u"), col("b_id").as("v"))
      .union(mu.select(col("b_id").as("u"), col("a_id").as("v")))
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
    val probes = emb.filter(probeSample(spark, dir, probeN, col("vec_id")))
      .select(col("vec_id").as("a_id"), col("embedding").as("qv"),
              col("nrm").as("qnrm"))
    val wE = Window.partitionBy("a_id").orderBy(col("hd").asc, col("b_id").asc)
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
    var beam: DataFrame = signShortlist(spark, dir, probeN)
      .withColumn("re", row_number().over(wE))
      .filter(col("re") <= GraphBeam)
      .select("a_id", "b_id")
    var scoredBeam: DataFrame = null
    for (_ <- 1 to GraphSearchRounds) {
      val cand = beam.select("a_id", "b_id")
        .union(beam.join(und, beam("b_id") === und("u"))
          .select(col("a_id"), col("v").as("b_id")))
        .distinct()
      scoredBeam = cand
        .join(emb.select(col("vec_id").as("b_id"), col("embedding").as("bv"),
                         col("nrm").as("bnrm")), Seq("b_id"))
        .join(broadcast(probes), Seq("a_id"))
        .filter(col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          Num.rnd(dotCols(col("bv"), col("qv")) / (col("bnrm") * col("qnrm")), 6)
            .as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= GraphBeam)
      beam = scoredBeam.select("a_id", "b_id")
    }
    scoredBeam.filter(col("rn") <= 3)
      .select(col("a_id"), col("b_id"), col("rn").cast("int").as("rn"),
              col("sim"))
  }

  /** Graph-search recall eval — the fifth leg of the eval-harness
    * family (sketch / index / compression / binary / GRAPH WALK): does
    * the Hamming-seeded 2-round beam walk retain the exact cosine
    * top-3? Same fixed-probe contract (vec_id < 100) and integer
    * micro recall as [[ivfRecallEval]]. The number quantifies the
    * serving trade: a walk touches O(B·deg·rounds) float vectors per
    * probe (plus the binary screen) where IVF touches
    * O(corpus/cells·nprobe). */
  def graphSearchEval(spark: SparkSession, dir: String,
                      probeN: Long = 100): DataFrame = {
    val truth = exactTruthTop3(spark, dir, probeN)
    val found = graphSearch(spark, dir, probeN).select("a_id", "b_id")
    val hit = truth.join(found, Seq("a_id", "b_id"))
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_truth"), col("n_hit"),
        expr("CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
          "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_truth END")
          .as("recall_micro"))
  }

  /** Beam-walk chain through `gsb2` (a_id, b_id, sim, rn ≤ 4) —
    * oracle mirror of [[graphSearch]], shared by sim_graph_search and
    * sim_graph_search_eval (gs-prefixed names claimed; composes
    * [[knnMutualCteSql]], which owns r/t/mu). */
  private def graphSearchCteSql: String = {
    def round(prev: String, k: Int): String =
      s"gsc$k AS (SELECT a_id, b_id FROM $prev UNION " +
      s"SELECT b.a_id, g.v FROM $prev b JOIN gsu g ON b.b_id = g.u), " +
      s"gss$k AS (SELECT c.a_id, c.b_id, " +
      "round((list_dot_product(e.embedding, p.qv) / (e.nrm * p.qnrm)) * 1e6) / 1e6 AS sim " +
      s"FROM gsc$k c JOIN gse e ON c.b_id = e.vec_id " +
      "JOIN gsp p ON c.a_id = p.a_id WHERE c.a_id <> c.b_id), " +
      s"gsb$k AS (SELECT a_id, b_id, sim, rn FROM (SELECT gss$k.*, " +
      "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn " +
      s"FROM gss$k) gsq$k WHERE rn <= $GraphBeam)"
    knnMutualCteSql + ", " + signCteSql + ", " +
    "gsu AS (SELECT a_id AS u, b_id AS v FROM mu " +
    "UNION ALL SELECT b_id, a_id FROM mu), " +
    "gse AS (SELECT vec_id, embedding::DOUBLE[] AS embedding, " +
    "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm " +
    "FROM embeddings), " +
    "gsp AS (SELECT vec_id AS a_id, embedding AS qv, nrm AS qnrm " +
    "FROM gse WHERE vec_id < 100), " +
    "gsb0 AS (SELECT a_id, b_id FROM (SELECT sgsh.*, row_number() OVER (" +
    "PARTITION BY a_id ORDER BY hd ASC, b_id ASC) AS re FROM sgsh) gsq0 " +
    s"WHERE re <= $GraphBeam), " +
    round("gsb0", 1) + ", " + round("gsb1", 2)
  }

  /** The recall-vs-method FRONTIER — the one-table summary an ANN
    * deployment decision actually reads: all ten single-number recall
    * evals (IVF index, sign-bit binary, int8, JL projection,
    * Matryoshka prefix, graph walk, NN-descent, RRF fusion, split
    * index, recursive split index) side by side under the SAME fixed
    * probe set and truth definition. Pure composition: each leg IS the
    * registered eval query (Spark functions and oracle SQL both —
    * lockstep by construction), so the frontier can never disagree
    * with its legs. */
  def evalFrontier(spark: SparkSession, dir: String): DataFrame = {
    val legDefs: Seq[(String, () => DataFrame)] = Seq(
      "band"       -> (() => splitBandRecallEval(spark, dir)),
      "deepsplit"  -> (() => splitDeepRecallEval(spark, dir)),
      "graph"      -> (() => graphSearchEval(spark, dir)),
      "int8"       -> (() => int8RecallEval(spark, dir)),
      "ivf"        -> (() => ivfRecallEval(spark, dir)),
      "jl"         -> (() => jlRecallEval(spark, dir)),
      "matryoshka" -> (() => matryoshkaRecallEval(spark, dir)),
      // the refined-graph column pair of the descent eval, renamed to
      // the frontier's (n_hit, recall_micro) contract
      "nn_descent" -> (() => nnDescentEval(spark, dir)
        .select(col("n_truth"), col("n_hit_ref").as("n_hit"),
                col("recall_ref_micro").as("recall_micro"))),
      "rrf"        -> (() => rrfRecallEval(spark, dir)),
      "sign"       -> (() => signRecallEval(spark, dir)),
      "split"      -> (() => splitRecallEval(spark, dir)),
      "trained"    -> (() => trainedRecallEval(spark, dir)),
      "trainedsplit" -> (() => trainedSplitRecallEval(spark, dir)))
    // Build the legs CONCURRENTLY (guide §2.6 — overlap independent
    // jobs): most legs force eager memo builds at construction
    // (serve frames, the round-20 1-row results), and serial
    // construction would run each probe-bounded build alone on an
    // otherwise idle session. Distinct memo keys build in parallel
    // (CkptMemo's per-key lazy cells); legs racing to a SHARED memo
    // (simtruth) serialize on that one cell only. The truth memo is
    // forced FIRST so no leg's thread wins the simtruth build and
    // hides the owner's cost inside a leg.
    exactTruthTop3(spark, dir, 100)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val legs =
      try {
        val futs = legDefs.map { case (m, f) =>
          (m, scala.concurrent.Future(f()))
        }
        futs.map { case (m, fut) =>
          (m, scala.concurrent.Await.result(
                fut, scala.concurrent.duration.Duration.Inf))
        }
      } finally pool.shutdown()
    legs.map { case (m, df) =>
      df.select(lit(m).as("method"), col("n_truth"), col("n_hit"),
                col("recall_micro"))
    }.reduce(_.unionByName(_)).orderBy("method")
  }

  // ---- Johnson–Lindenstrauss random projection ----

  /** JL target dimensionality and the plane-index offset that keeps the
    * projection directions decorrelated from the LSH bucket planes
    * (same LCG, disjoint index range) — both mirrored as literals in
    * [[jlCteSql]] (keep in lockstep). */
  private val JlDims = 16
  private val JlPlaneBase = 100

  /** Per-vector JL coordinates in exact integer micro-units: coordinate
    * k = round(⟨v, plane(100+k)⟩ · 1e6) as BIGINT. The ±1 planes make
    * the projection DATA-OBLIVIOUS — no training pass, no model state,
    * the transform is a pure function of the vector (contrast
    * [[pcaProject]], which learns its direction) — so it applies
    * streaming, incrementally, and identically on every engine.
    * Micronizing at the projection boundary means every downstream
    * product/sum is exact int64 (|p| ≤ 24·1e6 ⇒ 16 squared terms stay
    * under 2^63), immune to summation order. */
  private def jlWide(spark: SparkSession, dir: String): DataFrame = {
    val coords = (0 until JlDims).map { k =>
      val h = array(plane(JlPlaneBase + k).map(lit): _*)
      round(dotCols(col("embedding"), h) * 1e6).cast("long")
    }
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), array(coords: _*).as("jl"))
  }

  /** JL random projection, long form (vec_id, k, p_micro) — the
    * 64→16-dim oblivious dimensionality reduction. One corpus scan,
    * zero shuffles, no model to train or ship. */
  def randProj(spark: SparkSession, dir: String): DataFrame =
    jlWide(spark, dir)
      .select(col("vec_id"), posexplode(col("jl")))
      .select(col("vec_id"), col("pos").cast("int").as("k"),
              col("col").as("p_micro"))

  /** JL recall eval — does cosine top-3 in the 16-dim projected space
    * recover the exact 64-dim top-3? MEASURED ANSWER on this corpus:
    * ~4% at sf0.01 — the isotropic synthetic embeddings are JL's worst
    * case (pairwise cosines concentrate near 0, so a 16-dim sketch
    * cannot separate rank-3 from rank-30). That number is the point of
    * the harness: it says use JL here for coarse bucketing (LSH) or
    * distance ESTIMATION, not top-k serving — where the trained
    * reductions ([[pcaProject]]) or finer quantizers ([[quantize]],
    * [[pqCodes]]) hold 95%+. Projected similarities are
    * computed ENTIRELY from the exact integer micro-coordinates
    * (BIGINT dot and norms, one double division at the end, 6-dp
    * round) — bit-reproducible cross-engine, unlike a float-projected
    * variant whose summation order would drift. Same fixed-probe
    * eval contract as [[int8RecallEval]]. The 16-element integer fold
    * is an interpreted HOF, but it runs on |probes|·|corpus| pairs of
    * 16-long arrays — 4× less work than the 64-dim exact scan even
    * interpreted; a production variant would drop to an ArrayDot-style
    * codegen'd long fold. */
  def jlRecallEval(spark: SparkSession, dir: String,
                   probeN: Long = 100): DataFrame =
    // memoized 1-row result ("jlrecall", owner sim_eval_frontier — the
    // frontier runs first and this eval IS its jl leg; the standalone
    // query re-ran the whole probe×corpus JL ranking before round 20);
    // keyed (probeN, heldout) per the simtruth rule
    CkptMemo.getOrElseUpdate((spark, dir, "jlrecall", probeN, probeHeldOut),
      jlRecallEvalUncached(spark, dir, probeN).localCheckpoint())

  private def jlRecallEvalUncached(spark: SparkSession, dir: String,
                                   probeN: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // codegen exact-int64 dot (graft.functions.ArrayDotLong) — the
    // probe×corpus candidate join is the JL serve's O(n·probes) inner
    // loop; the interpreted aggregate/zip_with HOF chain it replaces is
    // the spec reference (ArrayDotLongSpec pins value identity). Σx² is
    // the self-dot instance.
    val nsq = graft.functions.ArrayDotLong.col(col("jl"), col("jl"))
    val jlw = jlWide(spark, dir).withColumn("n2", nsq)
    val qj = jlw.filter(probeSample(spark, dir, probeN, col("vec_id")))
      .select(col("vec_id").as("a_id"), col("jl").as("qjl"),
              col("n2").as("qn2"))
    val wP = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
    val approx = fanOut(jlw).crossJoin(broadcast(qj))
      .filter(col("vec_id") =!= col("a_id"))
      .select(col("a_id"), col("vec_id").as("b_id"),
        graft.functions.ArrayDotLong.col(col("jl"), col("qjl")).as("d16"),
        col("n2"), col("qn2"))
      .select(col("a_id"), col("b_id"),
        when(col("n2") === 0L || col("qn2") === 0L, lit(-2.0))
          .otherwise(Num.rnd(col("d16").cast("double") /
            (sqrt(col("n2").cast("double")) * sqrt(col("qn2").cast("double"))),
            6)).as("sim"))
      .withColumn("rn", row_number().over(wP))
      .filter(col("rn") <= 3)
      .select("a_id", "b_id")
    val truth = exactTruthTop3(spark, dir, probeN)
    val hit = truth.join(approx, Seq("a_id", "b_id"))
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_truth"), col("n_hit"),
        expr("CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
          "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_truth END")
          .as("recall_micro"))
  }

  /** IVF training — one distributed Lloyd (k-means) iteration that makes
    * the coarse quantizer REAL instead of the seed stub: assign every
    * vector to its nearest seed centroid (the memoized [[ivfAssign]]
    * scan), then recompute each cell's centroid as the element-wise mean
    * of its members. One shuffle by cell carrying per-partition vecMean
    * buffers (map-side combine in vector space — not 64× exploded rows);
    * the same shape per iteration at any scale; more Lloyd rounds just
    * repeat it ([[ivfTrainIter]] does, reusing this step's result as
    * round 1; centroids stay a broadcast-size table ≤4096×64). Every
    * seed belongs to its own cell (self-cosine 1.0), so no cell is ever
    * empty. Means are rounded at 6 dp so the trained centroids are
    * byte-identical across engines (the [[centroidBySource]] precedent).
    * Long form (cell, pos, m). */
  def ivfTrain(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "ivftrain"), {
      val assigned = ivfAssign(spark, dir).select("vec_id", "cell")
      meanLongForm(
        Tables.embeddings(spark, dir)
          .select(col("vec_id"), col("embedding"))
          .join(assigned, Seq("vec_id"))
          .groupBy("cell")
          .agg(vecMean(col("embedding")).as("mv")),
        "cell")
        .orderBy("cell", "pos")
        .localCheckpoint()
    })

  /** Every (vector, trained cell) ranked by cosine, kept to rn ≤
    * [[NProbe]] — the trained-quantizer analog of [[ivfAssignRanked]],
    * shared by the final assignment AND the trained-index search (the
    * n×cells scan is the expensive half; memoized once per (session,
    * dir)). Trained centroids are a tiny broadcast (cells×64 rounded
    * doubles); norms precomputed once per vector / per centroid (the
    * file-wide invariant) so the scan does ONE 64-dim fold per pair. */
  private[graft] def ivfTrainedRanked(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "ivftrainedranked"), {
      val cents = ivfTrain(spark, dir)
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
                       x => x.getField("m")).as("cv"))
        .withColumn("cnrm", sqrt(dotCols(col("cv"), col("cv"))))
      // same bounded top-NProbe aggregate as ivfAssignRanked — the
      // trained scan is the second n×cells pass and spilled identically
      // under the window form
      explodeRanked(
        fanOut(Tables.embeddings(spark, dir)
            .select(col("vec_id"), col("embedding"),
                    sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm")))
          .crossJoin(broadcast(cents))
          .select(col("vec_id"),
                  Num.rnd(dotCols(col("embedding"), col("cv")) /
                            (col("nrm") * col("cnrm")), 6).as("csim"),
                  col("cell"))
          .groupBy("vec_id")
          .agg(topNProbe(col("csim"), col("cell")).as("tk")))
        .localCheckpoint()
    })

  /** Re-assignment against the TRAINED centroids — the quantizer a real
    * IVF index serves queries with (seed assign → Lloyd step → final
    * assign). */
  def ivfAssignTrained(spark: SparkSession, dir: String): DataFrame =
    ivfTrainedRanked(spark, dir)
      .filter(col("rn") === 1)
      .select("vec_id", "cell", "csim")

  /** Per-cell cohesion / outlier report — embedding-space junk
    * detection off the index the corpus already pays for: a vector far
    * from its OWN (nearest) trained centroid is far from every
    * centroid, i.e. it sits in no density region the quantizer found —
    * the classic distance-to-assigned-centroid junk heuristic, and
    * simultaneously the index-health view (a cell whose members barely
    * cohere is a cell the quantizer wasted). Reuses the memoized
    * [[ivfTrainedRanked]] scan, so the marginal cost is ONE groupBy of
    * the |n|-row assignment into |cells| rows at any scale. Each cell
    * reports its member count, the EXACT micro-unit cosine mass
    * (csim is already 6-dp — round(·1e6) is integer-exact and the sum
    * is order-invariant BIGINT, the emb_dim_stats discipline), and its
    * worst member (min csim, ties to the lower id — the row a human
    * reviews first). */
  def outlierReport(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cell")
      .orderBy(col("csim").asc, col("vec_id").asc)
    ivfAssignTrained(spark, dir)
      .withColumn("cm", round(col("csim") * lit(1e6), 0).cast("long"))
      .withColumn("rn", row_number().over(w))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_members"),
           sum("cm").as("sum_csim_micro"),
           max(when(col("rn") === 1, col("vec_id"))).as("worst_id"),
           max(when(col("rn") === 1, col("csim"))).as("worst_csim"))
      .orderBy("cell")
  }

  /** Search against the TRAINED index end-to-end — round-4 verdict
    * "what's missing" #1: [[ivfTopK]] probes the stub quantizer's cells,
    * which at scale are badly unbalanced vs trained ones. Same shape as
    * [[ivfTopK]] (probe side rn ≤ [[NProbe]], indexed side home cell
    * rn = 1, capped bucket join, exact cosine re-rank) but over the
    * Lloyd-trained cells from [[ivfTrainedRanked]]. */
  def ivfTopKTrained(spark: SparkSession, dir: String): DataFrame =
    trainedServeFrom(spark, dir, ivfTrainedRanked(spark, dir))

  /** The trained-index serve composition over a GIVEN ranked-assignment
    * frame (vec_id, cell, rn ≤ [[NProbe]]): probe cells rn ≤ NProbe,
    * home cell rn = 1, capped bucket join, exact cosine re-rank top-3 —
    * shared by [[ivfTopKTrained]] (the session-lifetime memoized index)
    * and [[ivfIndexPersistSearch]] (the same index reloaded from
    * durable parquet), so the two serve paths can never diverge. */
  private def trainedServeFrom(spark: SparkSession, dir: String,
                               ranked: DataFrame): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
    val probes = emb.join(ranked.select("vec_id", "cell"), Seq("vec_id"))
    val indexed = emb.join(ranked.filter(col("rn") === 1)
                             .select("vec_id", "cell"), Seq("vec_id"))
    serveTop3(pairCandidatesAB(probes, indexed, "cell", MaxBucketCandidates)
      .filter(col("a_id") =!= col("b_id")))
      .select("a_id", "b_id", "rn", "sim")
  }

  /** Persisted-ANN round trip (sim_index_persist) — the vector-side
    * analog of [[Dedup.indexPersistScreen]]: production indexes are
    * built offline and served online, so the trained index's two
    * tables are written to durable parquet and search runs from the
    * RELOADED files. Layout: `centroids` = the trained quantizer in
    * long form (cell, pos, m — model-sized, ≤ 4096×64 rows at any
    * corpus scale) and `postings` = the ranked assignment (vec_id,
    * cell, csim, rn ≤ [[NProbe]]) PARTITIONED BY cell — a
    * cell-restricted maintenance scan (rebalance one cell, audit one
    * cell's members) prunes the rest of the index at the file listing,
    * the band-partitioned minhash index's pruning story on the vector
    * side. Result ≡ [[ivfTopKTrained]] by construction — the oracle IS
    * sim_ivf_topk_trained's, unchanged: the only thing that moved is
    * the index's home, from a session-lifetime localCheckpoint to
    * durable columnar files. Partition-column round-trip note: `cell`
    * comes back as the partition directory's inferred INT — cast back
    * to the stored LONG so the serve joins stay type-identical
    * (SimIndexPersistSpec pins equality and the layout). The writes
    * happen at query-construction (the eager-persist family — never in
    * PlanShapeSpec's laziness list). */
  def ivfIndexPersistSearch(spark: SparkSession, dir: String): DataFrame = {
    val centsPath = Tables.scratch("ivf_index_centroids")
    ivfTrain(spark, dir).write.mode("overwrite").parquet(centsPath)
    val postingsPath = Tables.scratch("ivf_index_postings")
    writePostings(ivfTrainedRanked(spark, dir), "cell", postingsPath)
    val reloaded = spark.read.parquet(postingsPath)
      .withColumn("cell", col("cell").cast("long"))
    trainedServeFrom(spark, dir, reloaded)
  }

  /** UPSERT lifecycle serving (sim_ivf_upsert_search) — the ARRIVAL
    * half of the index-maintenance pair ([[ivfDeleteSearch]] is the
    * takedown half): the quantizer was trained on the base corpus
    * snapshot (vec_id < n/2 — [[ivfIncrementalAssign]]'s split
    * contract, 250 at sf0.01) and FROZEN; since then a takedown
    * removed vec_id % 10 = 0 from the base, and a new batch
    * (vec_id ≥ n/2) arrived and was assigned to the frozen trained
    * cells without retraining. Serving runs over the combined live
    * membership. Correctness argument = [[ivfDeleteSearch]]'s extended
    * to arrivals: trained centroids are POSITIONS frozen at train time
    * (they survive member takedown and member arrival alike —
    * retraining is a separate scheduled job, [[ivfTrainIter]]), and
    * per-vector assignment against frozen centroids is independent, so
    * incremental-add + delete-filter + re-cap over live members is
    * EXACTLY a from-scratch rebuild over the live set against the same
    * centroids — the oracle (up-prefixed tail over the shared
    * [[incAssignCteSql]] chain) rebuilds from scratch and hash
    * equality is the proof. In production the add costs |batch| ×
    * cells and the delete costs a filter; neither rescans the corpus.
    * Probes = the eval-family fixed sample ∩ live. */
  def ivfUpsertSearch(spark: SparkSession, dir: String,
                      probeN: Long = 100): DataFrame = {
    val split = embCount(spark, dir) / 2
    // frozen quantizer: trained on the FULL base snapshot — training
    // history includes members later taken down (it doesn't un-happen).
    // Shared seam with ivfIncrementalAssign and VecStream: a recipe
    // change moves all three consumers of the incAssignCteSql chain.
    val cents = frozenBaseCentroids(spark, dir)
    val live = embWithNrm(spark, dir).filter(
      (col("vec_id") < split && col("vec_id") % 10 =!= 0) ||
        col("vec_id") >= split)
    val homeCells = explodeRanked(
      fanOut(live).crossJoin(broadcast(cents))
        .select(col("vec_id"),
                Num.rnd(dotCols(col("embedding"), col("cv")) /
                          (col("nrm") * col("cnrm")), 6).as("csim"),
                col("cell"))
        .groupBy("vec_id")
        .agg(topNProbe(col("csim"), col("cell")).as("tk")))
      .filter(col("rn") === 1).select("vec_id", "cell")
    upsertServeFrom(live, homeCells, cents, probeN)
  }

  /** Embeddings with their L2 norm — the (vec_id, embedding, nrm) shape
    * every serve path starts from. */
  private[graft] def embWithNrm(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))

  /** The upsert SERVE tail over an arbitrary (live members, home-cell
    * index) pair: probes re-rank their NProbe cells against the frozen
    * centroids at query time (an IVF index stores home cells only —
    * probe lists are query-time work), candidates come from the capped
    * home-cell buckets, top-3 per probe. Shared by the batch
    * [[ivfUpsertSearch]] and [[graft.streaming.VecStream]]'s maintained
    * index — stream ≡ batch because both feed per-vector frozen-model
    * assignments through this ONE path (StreamingSpec pins it). */
  private[graft] def upsertServeFrom(live: DataFrame, homeCells: DataFrame,
                                     cents: DataFrame,
                                     probeN: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // stays the literal leading band: this is a SERVE-side sample knob
    // on a seam without (spark, dir) (stream-shared), not an eval probe
    // — the held-out mode targets the eval family only
    val probeSide = live.filter(col("vec_id") < probeN)
    val probeRanked = explodeRanked(
      fanOut(probeSide).crossJoin(broadcast(cents))
        .select(col("vec_id"),
                Num.rnd(dotCols(col("embedding"), col("cv")) /
                          (col("nrm") * col("cnrm")), 6).as("csim"),
                col("cell"))
        .groupBy("vec_id")
        .agg(topNProbe(col("csim"), col("cell")).as("tk")))
    val probes = probeSide
      .join(probeRanked.select("vec_id", "cell"), Seq("vec_id"))
    val indexed = live.join(homeCells, Seq("vec_id"))
    val wr = Window.partitionBy("a_id")
      .orderBy(col("sim").desc, col("b_id").asc)
    pairCandidatesAB(probes, indexed, "cell", MaxBucketCandidates)
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") <= 3)
      .select(col("a_id"), col("b_id"), col("sim"),
              col("rn").cast("int").as("rn"))
  }

  /** SemDeDup-style semantic dedup (cluster-then-confirm, after Abbas et
    * al. 2023): embeddings that land in the same TRAINED coarse cell and
    * confirm at cosine >= 0.4 are semantic duplicates; the keep-list
    * retains a vector iff it has no confirmed dup with a smaller id (the
    * deterministic greedy rule — within a dup chain the lowest id
    * survives). Pairs are generated ONLY within a cell via the capped
    * bucket join ([[pairCandidates]]): at 100 TB the cost is Σ|cell|²
    * bounded by the cap and the trained cells' balance, never corpus².
    * Reuses the memoized [[ivfTrainedRanked]] scan — the quantizer is
    * trained once and serves assignment, search, AND dedup. Threshold
    * 0.4 for the same near-orthogonal-synthetic-data reason as
    * [[embeddingNearDup]]. Recall envelope (IvfRecallSpec measures it):
    * within-cell behavior is EXACT vs brute force, and cross-cell pairs
    * are the designed loss — 17/66 truth pairs share a cell at sf0.001,
    * because 0.4-cosine pairs on near-orthogonal synthetic vectors are
    * weak associations scattered across cells. Real SemDeDup operates
    * at near-dup thresholds (~0.95 on real embeddings) where duplicate
    * groups concentrate inside one cell; for cross-bucket coverage at
    * lower thresholds use [[embeddingNearDup]] (LSH buckets are
    * similarity-keyed, not partition-of-space). */
  /** All in-cell candidate pairs (a < b) with their 6-dp cosine, over
    * the TRAINED home-cell assignment — the un-thresholded frame
    * [[semanticDedup]] (τ = 0.4) and [[semanticCurve]] (τ grid) both
    * cut; extracted so the dedup decision and its tuning curve can
    * never diverge on the candidate stage. */
  private def semanticPairsAll(spark: SparkSession, dir: String): DataFrame =
    // memoized ("sempairs", owner dedup_semantic in Bench's list): the
    // dedup decision, the τ curve, and the recall eval all cut this one
    // un-thresholded in-cell pair frame — before round 20 each re-ran
    // the capped candidate join + cosine
    CkptMemo.getOrElseUpdate((spark, dir, "sempairs"), {
      val ranked = ivfTrainedRanked(spark, dir)
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"),
                sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
      val withCell = emb.join(
        ranked.filter(col("rn") === 1).select("vec_id", "cell"), Seq("vec_id"))
      pairCandidates(withCell, "cell").filter(col("a_id") < col("b_id"))
        .localCheckpoint()
    })

  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    // the keep-list join needs only (vec_id, cell) — straight off the
    // memoized trained ranking, no second embeddings scan
    val homeCells = ivfTrainedRanked(spark, dir)
      .filter(col("rn") === 1).select("vec_id", "cell")
    val dups = semanticPairsAll(spark, dir)
      .filter(col("sim") >= 0.4)
    // a vector's dup-with-smaller-id count arrives on the b side (a < b)
    val nSmaller = dups.groupBy(col("b_id").as("vec_id"))
      .agg(count(lit(1)).as("n_dups_smaller"))
    homeCells
      .join(nSmaller, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("n_dups_smaller"), lit(0L)).as("n_dups_smaller"),
        (coalesce(col("n_dups_smaller"), lit(0L)) === 0).cast("int").as("keep"))
  }

  /** SemDeDup THRESHOLD CURVE — the tuning knob behind
    * [[semanticDedup]]'s fixed τ = 0.4, the [[Dedup.thresholdCurve]]
    * idiom applied to the semantic family: for τ ∈ {0.2 .. 0.7} (grid
    * in exact micro-units, the comparison value derived as
    * CAST(τµ AS DOUBLE)/1e6 IDENTICALLY on both engines — correctly-
    * rounded division, so each grid point is the same double the
    * literal would parse to), count surviving in-cell pairs and the
    * docs the min-id rule would drop, plus the corpus drop share. The
    * τ=0.4 row's n_drop is BY CONSTRUCTION dedup_semantic's keep=0
    * count (SemanticCurveSpec pins it). One un-thresholded pair frame
    * × a 6-row broadcast grid, one groupBy — the same cell-bounded
    * candidate volume as the dedup itself, swept for free. */
  def semanticCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grid = Seq(200000L, 300000L, 400000L, 500000L, 600000L, 700000L)
      .toDF("tau_micro")
      .withColumn("tau", col("tau_micro").cast("double") / lit(1e6))
    val pairs = semanticPairsAll(spark, dir)
    val nVec = Tables.embeddings(spark, dir).agg(count(lit(1)).as("n_vec"))
    val counted = pairs.crossJoin(broadcast(grid))
      .filter(col("sim") >= col("tau"))
      .groupBy("tau_micro")
      .agg(count(lit(1)).as("n_pairs"), countDistinct("b_id").as("n_drop"))
    grid.select("tau_micro").join(counted, Seq("tau_micro"), "left")
      .crossJoin(broadcast(nVec))
      .withColumn("n_pairs", coalesce(col("n_pairs"), lit(0L)))
      .withColumn("n_drop", coalesce(col("n_drop"), lit(0L)))
      .withColumn("drop_frac_micro", expr("(n_drop * 1000000) div n_vec"))
      .select("tau_micro", "n_pairs", "n_drop", "drop_frac_micro")
      .orderBy("tau_micro")
  }

  /** Matryoshka (MRL-style) prefix-truncation recall — the dimension-
    * adaptive serving trick (Kusupati et al., "Matryoshka Representation
    * Learning", NeurIPS'22): rank with only the FIRST 16 of 64 dims
    * (4× less memory bandwidth and ADC work; no re-encoding, unlike
    * [[randProj]]'s learned-free JL mix or [[quantize]]'s int8 codes —
    * the prefix IS the compressed vector) and measure top-3 recall vs
    * the full-dimension exact ground truth on the fixed probe sample.
    * Same probe-bounded brute-force shape as the other recall harnesses;
    * prefix cosine is dot/(√n2·√qn2) with BOTH factors computed the
    * identical way in the oracle (no list_cosine_similarity on the
    * prefix — the denominators must be the same doubles). Synthetic
    * embeddings are NOT MRL-trained, so this measures the untrained
    * floor — the harness exists so a trained checkpoint's gain is
    * measurable, same contract as the IVF recall cliff. */
  def matryoshkaRecallEval(spark: SparkSession, dir: String,
                           probeN: Long = 100): DataFrame =
    // memoized 1-row result ("matrecall", owner sim_eval_frontier —
    // the jlrecall rule, round 20)
    CkptMemo.getOrElseUpdate((spark, dir, "matrecall", probeN, probeHeldOut),
      matryoshkaRecallEvalUncached(spark, dir, probeN).localCheckpoint())

  private def matryoshkaRecallEvalUncached(spark: SparkSession, dir: String,
                                           probeN: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pre = Tables.embeddings(spark, dir)
      .select(col("vec_id"), slice(col("embedding"), 1, 16).as("pv"))
      .withColumn("pn2", dotCols(col("pv"), col("pv")))
    val qp = pre.filter(probeSample(spark, dir, probeN, col("vec_id")))
      .select(col("vec_id").as("a_id"), col("pv").as("qpv"),
              col("pn2").as("qpn2"))
    val wP = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
    val approx = fanOut(pre).crossJoin(broadcast(qp))
      .filter(col("vec_id") =!= col("a_id"))
      .select(col("a_id"), col("vec_id").as("b_id"),
        when(col("pn2") === 0.0 || col("qpn2") === 0.0, lit(-2.0))
          .otherwise(Num.rnd(dotCols(col("pv"), col("qpv")) /
                       (sqrt(col("pn2")) * sqrt(col("qpn2"))), 6)).as("sim"))
      .withColumn("rn", row_number().over(wP))
      .filter(col("rn") <= 3)
      .select("a_id", "b_id")
    val truth = exactTruthTop3(spark, dir, probeN)
    val hit = truth.join(approx, Seq("a_id", "b_id"))
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_truth"), col("n_hit"),
        expr("CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
             "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_truth END")
          .as("recall_micro"))
  }

  /** Semantic-dedup recall eval — the FOURTH eval harness (sketch:
    * [[Dedup.minhashEval]]; index: [[ivfRecallEval]]/[[nprobeSweep]];
    * compression: [[int8RecallEval]]; this one: the DEDUP DECISION).
    * SemDeDup only compares within a trained cell, so a true near-dup
    * pair split across a cell boundary is never dropped — this harness
    * puts a number on that loss. On the fixed probe sample: truth =
    * probes with ANY smaller-id neighbor at cosine ≥ 0.4 anywhere in
    * the corpus (one broadcast of the probe table against one streamed
    * corpus pass); predicted = [[semanticDedup]]'s keep=0 probes.
    * Precision is 1.0 BY CONSTRUCTION (a same-cell drop pair is a true
    * pair — SemanticDedupEvalSpec pins it), so recall_micro is the
    * single operative number: raise cells → more boundary loss, fewer
    * comparisons; the dedup-side mirror of the nprobe trade. */
  def semanticDedupEval(spark: SparkSession, dir: String,
                        probeN: Long = 100): DataFrame = {
    val sem = semanticDedup(spark, dir).filter(probeSample(spark, dir, probeN, col("vec_id")))
      .select(col("vec_id"), col("keep"))
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
    val q = emb.filter(probeSample(spark, dir, probeN, col("vec_id")))
      .select(col("vec_id").as("a_id"), col("embedding").as("qv"),
              col("nrm").as("qnrm"))
    val truth = fanOut(emb).crossJoin(broadcast(q))
      .filter(col("vec_id") < col("a_id"))
      .filter(Num.rnd(dotCols(col("embedding"), col("qv")) /
                        (col("nrm") * col("qnrm")), 6) >= 0.4)
      .select("a_id").distinct()
    val pred = sem.filter(col("keep") === 0).select(col("vec_id").as("a_id"))
    sem.agg(count(lit(1)).as("n_probes"))
      .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
      .crossJoin(pred.agg(count(lit(1)).as("n_pred")))
      .crossJoin(pred.join(truth, Seq("a_id")).agg(count(lit(1)).as("n_hit")))
      .select(col("n_probes"), col("n_truth"), col("n_pred"), col("n_hit"),
        expr("CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
             "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_truth END")
          .as("recall_micro"),
        expr("CASE WHEN n_pred = 0 THEN CAST(1000000 AS BIGINT) " +
             "ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_pred END")
          .as("precision_micro"))
  }

  /** Training convergence: squared distance each cell's centroid moved in
    * the Lloyd step (seed → trained) — the metric that tells a pipeline
    * when to stop iterating. Per-dim squared diffs are stored as INTEGER
    * pico-units (round(d²·1e12) as long, ≤ 4e12 each, 64 per cell — far
    * inside Long), so the per-cell sum is exact integer arithmetic,
    * immune to summation order (the text_unigram_logprob discipline).
    * One broadcast join on (cell, pos) + one agg. */
  /** INCREMENTAL assignment against a FROZEN index — the ANN face of
    * [[Dedup.incrementalMinhash]]'s daily-append contract: the
    * quantizer is trained on the EXISTING corpus half only (vec_id <
    * n/2 — the CountMemo split contract; 250 at sf0.01 = the static
    * oracle's literal), then every new vector is assigned to its
    * nearest frozen centroid. The batch never triggers a corpus rescan
    * and the index never moves under the batch's feet (retraining is a
    * separate scheduled job — [[ivfTrainIter]]); per-drop cost is
    * |batch| × cells regardless of corpus size, the same O(|batch|)
    * contract as the dedup signature screen. Seed cells come from the
    * corpus half by the same [[ivfCells]] clamp (16 at n=250 — floor
    * of the clamp, so the oracle's literal holds). */
  def ivfIncrementalAssign(spark: SparkSession, dir: String): DataFrame = {
    val split = embCount(spark, dir) / 2
    assignToCentroids(
      Tables.embeddings(spark, dir).filter(col("vec_id") >= split),
      frozenBaseCentroids(spark, dir))
  }

  /** The FROZEN base-half quantizer (seeds < ivfCells(n/2), one Lloyd
    * step on the base snapshot) — the centroid table
    * [[ivfIncrementalAssign]] and [[graft.streaming.VecStream]]'s
    * continuous assignment both serve against. Model-sized. */
  private[graft] def frozenBaseCentroids(spark: SparkSession,
                                         dir: String): DataFrame =
    // model-sized and consumed by EVERY incremental/upsert/stream
    // assignment path (seven batch callers + three streams) — each used
    // to re-run the base-half Lloyd step; memoized once per (session,
    // dir) (memo "frozencents", owner sim_ivf_incremental_assign in
    // Bench's list; VERDICT r18 item 2)
    CkptMemo.getOrElseUpdate((spark, dir, "frozencents"), {
      val split = embCount(spark, dir) / 2
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"),
                sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm"))
      val corpus = emb.filter(col("vec_id") < split)
      val seeds = corpus.filter(col("vec_id") < ivfCells(split))
        .select(col("vec_id").as("cell"), col("embedding").as("cv"),
                col("nrm").as("cnrm"))
      centsOf(lloydStep(fanOut(corpus), seeds)).localCheckpoint()
    })

  /** Nearest-frozen-centroid assignment for an arbitrary (vec_id,
    * embedding, …) batch — per-vector independent, so micro-batch
    * streaming ≡ one-shot batch at any arrival split. Bounded top-1
    * aggregate (the ivfAssignRanked discipline — no window sort). */
  private[graft] def assignToCentroids(batch: DataFrame,
                                       cents: DataFrame): DataFrame =
    fanOut(batch.select(col("vec_id"), col("embedding"),
             sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm")))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"),
              Num.rnd(dotCols(col("embedding"), col("cv")) /
                        (col("nrm") * col("cnrm")), 6).as("csim"),
              col("cell"))
      .groupBy("vec_id")
      .agg(topNProbe(col("csim"), col("cell")).as("tk"))
      .select(col("vec_id"),
              element_at(col("tk"), 1).getField("_2").as("cell"),
              element_at(col("tk"), 1).getField("_1").as("csim"))

  def ivfTrainDelta(spark: SparkSession, dir: String): DataFrame = {
    val seed = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < ivfCells(embCount(spark, dir)))
      .select(col("vec_id").as("cell"), posexplode(col("embedding")))
      .select(col("cell"), col("pos").cast("int").as("pos"),
              col("col").cast("double").as("sv"))
    val diff = col("m") - col("sv")
    ivfTrain(spark, dir)
      .join(seed, Seq("cell", "pos"))
      .select(col("cell"),
              round(diff * diff * lit(1e12)).cast("long").as("t"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_dims"),
           Num.rnd(sum("t").cast("double") / lit(1e12), 6).as("d2"))
      .withColumn("moved", (col("d2") > 0).cast("int"))
      .orderBy("cell")
  }

  /** Total Lloyd steps the iterated trainer runs (counting the seed→1
    * step that [[ivfTrain]] IS), unless movement hits zero earlier.
    * STATIC so the unrolled-CTE oracle encodes the same depth; the
    * early-stop never fires on random float testdata (IvfTrainIterSpec
    * pins d2 > 0 for every executed round at sf0.01 — the lockstep
    * guard, same discipline as the adaptive index knobs). */
  private[graft] val LloydMaxRounds = 3

  /** Long-form centroids → (cell, cv: Array[Double], cnrm) for the next
    * assignment scan. Tiny frame (≤cells rows). */
  private def centsOf(tr: DataFrame): DataFrame =
    tr.groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
                     x => x.getField("m")).as("cv"))
      .withColumn("cnrm", sqrt(dotCols(col("cv"), col("cv"))))

  /** One Lloyd step against arbitrary centroids: nearest-centroid assign
    * (6-dp-rounded cosine, ties to the lower cell — identical on both
    * engines) + 6-dp-rounded element-wise means via vecMean. `emb` must
    * carry (vec_id, embedding, nrm). A centroid that captures no vectors
    * simply vanishes from the next round's table — identically on both
    * engines, since assignments are identical. */
  private def lloydStep(emb: DataFrame, cents: DataFrame): DataFrame = {
    // nearest-centroid assignment via the bounded top-1 aggregate (the
    // ivfAssignRanked discipline): map-side combine, no n×cells sort —
    // this is the per-round scan the iterated trainer pays LloydMaxRounds
    // times, so the window form's spill multiplied with rounds
    val asg = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"),
              Num.rnd(dotCols(col("embedding"), col("cv")) /
                        (col("nrm") * col("cnrm")), 6).as("csim"),
              col("cell"))
      .groupBy("vec_id")
      .agg(topNProbe(col("csim"), col("cell")).as("tk"))
      .select(col("vec_id"),
              element_at(col("tk"), 1).getField("_2").as("cell"))
    meanLongForm(
      emb.select("vec_id", "embedding").join(asg, Seq("vec_id"))
        .groupBy("cell")
        .agg(vecMean(col("embedding")).as("mv")),
      "cell")
  }

  /** The full Lloyd trajectory, memoized: (iter, cell, pos, m) for
    * iter = 0 (seed centroids, raw doubles) through the last executed
    * round (6-dp-rounded means). Round 1 is the memoized [[ivfTrain]]
    * result; rounds 2..[[LloydMaxRounds]] re-assign against the previous
    * round's centroids and recompute. Lifecycle — deliberately NOT the
    * Dedup.clusters one-frame-at-a-time rule: the output IS the union of
    * every round, so each round's checkpoint must stay cached until the
    * final trajectory materializes (a localCheckpoint has no lineage to
    * recompute from; freeing round k early would corrupt the union).
    * That is safe because a round is centroids only — cells×64 rows,
    * ~2 MB at the 4096-cell clamp — so even all [[LloydMaxRounds]]
    * rounds together are broadcast-scale; ALL loop checkpoints are freed
    * in one sweep after the (also tiny) trajectory checkpoint exists
    * (never ivfTrain's own — other queries retain it). The clusters rule
    * applies when rounds are corpus-sized; do not "fix" this loop to
    * match it. localCheckpoint per round still bounds plan depth. Early
    * stop when a round moves no centroid (max per-(cell,pos) pico-diff
    * = 0 — exact integer compare of 6-dp-rounded values, no fp
    * tolerance). Cost per round at any scale: one n×cells
    * broadcast-compare + one vecMean shuffle — the 100 TB shape. */
  private[graft] def lloydTrajectoryOf(embRaw: DataFrame, cells: Int,
                                       round1: Option[DataFrame]): DataFrame = {
    val emb = fanOut(embRaw
        .select(col("vec_id"), col("embedding"),
                sqrt(dotCols(col("embedding"), col("embedding"))).as("nrm")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seed = embRaw
      .filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell"), posexplode(col("embedding")))
      .select(col("cell"), col("pos").cast("int").as("pos"),
              col("col").cast("double").as("m"))
    var acc = seed.withColumn("iter", lit(0))
    // round 1: the caller's memoized ivfTrain result in production (not
    // ours to free); computed from the seed centroids when absent (spec
    // path) — semantically identical (same assign + mean step)
    var cur = round1.getOrElse(lloydStep(emb, centsOf(seed)).localCheckpoint())
    acc = acc.unionByName(cur.withColumn("iter", lit(1)))
    val loopRdds = scala.collection.mutable.ListBuffer
      .empty[Option[org.apache.spark.rdd.RDD[_]]]
    if (round1.isEmpty)
      loopRdds += org.apache.spark.sql.GraftSql.checkpointRdd(cur)
    var iterN = 1
    var moved = true
    while (moved && iterN < LloydMaxRounds) {
      val next = lloydStep(emb, centsOf(cur)).localCheckpoint()
      loopRdds += org.apache.spark.sql.GraftSql.checkpointRdd(next)
      val maxT = next
        .join(cur.withColumnRenamed("m", "pm"), Seq("cell", "pos"))
        .select(round((col("m") - col("pm")) * (col("m") - col("pm")) *
                        lit(1e12)).cast("long").as("t"))
        .agg(max("t")).head()
      moved = !maxT.isNullAt(0) && maxT.getLong(0) > 0
      iterN += 1
      acc = acc.unionByName(next.withColumn("iter", lit(iterN)))
      cur = next
    }
    val out = acc.select("iter", "cell", "pos", "m").localCheckpoint()
    loopRdds.foreach(_.foreach(_.unpersist(false))) // out owns the data now
    emb.unpersist()
    out
  }

  private def lloydRounds(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "lloydrounds"),
      lloydTrajectoryOf(
        Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
        ivfCells(embCount(spark, dir)),
        Some(ivfTrain(spark, dir))))

  /** Converged (or round-capped) trained centroids — the iterated form
    * of [[ivfTrain]] (round-5 verdict task 1). Long form (cell, pos, m),
    * the quantizer a production IVF index would persist. */
  def ivfTrainIter(spark: SparkSession, dir: String): DataFrame = {
    val r = lloydRounds(spark, dir)
    // max(iter) is an action on the tiny checkpointed trajectory — cheap,
    // and this query family is already deliberately eager (memo owner)
    val last = r.agg(max("iter")).head().getInt(0)
    r.filter(col("iter") === last)
      .select("cell", "pos", "m")
      .orderBy("cell", "pos")
  }

  /** Convergence trace: per (round, cell) squared centroid movement in
    * exact integer pico-units (the [[ivfTrainDelta]] discipline), for
    * every executed round — round r compares its centroids to round
    * r-1's (round 1 vs the raw seed). The monotone decrease of the
    * max/sum is what a training pipeline's stop rule watches;
    * IvfTrainIterSpec asserts it on the real trajectory. */
  def ivfTrainHist(spark: SparkSession, dir: String): DataFrame = {
    val r = lloydRounds(spark, dir)
    val prev = r.select((col("iter") + 1).as("iter"), col("cell"),
                        col("pos"), col("m").as("pm"))
    val diff = col("m") - col("pm")
    r.filter(col("iter") >= 1)
      .join(prev, Seq("iter", "cell", "pos"))
      .select(col("iter"), col("cell"),
              round(diff * diff * lit(1e12)).cast("long").as("t"))
      .groupBy("iter", "cell")
      .agg(count(lit(1)).as("n_dims"),
           Num.rnd(sum("t").cast("double") / lit(1e12), 6).as("d2"))
      .withColumn("moved", (col("d2") > 0).cast("int"))
      .orderBy("iter", "cell")
  }

  /** Per-source embedding centroids (element-wise mean) in long form
    * (source, pos, m) — the distributed reduce a clustering / domain-
    * analysis stage needs: ONE shuffle by source carrying per-partition
    * vecMean buffers (not 64× exploded rows), 64 dims × n_sources rows
    * out. Elements rounded at 6 dp for the cross-engine check. */
  def centroidBySource(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val src = Tables.documents(spark, dir)
      .select(col("doc_id").as("vec_id"), col("source"))
    meanLongForm(
      emb.join(src, Seq("vec_id"))
        .groupBy("source")
        .agg(vecMean(col("embedding")).as("mv")),
      "source")
      .orderBy("source", "pos")
  }

  /** Int8-style scalar quantization per vector (min-max to 0..255) — the
    * storage-compression step before ANN indexing at 100 TB. Pure
    * per-row HOFs, zero shuffle. floor (not round) avoids the half-way
    * rounding-mode divergence between engines; codes are emitted as a
    * CSV string so the comparison is exact integers. Degenerate vectors
    * (mx == mn) quantize to all-zero. */
  def quantize(spark: SparkSession, dir: String): DataFrame = {
    val mn = array_min(col("embedding")).cast("double")
    val mx = array_max(col("embedding")).cast("double")
    val codes = transform(col("embedding"), v =>
      least(lit(255L), floor((v.cast("double") - col("mn")) /
                             (col("mx") - col("mn")) * 255)).cast("int"))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), mn.as("mn"), mx.as("mx"))
      .select(col("vec_id"),
              Num.rnd(col("mn"), 6).as("mn_r"),
              Num.rnd(col("mx"), 6).as("mx_r"),
              when(col("mx") > col("mn"), concat_ws(",", codes))
                .otherwise(concat_ws(",",
                  transform(col("embedding"), _ => lit(0)))).as("codes"))
  }

  /** Milli-quantized centered element frame for [[pcaPower]] —
    * (vec_id, pos, c) with c = round(x·1e3) − integer-mean(pos), all
    * BIGINT. Materialized once per (session, dir): the two power rounds
    * reference it four times (two matvecs each). Eager-memoized (NOT in
    * PlanShapeSpec's laziness allowlist; Bench owner: emb_pca_power). */
  private def pcaCentered(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "pcace"), {
      val ce0 = Tables.embeddings(spark, dir)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").cast("int").as("pos"),
                round(col("col").cast("double") * lit(1e3)).cast("long").as("t"))
      // integer mean via sign-split division: `div` truncates toward
      // zero on Spark while DuckDB's // floors — they agree only on
      // non-negative operands, so divide |s| and re-apply the sign
      val means = ce0.groupBy("pos")
        .agg(sum("t").as("s"), count(lit(1)).as("n"))
        .select(col("pos"),
                (when(col("s") < 0, lit(-1L)).otherwise(lit(1L)) *
                  expr("abs(s) div n")).as("mean"))
      ce0.join(broadcast(means), Seq("pos"))
        .select(col("vec_id"), col("pos"), (col("t") - col("mean")).as("c"))
        .localCheckpoint()
    })

  /** Top principal component by distributed power iteration — two
    * Pregel-ish matvec rounds (x ↦ CᵀCx) over the milli-quantized,
    * integer-centered element frame, renormalizing the iterate to
    * max|v| = 100 between rounds. EVERY operation is BIGINT arithmetic
    * (products ≤ ~8.5·10⁹·n — within int64 to ~10⁹ rows), so the
    * eigenvector estimate is exactly reproducible across engines,
    * partitionings, and reruns — the property float PCA can never give
    * an oracle. Shape per half-round: one |elements|-row join + one
    * aggregation, state = |dims| or |rows| scalars; the classic
    * map-reduce PCA at any scale. Sign is pinned by the all-ones start
    * vector. */
  def pcaPower(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "pcav2"), {
      val ce = pcaCentered(spark, dir)
      val s1 = ce.groupBy("vec_id").agg(sum("c").as("sc")) // v0 = all-ones
      val u1 = ce.join(s1, Seq("vec_id"))
        .groupBy("pos").agg(sum(col("c") * col("sc")).as("u1"))
      val v1 = normPow(u1, "u1", "v1").select("pos", "v1")
      val s2 = ce.join(broadcast(v1), Seq("pos"))
        .groupBy("vec_id").agg(sum(col("c") * col("v1")).as("sc"))
      val u2 = ce.join(s2, Seq("vec_id"))
        .groupBy("pos").agg(sum(col("c") * col("sc")).as("u2"))
      // memoized (64 rows): emb_pca_project and the deflated second
      // component reference the learned v2 several times each — without
      // the checkpoint every reference re-runs both matvec rounds
      normPow(u2, "u2", "v2").orderBy("pos").localCheckpoint()
    })

  /** Renormalize a power iterate to max|v| = 100 — exact integer
    * division with the sign split (Spark `div` truncates toward zero,
    * DuckDB `//` floors; they agree only on non-negative operands). */
  private def normPow(u: DataFrame, ucol: String, vcol: String): DataFrame = {
    val m = u.agg(max(abs(col(ucol))).as("m"))
    u.crossJoin(broadcast(m))
      .select(col("pos"), col(ucol),
              (when(col(ucol) < 0, lit(-1L)).otherwise(lit(1L)) *
                expr(s"(abs($ucol) * 100) div m")).as(vcol))
  }

  /** Top-2 PCA by DEFLATED power iteration — extends [[pcaPower]] to the
    * second component with the SAME exact-int64 discipline: after every
    * renormalization the iterate t is orthogonalized against the learned
    * top component v at the ITERATE level, multiplied through by
    * vv = Σv² so no division (and no float) ever enters:
    * w = t·vv − (t·v)·v. Orthogonalizing the 64-scalar iterate (not the
    * n×64 matrix) keeps every magnitude inside [[pcaPower]]'s published
    * bounds — |t| ≤ 100 after renorm, so |w| ≤ 100·vv + 64·100²·100 ≈
    * 1.3e8 and the matvec products stay ≤ ~6.4e9·n, exactly the
    * ~10⁹-row int64 envelope of the first component (matrix-level
    * deflation would have squared it). Two rounds from the
    * v-orthogonalized all-ones start, renormalize → orthogonalize →
    * renormalize per round; truncation keeps w only approximately
    * v-orthogonal — PcaSpec bounds the residual angle. Eager by
    * construction (iterates localCheckpoint per step, the lloydrounds
    * discipline — 64-row frames, constant plan depth). */
  def pcaTop2(spark: SparkSession, dir: String): DataFrame = {
    val ce = pcaCentered(spark, dir)
    val v2 = pcaPower(spark, dir).select(col("pos"), col("v2"))
    val vq = v2.agg(sum(col("v2") * col("v2")).as("vv"),
                    sum(col("v2")).as("sv"))
    def renorm(u: DataFrame, ucol: String, out: String): DataFrame =
      normPow(u, ucol, out).select(col("pos"), col(out)).localCheckpoint()
    def orthog(t: DataFrame, tcol: String, out: String): DataFrame = {
      val tv = t.join(v2, Seq("pos"))
        .agg(sum(col(tcol) * col("v2")).as("tv"))
      renorm(
        t.join(v2, Seq("pos")).crossJoin(broadcast(vq)).crossJoin(broadcast(tv))
          .select(col("pos"),
                  (col(tcol) * col("vv") - col("tv") * col("v2")).as("g")),
        "g", out)
    }
    // v-orthogonalized all-ones start: g = 1·vv − (Σv)·v
    val g1 = renorm(
      v2.crossJoin(broadcast(vq))
        .select(col("pos"), (col("vv") - col("sv") * col("v2")).as("g")),
      "g", "v")
    def round(vin: DataFrame, out: String): DataFrame = {
      val s = ce.join(broadcast(vin), Seq("pos"))
        .groupBy("vec_id").agg(sum(col("c") * col("v")).as("sc"))
      val u = ce.join(s, Seq("vec_id"))
        .groupBy("pos").agg(sum(col("c") * col("sc")).as("u"))
      orthog(renorm(u, "u", "t"), "t", out)
    }
    val w1 = round(g1, "v")
    val w2 = round(w1, "w2")
    v2.join(w2, Seq("pos")).orderBy("pos")
  }

  /** Project every embedding onto the learned top component — the
    * "apply" half of [[pcaPower]]'s "train" (the same closure the IVF
    * family has in train → assign_trained → topk_trained): score_i =
    * Σ_j c_ij·v2_j, exact BIGINT, one |elements|-row join + one agg.
    * The score is the 1-D reduction a curation pipeline bands, samples,
    * or drift-monitors on. */
  def pcaProject(spark: SparkSession, dir: String): DataFrame = {
    val v2 = pcaPower(spark, dir).select(col("pos"), col("v2"))
    val sc = pcaCentered(spark, dir).join(broadcast(v2), Seq("pos"))
      .groupBy("vec_id").agg(sum(col("c") * col("v2")).as("score"))
    Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
      .join(sc, Seq("vec_id"))
  }

  /** Per-dimension z-score whitening — the normalize-before-index step
    * an embed stage runs so no dimension's scale dominates distances:
    * z = (x − μ_pos)/σ_pos using [[dimStats]]' EXACT-moment, 6-dp-rounded
    * mean/variance (identical doubles cross-engine), so every z is a
    * fixed tree of exactly-rounded IEEE ops. Dead dimensions
    * (var = 0) are dropped — mirrored in the oracle's WHERE. Broadcast
    * of the |dims|-row stats frame; zero extra shuffles beyond the
    * moments pass. */
  def whiten(spark: SparkSession, dir: String): DataFrame =
    whitenOf(Tables.embeddings(spark, dir))

  /** [[whiten]] over any (vec_id, embedding) frame — standalone so specs
    * can drive it on crafted fixtures (scale-inflated dimensions). */
  private[graft] def whitenOf(embRaw: DataFrame): DataFrame = {
    val st = dimStatsOf(embRaw)
      .select(col("pos"), col("mean"), col("var_samp"))
      .filter(col("var_samp") > 0)
    embRaw
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").cast("int").as("pos"),
              col("col").cast("double").as("x"))
      .join(broadcast(st), Seq("pos"))
      .select(col("vec_id"), col("pos"),
        // + 0.0 normalizes IEEE −0.0 → +0.0: zero-centered outputs can
        // round to a signed zero, and DuckDB's float round keeps the
        // sign where Spark's BigDecimal round does not (mirrored oracle)
        (Num.rnd((col("x") - col("mean")) / sqrt(col("var_samp")), 4)
          + lit(0.0)).as("z"))
  }

  /** Coarse IVF assignment over WHITENED vectors — closes the
    * train→apply loop the [[whiten]] docstring promises: normalize so no
    * dimension's raw scale dominates distances, THEN build the index.
    * The z-scores (4-dp, negative-zero-normalized — identical doubles
    * cross-engine) are collected back to position-sorted arrays
    * (dead dims dropped consistently on every vector, so arrays stay
    * aligned), and the seed quantizer (vec_id < cells, [[ivfCells]] via
    * the memoized count — 16 at the oracle's n=500) assigns by rounded
    * cosine with the [[ivfAssignRanked]] tie-break. Cosines of
    * zero-centered vectors CAN round to a signed zero, so csim gets the
    * `+ 0.0` normalization (CLAUDE.md float rule). Scale shape: one
    * 64-group stats shuffle + one |n|-group collect + a broadcast
    * cells×64 crossJoin — the same n×cells scan as every assign in the
    * family; whitening is per-dimension (mean, σ) so the stats frame is
    * |dims| rows no matter the corpus size. WhitenIndexSpec pins the
    * capability claim: whitened assignment is invariant under
    * per-dimension scale inflation while raw-cosine assignment is not. */
  def ivfAssignWhitened(spark: SparkSession, dir: String): DataFrame =
    ivfAssignWhitenedOf(whiten(spark, dir), ivfCells(embCount(spark, dir)))

  private[graft] def ivfAssignWhitenedOf(whitened: DataFrame,
                                         cells: Int): DataFrame = {
    val wv = whitened.groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("z")))),
                     x => x.getField("z")).as("wv"))
      .withColumn("nrm", sqrt(dotCols(col("wv"), col("wv"))))
    val cents = wv.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell"), col("wv").as("cv"),
              col("nrm").as("cnrm"))
    // bounded top-1 aggregate (the ivfAssignRanked discipline)
    wv.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        (Num.rnd(dotCols(col("wv"), col("cv")) /
                   (col("nrm") * col("cnrm")), 6) + lit(0.0)).as("csim"),
        col("cell"))
      .groupBy("vec_id")
      .agg(topNProbe(col("csim"), col("cell")).as("tk"))
      .select(col("vec_id"),
              element_at(col("tk"), 1).getField("_2").as("cell"),
              element_at(col("tk"), 1).getField("_1").as("csim"))
  }

  /** The dim-stats oracle chain through `ds` (pos, n, mean, var_samp,
    * mn, mx — 6-dp-rounded) — shared by emb_dim_stats and emb_whiten so
    * the moment arithmetic cannot drift. */
  private def dimStatsCteSql: String =
    "WITH x AS (SELECT e.vec_id, CAST(p.pos1 - 1 AS INTEGER) AS pos, " +
    "CAST(e.embedding[p.pos1] AS DOUBLE) AS x " +
    "FROM embeddings e, UNNEST(range(1, len(e.embedding)+1)) AS p(pos1)), " +
    "t AS (SELECT pos, x, CAST(round(x * 1e6) AS BIGINT) AS t1, " +
    "CAST(round(x * x * 1e12) AS BIGINT) AS t2 FROM x), " +
    "g AS (SELECT pos, count(*) AS n, CAST(sum(t1) AS DOUBLE) AS s1, " +
    "CAST(sum(t2) AS DOUBLE) AS s2, min(x) AS mnx, max(x) AS mxx " +
    "FROM t GROUP BY pos), " +
    "ds AS (SELECT pos, n, round(((s1 / 1e6) / n) * 1e6) / 1e6 AS mean, " +
    "round((((s2 / 1e12) - ((s1 / 1e6) * (s1 / 1e6)) / n) / (n - 1)) * 1e6) / 1e6 AS var_samp, " +
    "round((mnx) * 1e6) / 1e6 AS mn, round((mxx) * 1e6) / 1e6 AS mx FROM g)"

  /** The integer power-iteration oracle chain through `v2c`
    * (pos, u2, v2) — shared by emb_pca_power and emb_pca_project so the
    * two cannot drift. The CTEs mirror pcaCentered + two matvec rounds
    * 1:1; `//` only ever divides NON-NEGATIVE operands (sign split)
    * because DuckDB floors where Spark's div truncates. */
  private def pcaCteSql: String =
    // ce / v2c are MATERIALIZED: DuckDB 1.0 re-evaluates a CTE per
    // reference, and the deflated-top2 chain references this base many
    // times — without materialization the re-evaluation compounds
    // exponentially with chain depth (observed: emb_pca_top2's oracle
    // ran for minutes; with it, seconds). Results are unchanged.
    "WITH x AS (SELECT e.vec_id, CAST(p.pos1 - 1 AS INTEGER) AS pos, " +
    "CAST(round(CAST(e.embedding[p.pos1] AS DOUBLE) * 1e3) AS BIGINT) AS t " +
    "FROM embeddings e, UNNEST(range(1, len(e.embedding)+1)) AS p(pos1)), " +
    "mn AS (SELECT pos, (CASE WHEN CAST(sum(t) AS BIGINT) < 0 THEN -1 ELSE 1 END) * " +
    "(abs(CAST(sum(t) AS BIGINT)) // count(*)) AS mean FROM x GROUP BY pos), " +
    "ce AS MATERIALIZED (SELECT x.vec_id, x.pos, x.t - mn.mean AS c FROM x JOIN mn USING (pos)), " +
    "s1 AS (SELECT vec_id, CAST(sum(c) AS BIGINT) AS sc FROM ce GROUP BY vec_id), " +
    "u1c AS (SELECT ce.pos, CAST(sum(ce.c * s1.sc) AS BIGINT) AS u1 " +
    "FROM ce JOIN s1 USING (vec_id) GROUP BY ce.pos), " +
    "m1 AS (SELECT max(abs(u1)) AS m FROM u1c), " +
    "v1c AS (SELECT pos, (CASE WHEN u1 < 0 THEN -1 ELSE 1 END) * " +
    "((abs(u1) * 100) // m) AS v1 FROM u1c CROSS JOIN m1), " +
    "s2 AS (SELECT ce.vec_id, CAST(sum(ce.c * v1c.v1) AS BIGINT) AS sc " +
    "FROM ce JOIN v1c USING (pos) GROUP BY ce.vec_id), " +
    "u2c AS (SELECT ce.pos, CAST(sum(ce.c * s2.sc) AS BIGINT) AS u2 " +
    "FROM ce JOIN s2 USING (vec_id) GROUP BY ce.pos), " +
    "m2 AS (SELECT max(abs(u2)) AS m FROM u2c), " +
    "v2c AS MATERIALIZED (SELECT pos, u2, (CASE WHEN u2 < 0 THEN -1 ELSE 1 END) * " +
    "((abs(u2) * 100) // m) AS v2 FROM u2c CROSS JOIN m2)"

  /** Per-dimension corpus statistics (n, mean, sample variance, min,
    * max) — the embed-stage health check that catches dead dimensions
    * (var ≈ 0), collapsed scales, and outlier dims before an index is
    * trained on them. Moments are EXACT integers: each element is
    * quantized once (x·1e6 and x²·1e12, rounded to BIGINT — identical
    * scalar ops both engines) and summed into DECIMAL(38,0) accumulators
    * (no overflow until ~10^25 absolute mass — comfortable at 100 TB,
    * where a plain BIGINT second-moment sum overflows past ~6·10^5
    * rows), so results are invariant to partitioning, parallelism, and
    * summation order — the text_unigram_logprob discipline applied to
    * doubles. One shuffle (64 groups), partial aggregation map-side. */
  def dimStats(spark: SparkSession, dir: String): DataFrame =
    dimStatsOf(Tables.embeddings(spark, dir))

  /** [[dimStats]] over any (vec_id, embedding) frame — standalone so
    * specs can drive it on crafted fixtures. */
  private[graft] def dimStatsOf(embRaw: DataFrame): DataFrame = {
    embRaw
      .select(posexplode(col("embedding")))
      .select(col("pos").cast("int").as("pos"), col("col").cast("double").as("x"))
      .select(col("pos"), col("x"),
        round(col("x") * lit(1e6)).cast("decimal(38,0)").as("t1"),
        round(col("x") * col("x") * lit(1e12)).cast("decimal(38,0)").as("t2"))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"), sum("t1").as("s1"), sum("t2").as("s2"),
           min("x").as("mnx"), max("x").as("mxx"))
      .select(col("pos"), col("n"),
        Num.rnd(col("s1").cast("double") / lit(1e6) / col("n"), 6).as("mean"),
        Num.rnd((col("s2").cast("double") / lit(1e12) -
                 (col("s1").cast("double") / lit(1e6)) *
                   (col("s1").cast("double") / lit(1e6)) / col("n"))
                  / (col("n") - 1), 6).as("var_samp"),
        Num.rnd(col("mnx"), 6).as("mn"),
        Num.rnd(col("mxx"), 6).as("mx"))
      .orderBy("pos")
  }

  /** Corpus-level embedding ANISOTROPY — the one-number geometry check
    * next to [[dimStats]]' per-dimension view (Ethayarajh's finding:
    * contextual embeddings concentrate in a narrow cone; an anisotropic
    * space makes raw cosine similarity uninformative and argues for
    * centering/whitening before indexing — this is the number that
    * justifies [[whiten]]): aniso = ‖μ‖² / E‖x‖², the expected cosine
    * between two random vectors when norms are comparable — 0 for a
    * centered isotropic cloud, →1 as the cone collapses. EXACT-INTEGER
    * discipline throughout: elements quantized once (x·1e6, x²·1e12 —
    * the dimStats rule) into DECIMAL(38) sums (s1² reaches ~10²⁰ at
    * corpus scale — far past BIGINT; DECIMAL(38)/HUGEINT carry it to
    * ~10³⁸), then three non-negative integral divisions. One shuffle
    * (64 groups) + a 64-row final agg; single output row at any
    * scale. */
  def isotropy(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding")))
      .select(col("pos"), col("col").cast("double").as("x"))
      .select(col("pos"),
        round(col("x") * lit(1e6)).cast("decimal(38,0)").as("t1"),
        round(col("x") * col("x") * lit(1e12)).cast("decimal(38,0)").as("t2"))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"), sum("t1").as("s1"), sum("t2").as("s2"))
    g.agg(max("n").as("n"), count(lit(1)).as("n_dims"),
          sum(expr("s1 * s1")).as("num"), sum("s2").as("den"))
      .select(col("n"), col("n_dims"),
        expr("CAST(den div (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)")
          .as("mean_norm_sq_micro"),
        expr("CAST(num div (CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) " +
             "* 1000000) AS BIGINT)").as("mu_norm_sq_micro"),
        expr("CAST((num * 1000000) div (CAST(n AS DECIMAL(38,0)) * den) " +
             "AS BIGINT)").as("aniso_micro"))
  }

  /** Per-dimension EMBEDDING DRIFT between ingest batches — the
    * index-health check a production vector store runs before deciding
    * whether yesterday's trained quantizer still fits today's data
    * (encoder version bumps and corpus mix changes move the embedding
    * distribution; a drifted dimension silently degrades IVF recall).
    * Batch split = vec_id < n/2 via [[CountMemo]] (reproduces the
    * oracle's literal 250 at sf0.01 — the dedup_incremental contract);
    * per batch, each dim's mean via the [[dimStats]] discipline
    * (element micronized once to BIGINT, DECIMAL(38) sums —
    * order-invariant), drift = mean_new − mean_ref in integer micro
    * units, flagged at |drift| ≥ 0.1 (literal 100000 µ, lockstep).
    * Means get `+ 0.0` after the round (the emb_whiten signed-zero
    * rule — they are zero-centered quantities). |dims| rows at any
    * corpus scale. */
  def driftReport(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    driftReportOf(emb, CountMemo.get(spark, dir, "embeddings")(emb.count()) / 2)
  }

  /** [[driftReport]] over any (vec_id, embedding) frame with an explicit
    * split — standalone so DriftSpec can drive the shifted-flag path on
    * a crafted genuinely-drifted fixture (the natural corpus drifts
    * ±0.03, under the 0.1 flag). */
  private[graft] def driftReportOf(emb: DataFrame, split: Long): DataFrame = {
    def half(df: org.apache.spark.sql.DataFrame) = df
      .select(posexplode(col("embedding")))
      .select(col("pos").cast("int").as("pos"),
              col("col").cast("double").as("x"))
      .select(col("pos"),
              round(col("x") * lit(1e6)).cast("decimal(38,0)").as("t1"))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"), sum("t1").as("s1"))
    val ref = half(emb.filter(col("vec_id") < split))
      .select(col("pos"), col("n").as("n_ref"), col("s1").as("sr"))
    val neu = half(emb.filter(col("vec_id") >= split))
      .select(col("pos"), col("n").as("n_new"), col("s1").as("sn"))
    ref.join(neu, Seq("pos"))
      .select(col("pos"), col("n_ref"), col("n_new"),
        (Num.rnd(col("sr").cast("double") / lit(1e6) / col("n_ref"), 6) +
          lit(0.0)).as("mean_ref"),
        (Num.rnd(col("sn").cast("double") / lit(1e6) / col("n_new"), 6) +
          lit(0.0)).as("mean_new"))
      .withColumn("drift_micro",
        round((col("mean_new") - col("mean_ref")) * lit(1e6)).cast("long"))
      .withColumn("shifted", (abs(col("drift_micro")) >= 100000L).cast("int"))
      .orderBy("pos")
  }

  /** Pairwise cosine similarity between source centroids — domain
    * redundancy analysis over the (tiny) centroid table; the pairwise
    * stage is n_sources², never n². Centroids are the ROUNDED 6-dp
    * means, so both engines fold identical inputs. */
  def centroidSim(spark: SparkSession, dir: String): DataFrame = {
    val cents = centroidBySource(spark, dir)
      .groupBy("source")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
                     x => x.getField("m")).as("c"))
    val a = cents.select(col("source").as("a_src"), col("c").as("ca"))
    val b = cents.select(col("source").as("b_src"), col("c").as("cb"))
    a.crossJoin(b)
      .filter(col("a_src") < col("b_src"))
      .select(col("a_src"), col("b_src"),
              Num.rnd(cosine(col("ca"), col("cb")), 6).as("sim"))
  }

  /** Embedding-quality eval: nearest-label-centroid classification
    * accuracy — assign every vector to the closest of the 10 label
    * centroids (tiny broadcast), report per-label accuracy. The standard
    * "are these embeddings any good" probe a training pipeline runs after
    * an embed stage. Centroids are the ROUNDED per-dim means so both
    * engines fold identical inputs. */
  def labelEval(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
    // vecMean yields each label's mean vector directly in dim order — no
    // explode, no collect_list re-assembly; rounded per element at 6 dp
    val cents = emb
      .groupBy(col("label").as("plabel"))
      .agg(vecMean(col("embedding")).as("mv"))
      .select(col("plabel"), transform(col("mv"), v => Num.rnd(v, 6)).as("c"))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("plabel").asc)
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("plabel"),
              Num.rnd(cosine(col("embedding"), col("c")), 6).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
           sum(when(col("plabel") === col("label"), 1).otherwise(0)).as("n_correct"))
      .withColumn("acc_pct",
        Num.rnd(lit(100.0) * col("n_correct") / col("n"), 2))
      .orderBy("label")
  }

  /** kNN majority-vote classifier eval — the second standard label
    * benchmark next to [[labelEval]]'s nearest-centroid: predict each
    * vector's label as the MAJORITY label of its [[ivfTopK]] neighbors
    * (ties label-ascending, the cellPurity rule), report per-label
    * accuracy. Centroid eval measures global cluster separation; kNN
    * eval measures LOCAL neighborhood consistency — embeddings can pass
    * one and fail the other, and the pair brackets how trustworthy
    * similarity-graph labels are for SemDeDup-style propagation.
    * Composes the production index search (so this also functions as an
    * end-to-end "is the ANN answer label-coherent" check); vectors with
    * zero surviving candidates (possible for a singleton probe set)
    * drop from the denominator on both engines. One |topk|-row join +
    * two aggregations; |labels| output rows at any scale. */
  def knnLabelEval(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lbl = Tables.embeddings(spark, dir).select("vec_id", "label")
    val nb = ivfTopK(spark, dir)
      .join(lbl.select(col("vec_id").as("b_id"), col("label").as("nl")),
            Seq("b_id"))
      .groupBy("a_id", "nl").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("a_id").orderBy(col("c").desc, col("nl").asc)
    val pred = nb.withColumn("rn2", row_number().over(w))
      .filter(col("rn2") === 1)
      .select(col("a_id").as("vec_id"), col("nl").as("plabel"))
    lbl.join(pred, Seq("vec_id"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
           sum(when(col("plabel") === col("label"), 1).otherwise(0)).as("n_correct"))
      .withColumn("acc_pct",
        Num.rnd(lit(100.0) * col("n_correct") / col("n"), 2))
      .orderBy("label")
  }

  // ---- product quantization (the compression half of IVF-PQ) ----

  /** PQ geometry: 64-dim vectors split into [[PqSubs]] contiguous
    * subspaces of [[PqSubDim]] dims, each quantized to its nearest of
    * [[PqCodes]] trained sub-centroids — a vector compresses to 8 small
    * codes instead of 256 bytes of floats (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): the storage step that
    * makes a 100 TB embedding store fit hot memory for ANN serving.
    * Sizes are STATIC (the [[NProbe]] discipline) so the oracle encodes
    * the identical codebook at every scale; codebook tables stay
    * broadcast-tiny (8×16 rows) by construction. */
  private[graft] val PqSubs = 8
  private[graft] val PqSubDim = 8
  private[graft] val PqCodes = 16
  private[graft] val PqQueries = 4 // ADC probe set: vec_id < 4

  /** Long-form subvectors (vec_id, sub, sv[8], dxx): one row per
    * (vector, subspace); dxx = sv·sv precomputed once per subvector (the
    * file-wide norms invariant — the assignment scans then pay ONE
    * 8-dim fold per (subvector, code) candidate). */
  private[graft] def pqSubvectors(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(array((0 until PqSubs).map { s =>
        slice(col("embedding"), s * PqSubDim + 1, PqSubDim)
      }: _*)))
      .select(col("vec_id"), col("pos").cast("int").as("sub"), col("col").as("sv"))
      .withColumn("dxx", dotCols(col("sv"), col("sv")))

  /** Nearest-sub-centroid assignment: squared L2 expanded as
    * ((sv·sv − 2·sv·cv) + cv·cv) — ArrayDot folds with this EXACT
    * association mirrored in the oracle SQL, 6-dp-rounded, ties to the
    * lower code. `cb` must carry (sub, code, cv, dcc) and is
    * broadcast-tiny; all 8 subspaces assign in ONE plan keyed by sub. */
  private[graft] def pqAssign(subs: DataFrame, cb: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id", "sub").orderBy(col("d2").asc, col("code").asc)
    subs.join(broadcast(cb), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("code"),
        Num.rnd(col("dxx") - lit(2.0) * dotCols(col("sv"), col("cv")) + col("dcc"), 6)
          .as("d2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "sub", "code", "d2")
  }

  /** Trained PQ codebook (sub, code, cv, dcc): seeds are the first
    * [[PqCodes]] vectors' subvectors (every seed captures its own
    * subvector — d2 exactly 0 — so no code starts empty), then one
    * Lloyd step per subspace: seed assign → per-(sub, code) [[vecMean]]
    * rounded at 6 dp — the [[ivfTrain]] discipline at subvector grain,
    * every subspace training in the same single plan. Memoized: the
    * codes query and ADC search both start from it. */
  private[graft] def pqCodebook(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "pqcb"), {
      val subs = pqSubvectors(spark, dir)
      val seed = subs.filter(col("vec_id") < PqCodes)
        .select(col("sub"), col("vec_id").as("code"), col("sv").as("cv"),
                col("dxx").as("dcc"))
      val asg0 = pqAssign(subs, seed).select("vec_id", "sub", "code")
      subs.join(asg0, Seq("vec_id", "sub"))
        .groupBy("sub", "code")
        .agg(vecMean(col("sv")).as("mv"))
        .select(col("sub"), col("code"),
                transform(col("mv"), v => Num.rnd(v, 6)).as("cv"))
        .withColumn("dcc", dotCols(col("cv"), col("cv")))
        .localCheckpoint()
    })

  /** PQ encode: every (vector, subspace) assigned to its trained code —
    * the compressed representation a 100 TB store persists (n×8 rows of
    * small ints; the float vectors are only needed again for exact
    * re-rank). Memoized — ADC search scans these codes. */
  def pqCodes(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "pqcodes"),
      pqAssign(pqSubvectors(spark, dir), pqCodebook(spark, dir))
        .localCheckpoint())

  /** PQ quantization-distortion report — the TRAINING-side codebook
    * health metric the recall evals can't see (recall grades the
    * search; distortion grades the compression): per subspace, the
    * count / sum / mean / worst of the squared L2 from each subvector
    * to its assigned code. A subspace whose distortion dwarfs the
    * others is where the codebook spends its error budget — the signal
    * for re-allocating codes or re-training (Jégou et al. §V). Reads
    * the memoized [[pqCodes]] frame directly (d2 is already the
    * 6-dp-rounded assignment distance), micronizes each d2 BEFORE
    * summing (round(d2·10⁶) — integral up to fp noise since d2 is
    * 6-dp-grained, so per-sub sums are exact integers, partitioning-
    * invariant); d2 ≥ 0 so plain div. [[PqSubs]] output rows at any
    * corpus scale. */
  def pqDistortion(spark: SparkSession, dir: String): DataFrame =
    pqCodes(spark, dir)
      .select(col("sub"), round(col("d2") * lit(1e6)).cast("long").as("d2u"))
      .groupBy("sub")
      .agg(count(lit(1)).as("n_vecs"),
           sum("d2u").as("sum_d2_micro"),
           max("d2u").as("max_d2_micro"))
      .withColumn("mean_d2_micro", expr("sum_d2_micro div n_vecs"))
      .select("sub", "n_vecs", "sum_d2_micro", "max_d2_micro", "mean_d2_micro")
      .orderBy("sub")

  /** ADC (asymmetric distance computation) top-3: each query vector
    * precomputes its distance to every (sub, code) centroid ONCE — a
    * queries×8×16 table in exact integer micro-units — then a candidate's
    * approximate distance is 8 table lookups summed, never a 64-dim
    * float fold per candidate. The lookup table is broadcast; the codes
    * scan is embarrassingly parallel; per-(query, candidate) sums are
    * exact integers (the text_unigram_logprob discipline), so ranking is
    * engine- and order-invariant. */
  /** Candidates an ADC pass shortlists per query before exact re-rank —
    * static (the [[NProbe]] discipline) so the oracle composes the same
    * constant. */
  private[graft] val PqShortlist = 32

  /** ADC-ranked candidates per query, kept to the re-rank shortlist
    * (rn ≤ [[PqShortlist]]) — shared by the ADC top-k query and the
    * exact re-rank stage; memoized (tiny: queries×32 rows). */
  private def pqAdcRanked(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "pqadc"), {
      import org.apache.spark.sql.expressions.Window
      val dtab = pqSubvectors(spark, dir)
        .filter(col("vec_id") < PqQueries)
        .select(col("vec_id").as("q_id"), col("sub"), col("sv"), col("dxx"))
        .join(pqCodebook(spark, dir), Seq("sub"))
        .select(col("q_id"), col("sub"), col("code"),
          round((col("dxx") - lit(2.0) * dotCols(col("sv"), col("cv")) + col("dcc"))
                  * lit(1e6)).cast("long").as("t"))
      val w = Window.partitionBy("q_id").orderBy(col("adist").asc, col("vec_id").asc)
      pqCodes(spark, dir).select("vec_id", "sub", "code")
        .join(broadcast(dtab), Seq("sub", "code"))
        .filter(col("vec_id") =!= col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(Num.rnd(sum("t").cast("double") / lit(1e6), 6).as("adist"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= PqShortlist)
        .select("q_id", "vec_id", "rn", "adist")
        .localCheckpoint()
    })

  def pqAdcTopK(spark: SparkSession, dir: String): DataFrame =
    pqAdcRanked(spark, dir)
      .filter(col("rn") <= 3)
      .select("q_id", "vec_id", "rn", "adist")

  /** The full PQ serving path: ADC shortlist ([[PqShortlist]] table-
    * lookup candidates per query — cheap, compressed-domain) then EXACT
    * squared-L2 re-rank of only those candidates against the float
    * vectors (the recall-repair step every production PQ index runs;
    * Jégou et al. §5). Per query the exact stage touches 32 vectors
    * regardless of corpus size — the 100 TB read pattern: codes stay
    * hot, floats are fetched for a constant-size shortlist. */
  def pqRerankTopK(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              dotCols(col("embedding"), col("embedding")).as("vv"))
    val q = emb.select(col("vec_id").as("q_id"), col("embedding").as("qv"),
                       col("vv").as("qq"))
      .filter(col("q_id") < PqQueries)
    val w = Window.partitionBy("q_id").orderBy(col("d2").asc, col("vec_id").asc)
    pqAdcRanked(spark, dir).select("q_id", "vec_id")
      .join(emb, Seq("vec_id"))
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        Num.rnd(col("qq") - lit(2.0) * dotCols(col("qv"), col("embedding"))
                  + col("vv"), 6).as("d2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("q_id", "vec_id", "rn", "d2")
  }

  // ---- IVF-PQ: the composed billion-vector serving shape ----

  /** Trained coarse centroids rebuilt to position-sorted lists — the
    * broadcast-size (cells×64) frame both residual stages join. */
  private def trainedCentroidList(spark: SparkSession, dir: String): DataFrame =
    ivfTrain(spark, dir)
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
                     x => x.getField("m")).as("cv"))

  /** Residual subvectors w.r.t. a (vec_id, cell) pair set: residual =
    * embedding − trained centroid of `cell` (float→double cast, then an
    * exact IEEE element-wise subtract — the 6-dp-rounded centroids are
    * identical doubles cross-engine), split into the [[PqSubs]]×
    * [[PqSubDim]] PQ geometry with per-subvector norms precomputed
    * (the file-wide invariant). Passing the HOME assignment gives the
    * index side; passing the probe set gives the per-probed-cell query
    * residuals — same code path, mirrored CTEs. */
  private[graft] def residualSubs(spark: SparkSession, dir: String,
                                  pairs: DataFrame): DataFrame =
    residualSubsWith(spark, dir, pairs, trainedCentroidList(spark, dir))

  /** [[residualSubs]] against a GIVEN centroid-list frame (cell, cv) —
    * the seam the persisted-index serve path reloads its coarse
    * centroids through. */
  private def residualSubsWith(spark: SparkSession, dir: String,
                               pairs: DataFrame, cents: DataFrame): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .join(pairs, Seq("vec_id"))
      .join(broadcast(cents), Seq("cell"))
      .select(col("vec_id"), col("cell"),
        zip_with(col("embedding").cast("array<double>"), col("cv"),
                 (a, b) => a - b).as("res"))
      .select(col("vec_id"), col("cell"),
              posexplode(array((0 until PqSubs).map { s =>
        slice(col("res"), s * PqSubDim + 1, PqSubDim)
      }: _*)))
      .select(col("vec_id"), col("cell"), col("pos").cast("int").as("sub"),
              col("col").as("sv"))
      .withColumn("dxx", dotCols(col("sv"), col("sv")))

  /** PQ codebook trained on per-cell RESIDUALS (vector − its trained
    * coarse centroid) — the IVF-PQ composition (Jégou et al. 2011 §III):
    * the coarse quantizer absorbs the corpus-scale structure, so the
    * residuals are small and near-isotropic and the 8×16 sub-codebooks
    * spend their precision where it matters. Same seed + one-Lloyd-step
    * discipline as [[pqCodebook]]. Memoized (owner: sim_ivfpq_topk):
    * the codes scan and the ADC table both start from it, and the memo
    * caps the train chain at one execution per (session, dir). */
  private[graft] def ivfpqCodebook(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "ivfpqcb"), {
      val home = ivfAssignTrained(spark, dir).select("vec_id", "cell")
      val rsubs = residualSubs(spark, dir, home)
      val seed = rsubs.filter(col("vec_id") < PqCodes)
        .select(col("sub"), col("vec_id").as("code"), col("sv").as("cv"),
                col("dxx").as("dcc"))
      val asg0 = pqAssign(rsubs, seed).select("vec_id", "sub", "code")
      rsubs.join(asg0, Seq("vec_id", "sub"))
        .groupBy("sub", "code")
        .agg(vecMeanD(col("sv")).as("mv"))
        .select(col("sub"), col("code"),
                transform(col("mv"), v => Num.rnd(v, 6)).as("cv"))
        .withColumn("dcc", dotCols(col("cv"), col("cv")))
        .localCheckpoint()
    })

  /** Residual PQ codes + home cell per vector — what an IVF-PQ index
    * persists: (cell, 8 codes) per vector, floats needed only for
    * re-rank. */
  private[graft] def ivfpqCodes(spark: SparkSession, dir: String): DataFrame = {
    val home = ivfAssignTrained(spark, dir).select("vec_id", "cell")
    pqAssign(residualSubs(spark, dir, home), ivfpqCodebook(spark, dir))
      .select("vec_id", "sub", "code")
      .join(home, Seq("vec_id"))
  }

  /** IVF-PQ search — the standard billion-vector serving shape, composed
    * from the two halves the repo already has: each query probes its
    * [[NProbe]] nearest TRAINED cells (the memoized
    * [[ivfTrainedRanked]] scan), computes its residual against EACH
    * probed cell's centroid, builds the per-(probe-cell, sub, code) ADC
    * table in exact integer micro-units, and scores exactly the
    * candidates whose home cell is probed — 8 BIGINT table lookups per
    * candidate, never a float fold. At 100 TB: codes are 9 small ints
    * per vector (hot memory), the ADC table is queries×NProbe×128 rows
    * (broadcast), candidates come only from probed cells (the inverted
    * list), and the integer sums make ranking engine- and
    * order-invariant. A candidate pairs with a query through at most
    * one cell (home is unique), so no dedup stage exists. */
  /** The IVF-PQ ADC ranking through rn ≤ [[PqShortlist]] — shared by
    * the top-k and the exact re-rank (the [[pqAdcRanked]] pattern
    * applied to the composed index). Memoized (owner: sim_ivfpq_topk,
    * which runs first in Bench's owner list). */
  private def ivfpqAdcRanked(spark: SparkSession, dir: String): DataFrame =
    CkptMemo.getOrElseUpdate((spark, dir, "ivfpqadc"), {
      ivfpqAdcFrom(spark, dir,
        ivfTrainedRanked(spark, dir), ivfpqCodebook(spark, dir),
        ivfpqCodes(spark, dir), trainedCentroidList(spark, dir))
        .localCheckpoint()
    })

  /** The IVF-PQ ADC serve composition over GIVEN index frames — shared
    * by [[ivfpqAdcRanked]] (session-lifetime memos) and
    * [[ivfpqIndexPersistSearch]] (the same index reloaded from durable
    * parquet), so the two serve paths can never diverge. `ranked` =
    * the coarse ranked assignment (vec_id, cell, rn ≤ NProbe); `cb` =
    * the residual codebook (sub, code, cv, dcc); `codes` = the postings
    * (vec_id, sub, code, cell); `cents` = the coarse centroid list
    * (cell, cv). */
  private def ivfpqAdcFrom(spark: SparkSession, dir: String,
                           ranked: DataFrame, cb: DataFrame,
                           codes: DataFrame, cents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probes = ranked
      .filter(col("rn") <= NProbe)
      .filter(col("vec_id") < PqQueries)
      .select("vec_id", "cell")
    val dtab = residualSubsWith(spark, dir, probes, cents)
      .join(broadcast(cb), Seq("sub"))
      .select(col("vec_id").as("q_id"), col("cell"), col("sub"), col("code"),
        round((col("dxx") - lit(2.0) * dotCols(col("sv"), col("cv"))
                 + col("dcc")) * lit(1e6)).cast("long").as("t"))
    val w = Window.partitionBy("q_id").orderBy(col("adist").asc, col("vec_id").asc)
    codes
      .join(broadcast(dtab), Seq("cell", "sub", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(Num.rnd(sum("t").cast("double") / lit(1e6), 6).as("adist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= PqShortlist)
      .select("q_id", "vec_id", "rn", "adist")
  }

  /** Persisted IVF-PQ index round trip (sim_ivfpq_persist) — the
    * [[ivfIndexPersistSearch]] rule applied to the COMPOSED index, i.e.
    * everything a production billion-vector index ships on disk: the
    * coarse centroids (long form, model-sized), the coarse ranked
    * postings (vec_id, cell, rn ≤ NProbe — PARTITIONED BY cell), the
    * residual PQ codebook (8×16 rows), and the PQ code postings
    * (vec_id, 8 codes + home cell — PARTITIONED BY cell, 9 small ints
    * per vector: the compressed domain that stays hot at 100 TB while
    * floats are only fetched for re-rank). Search runs entirely from
    * the RELOADED files via the shared [[ivfpqAdcFrom]] seam; the
    * oracle IS sim_ivfpq_topk's SQL unchanged — only the index's home
    * moved. IvfPqPersistSpec pins search equality and the layout. */
  def ivfpqIndexPersistSearch(spark: SparkSession, dir: String): DataFrame = {
    val centsPath = Tables.scratch("ivfpq_index_centroids")
    ivfTrain(spark, dir).write.mode("overwrite").parquet(centsPath)
    val postingsPath = Tables.scratch("ivfpq_index_postings")
    writePostings(ivfTrainedRanked(spark, dir), "cell", postingsPath)
    val cbPath = Tables.scratch("ivfpq_index_codebook")
    ivfpqCodebook(spark, dir).write.mode("overwrite").parquet(cbPath)
    val codesPath = Tables.scratch("ivfpq_index_codes")
    writePostings(ivfpqCodes(spark, dir), "cell", codesPath)
    val ranked = spark.read.parquet(postingsPath)
      .withColumn("cell", col("cell").cast("long"))
    val cents = spark.read.parquet(centsPath)
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
                     x => x.getField("m")).as("cv"))
    val cb = spark.read.parquet(cbPath)
    val codes = spark.read.parquet(codesPath)
      .withColumn("cell", col("cell").cast("long"))
    ivfpqAdcFrom(spark, dir, ranked, cb, codes, cents)
      .filter(col("rn") <= 3)
      .select("q_id", "vec_id", "rn", "adist")
  }

  def ivfpqTopK(spark: SparkSession, dir: String): DataFrame =
    ivfpqAdcRanked(spark, dir)
      .filter(col("rn") <= 3)
      .select("q_id", "vec_id", "rn", "adist")

  /** IVF-PQ + exact re-rank — the COMPLETE billion-vector serving path
    * (coarse quantizer prunes cells → residual PQ codes rank in the
    * compressed domain → float re-rank repairs the shortlist): the
    * [[pqRerankTopK]] recall-repair stage applied to the composed
    * index. Per query the exact stage fetches [[PqShortlist]] float
    * vectors regardless of corpus size — at 100 TB the codes stay hot
    * in memory, the floats are a constant-size point lookup, and the
    * candidate generation never leaves the probed cells. */
  def ivfpqRerankTopK(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              dotCols(col("embedding"), col("embedding")).as("vv"))
    val q = emb.select(col("vec_id").as("q_id"), col("embedding").as("qv"),
                       col("vv").as("qq"))
      .filter(col("q_id") < PqQueries)
    val w = Window.partitionBy("q_id").orderBy(col("d2").asc, col("vec_id").asc)
    ivfpqAdcRanked(spark, dir).select("q_id", "vec_id")
      .join(emb, Seq("vec_id"))
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        Num.rnd(col("qq") - lit(2.0) * dotCols(col("qv"), col("embedding"))
                  + col("vv"), 6).as("d2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("q_id", "vec_id", "rn", "d2")
  }

  // ---- generated oracle SQL ----
  // The oracle encodes the sf0.01 index regime: numPlanes(500) == 8 and
  // ivfCells(500) == 16 by the sizing formulas above, and no sf0.01
  // bucket/cell approaches MaxBucketCandidates, so the adaptive Spark
  // plans produce byte-identical results to this fixed-constant SQL at
  // the scale the driver verifies.

  private def planeSqlLit(j: Int): String =
    plane(j).map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  /** One packed sign word as DuckDB SQL — [[packWord]]'s mirror: 1-based
    * element i in [lo1, lo1+32) contributes bit (i − lo1). list_sum over
    * BIGINT returns HUGEINT, hence the outer cast. */
  private def signWordSql(lo1: Int): String =
    s"CAST(list_sum(list_transform(range($lo1, ${lo1 + 32}), i -> " +
    "CASE WHEN embedding[i] >= 0 THEN (CAST(1 AS BIGINT) << (i - " +
    s"$lo1)) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"

  /** Shared sign-bit chain (sg-prefixed names — CTE-namespace rule):
    * packed words `sgpk`, probe split `sgpr` (vec_id < 100), Hamming
    * distances `sgh0`, shortlist `sgsh` (top-8 by hd, b_id) — mirrors
    * [[signShortlist]]; serves emb_sign_bits / sim_hamming_topk /
    * emb_sign_recall (keep all three in lockstep). */
  private val signCteSql: String =
    s"sgpk AS (SELECT vec_id, ${signWordSql(1)} AS w1, " +
    s"${signWordSql(33)} AS w2 FROM embeddings), " +
    "sgpr AS (SELECT vec_id AS a_id, w1 AS q1, w2 AS q2 FROM sgpk " +
    "WHERE vec_id < 100), " +
    "sgh0 AS (SELECT sgpr.a_id, sgpk.vec_id AS b_id, " +
    "CAST(bit_count(xor(sgpk.w1, sgpr.q1)) + " +
    "bit_count(xor(sgpk.w2, sgpr.q2)) AS INTEGER) AS hd " +
    "FROM sgpk CROSS JOIN sgpr WHERE sgpk.vec_id <> sgpr.a_id), " +
    "sgsh AS (SELECT a_id, b_id, hd FROM (SELECT sgh0.*, " +
    "row_number() OVER (PARTITION BY a_id ORDER BY hd ASC, b_id ASC) AS rh " +
    "FROM sgh0) t WHERE rh <= 8)"

  /** JL plane k as a DuckDB literal (plane index [[JlPlaneBase]] + k —
    * keep in lockstep with [[jlWide]]). */
  private def jlListSql(k: Int): String =
    plane(JlPlaneBase + k).map(v => if (v > 0) "1.0" else "-1.0")
      .mkString("[", ",", "]")

  /** Shared JL chain (jl-prefixed names): per-vector 16 integer
    * micro-coordinates — mirrors [[jlWide]]. */
  private def jlCteSql: String =
    "jlw AS (SELECT vec_id, [" +
    (0 until JlDims).map(k =>
      "CAST(round(list_dot_product(embedding::DOUBLE[], " +
      s"${jlListSql(k)}) * 1e6) AS BIGINT)").mkString(", ") +
    "] AS jl FROM embeddings)"

  private def bucketSql: String =
    (0 until 8).map { j =>
      s"(CASE WHEN list_dot_product(embedding::DOUBLE[], ${planeSqlLit(j)}) > 0 " +
        s"THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_norms"        -> norms _,
    "sim_brute_topk"   -> bruteTopK _,
    "sim_range_search" -> rangeSearch _,
    "emb_cell_purity"  -> cellPurity _,
    "emb_silhouette"   -> silhouette _,
    "emb_sim_hist"     -> simHist _,
    "emb_drift_report" -> driftReport _,
    "emb_isotropy"     -> isotropy _,
    "sim_lsh_buckets"  -> lshBuckets _,
    "sim_bucket_entropy" -> bucketEntropy _,
    "sim_graph_search" -> ((s, d) => graphSearch(s, d)),
    "sim_graph_search_eval" -> ((s, d) => graphSearchEval(s, d)),
    "sim_eval_frontier" -> evalFrontier _,
    "emb_cell_balance" -> cellBalance _,
    "sim_ann_topk"     -> annTopK _,
    "dedup_embedding"  -> embeddingNearDup _,
    "sim_ivf_assign"   -> ivfAssign _,
    "sim_cell_split"   -> cellSplit _,
    "sim_split_topk"   -> splitTopK _,
    "sim_split_recall_eval" -> ((s, d) => splitRecallEval(s, d)),
    "sim_split_persist" -> splitIndexPersistSearch _,
    "sim_cell_split_deep" -> ((s, d) => cellSplitDeep(s, d)),
    "sim_split_deep_topk" -> ((s, d) => splitDeepTopK(s, d)),
    "sim_split_deep_recall_eval" -> ((s, d) => splitDeepRecallEval(s, d)),
    "sim_split_plan" -> splitPlan _,
    "sim_split_serve_planned" -> splitServePlanned _,
    "sim_split_incremental" -> splitIncremental _,
    "sim_split_incremental_serve" -> splitIncrementalServe _,
    "sim_split_incremental_deep" -> splitIncrementalDeep _,
    "sim_knn_mutual_split" -> knnMutualSplit _,
    "sim_split_deep_persist" -> ((s, d) => splitDeepIndexPersistSearch(s, d)),
    "sim_cell_split_trained" -> cellSplitTrained _,
    "sim_split_topk_trained" -> splitTopKTrained _,
    "sim_trained_recall_eval" -> ((s, d) => trainedRecallEval(s, d)),
    "sim_split_trained_recall_eval" ->
      ((s, d) => trainedSplitRecallEval(s, d)),
    "sim_split_band_topk" -> splitBandTopK _,
    "sim_split_band_recall_eval" -> ((s, d) => splitBandRecallEval(s, d)),
    "sim_split_band_sweep" -> ((s, d) => splitBandSweep(s, d)),
    "sim_split_band_planned" -> splitBandPlanned _,
    "sim_ivf_topk"     -> ivfTopK _,
    "sim_knn_mutual"   -> knnMutual _,
    "sim_nn_descent"   -> nnDescent _,
    "sim_nn_descent_eval" -> ((s, d) => nnDescentEval(s, d)),
    "sim_ivf_recall_eval" -> ((s, d) => ivfRecallEval(s, d)),
    "sim_recall_at_k" -> ((s, d) => recallAtK(s, d)),
    "sim_mrr_eval" -> ((s, d) => mrrEval(s, d)),
    "sim_ivf_delete_search" -> ((s, d) => ivfDeleteSearch(s, d)),
    "sim_filtered_topk" -> ((s, d) => filteredTopK(s, d)),
    "sim_filtered_recall" -> ((s, d) => filteredRecallEval(s, d)),
    "sim_nprobe_sweep" -> ((s, d) => nprobeSweep(s, d)),
    "sim_nprobe_planned" -> ((s, d) => nprobePlanned(s, d)),
    "emb_int8_recall"  -> ((s, d) => int8RecallEval(s, d)),
    "emb_sign_bits"    -> signBits _,
    "sim_hamming_topk" -> ((s, d) => hammingTopK(s, d)),
    "emb_sign_recall"  -> ((s, d) => signRecallEval(s, d)),
    "sim_rrf_fusion"   -> ((s, d) => rrfFusion(s, d)),
    "sim_rrf_recall"   -> ((s, d) => rrfRecallEval(s, d)),
    "emb_rand_proj"    -> randProj _,
    "sim_jl_recall"    -> ((s, d) => jlRecallEval(s, d)),
    "emb_matryoshka_recall" -> ((s, d) => matryoshkaRecallEval(s, d)),
    "sim_ivf_train"    -> ivfTrain _,
    "sim_ivf_train_iter" -> ivfTrainIter _,
    "sim_ivf_train_hist" -> ivfTrainHist _,
    "sim_ivf_assign_trained" -> ivfAssignTrained _,
    "emb_outlier_report" -> outlierReport _,
    "sim_ivf_topk_trained" -> ivfTopKTrained _,
    "sim_index_persist" -> ivfIndexPersistSearch _,
    "sim_ivf_upsert_search" -> ((s, d) => ivfUpsertSearch(s, d)),
    "dedup_semantic"   -> semanticDedup _,
    "dedup_semantic_curve" -> semanticCurve _,
    "dedup_semantic_eval" -> ((s, d) => semanticDedupEval(s, d)),
    "sim_ivf_train_delta" -> ivfTrainDelta _,
    "sim_ivf_incremental_assign" -> ivfIncrementalAssign _,
    "sim_pq_codes"     -> pqCodes _,
    "sim_pq_distortion" -> pqDistortion _,
    "sim_pq_adc_topk"  -> pqAdcTopK _,
    "sim_pq_rerank_topk" -> pqRerankTopK _,
    "sim_ivfpq_topk"   -> ivfpqTopK _,
    "sim_ivfpq_persist" -> ivfpqIndexPersistSearch _,
    "sim_ivfpq_rerank_topk" -> ivfpqRerankTopK _,
    "emb_centroid_by_source" -> centroidBySource _,
    "emb_quantize"     -> quantize _,
    "emb_pca_power"    -> pcaPower _,
    "emb_pca_top2"     -> pcaTop2 _,
    "emb_pca_project"  -> pcaProject _,
    "emb_whiten"       -> whiten _,
    "sim_ivf_assign_whitened" -> ivfAssignWhitened _,
    "emb_dim_stats"    -> dimStats _,
    "emb_centroid_sim" -> centroidSim _,
    "emb_label_eval"   -> labelEval _,
    "emb_knn_label_eval" -> knnLabelEval _)

  /** Shared centroid CTE: 1-based list positions via range-unnest (DuckDB
    * v1.0 has no WITH ORDINALITY), re-based to 0 to match posexplode. */
  private val centroidCte: String =
    "u AS (SELECT d.source, p.pos1, CAST(e.embedding[p.pos1] AS DOUBLE) AS val " +
    "FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id, " +
    "UNNEST(range(1, len(e.embedding)+1)) AS p(pos1)), " +
    "cent AS (SELECT source, pos1, round((avg(val)) * 1e6) / 1e6 AS m " +
    "FROM u GROUP BY source, pos1)"

  /** Shared CTE chain: seed assignment (= sim_ivf_assign) feeding the
    * Lloyd-step centroid recomputation `tr`. */
  private val ivfTrainCte: String =
    "c AS (SELECT vec_id AS cell, embedding AS cv FROM embeddings WHERE vec_id < 16), " +
    "s AS (SELECT e.vec_id, c.cell, " +
    "round((list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[])) * 1e6) / 1e6 AS csim " +
    "FROM embeddings e CROSS JOIN c), " +
    "asg AS (SELECT vec_id, cell FROM (SELECT vec_id, cell, row_number() OVER (" +
    "PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn FROM s) WHERE rn = 1), " +
    "tr AS (SELECT a.cell, p.pos1, " +
    "round((avg(CAST(e.embedding[p.pos1] AS DOUBLE))) * 1e6) / 1e6 AS m " +
    "FROM embeddings e JOIN asg a ON e.vec_id = a.vec_id, " +
    "UNNEST(range(1, len(e.embedding)+1)) AS p(pos1) " +
    "GROUP BY a.cell, p.pos1)"

  /** Shared incremental-training chain: the FROZEN base-half quantizer
    * (seeds vec_id < 16, corpus vec_id < 250, one Lloyd step) ending in
    * the list-form trained centroids `iicl` — composed by
    * sim_ivf_incremental_assign (batch-assignment tail `iib`) and
    * sim_ivf_upsert_search (up-prefixed rebuild tail). CTE names
    * iic/iis/iia/iit/iicl belong to this chain (namespace rule). Split
    * 250 / seeds 16 are the CountMemo n/2 and ivfCells-clamp-floor
    * constants at sf0.01 — lockstep with the runtime knobs. */
  private val incAssignCteSql: String =
    "iic AS (SELECT vec_id AS cell, embedding AS cv " +
    "FROM embeddings WHERE vec_id < 16), " +
    "iis AS (SELECT e.vec_id, c.cell, " +
    "round((list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[])) * 1e6) / 1e6 AS csim " +
    "FROM embeddings e CROSS JOIN iic c WHERE e.vec_id < 250), " +
    "iia AS (SELECT vec_id, cell FROM (SELECT vec_id, cell, " +
    "row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn " +
    "FROM iis) WHERE rn = 1), " +
    "iit AS (SELECT a.cell, p.pos1, " +
    "round((avg(CAST(e.embedding[p.pos1] AS DOUBLE))) * 1e6) / 1e6 AS m " +
    "FROM embeddings e JOIN iia a ON e.vec_id = a.vec_id, " +
    "UNNEST(range(1, len(e.embedding)+1)) AS p(pos1) " +
    "GROUP BY a.cell, p.pos1), " +
    "iicl AS (SELECT cell, list(m ORDER BY pos1) AS cv FROM iit GROUP BY cell)"

  /** The full trained-index search oracle (tc/s2/pr2 trained chain +
    * the probe/home/cap/rerank composition) — registered VERBATIM for
    * BOTH sim_ivf_topk_trained and sim_index_persist: the persisted
    * round trip changes where the index lives, never what it serves. */
  /** The trained chain through `home` (trained centroids → full
    * ranking → probes/home) — the prefix [[trainedTopKOracleSql]]
    * splices its serve tail onto, and the source relation
    * sim_cell_split_trained's split round runs over. */
  private lazy val trainedChainToHomeSql: String =
    s"WITH $ivfTrainCte, " +
    "tc AS (SELECT cell, list(m ORDER BY pos1) AS cv FROM tr GROUP BY cell), " +
    "s2 AS (SELECT e.vec_id, t.cell, " +
    "round((list_cosine_similarity(e.embedding::DOUBLE[], t.cv)) * 1e6) / 1e6 AS csim " +
    "FROM embeddings e CROSS JOIN tc t), " +
    "pr2 AS (SELECT vec_id, cell, row_number() OVER (" +
    "PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn FROM s2), " +
    s"probes AS (SELECT vec_id, cell FROM pr2 WHERE rn <= $NProbe), " +
    "home AS (SELECT vec_id, cell FROM pr2 WHERE rn = 1)"

  /** The trained serve chain through `r` — the prefix the trained
    * top-k select AND the `trained` recall leg's eval tail both
    * compose (serve and eval can never drift). */
  private lazy val trainedServeChainSql: String =
    trainedChainToHomeSql + ", " +
    "m2 AS (SELECT e.vec_id, e.embedding, p.cell FROM embeddings e JOIN probes p ON e.vec_id = p.vec_id), " +
    "bc AS (SELECT e.vec_id, e.embedding, h.cell FROM embeddings e JOIN home h ON e.vec_id = h.vec_id " +
    s"QUALIFY row_number() OVER (PARTITION BY h.cell ORDER BY ${saltOrdSql("e.vec_id")}, e.vec_id) <= 1024), " +
    "p AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
    "round((list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
    "FROM m2 x JOIN bc y ON x.cell = y.cell AND x.vec_id <> y.vec_id), " +
    "r AS (SELECT a_id, b_id, sim, row_number() OVER (PARTITION BY a_id " +
    "ORDER BY sim DESC, b_id ASC) AS rn FROM p)"

  private lazy val trainedTopKOracleSql: String =
    trainedServeChainSql + " SELECT a_id, b_id, rn, sim FROM r WHERE rn <= 3"

  /** The shared-truth recall-eval ORACLE tail over a ranked serve
    * relation (a_id, b_id, rn ordered) — `<pfx>ex/xr/sc/ht/cm` names
    * claimed; probe literal 100 + the integer micro metric forms (the
    * eval-family contract, [[recallVsSharedTruth]]'s mirror).
    * Generator for NEW eval oracles only — the st/dz/sb tails predate
    * it and stay hand-written (byte-frozen by their chains). */
  private def recallEvalTailSqlFor(pfx: String, rel: String): String =
    s"${pfx}ex AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
    "round((list_cosine_similarity(x.embedding::DOUBLE[], " +
    "y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
    "FROM embeddings x JOIN embeddings y ON y.vec_id <> x.vec_id " +
    "WHERE x.vec_id < 100), " +
    s"${pfx}xr AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
    "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) " +
    s"AS rn FROM ${pfx}ex) e WHERE rn <= 3), " +
    s"${pfx}sc AS (SELECT a_id, b_id FROM $rel " +
    "WHERE rn <= 3 AND a_id < 100), " +
    s"${pfx}ht AS (SELECT a_id, b_id FROM ${pfx}xr " +
    s"JOIN ${pfx}sc USING (a_id, b_id)), " +
    s"${pfx}cm AS (SELECT (SELECT count(*) FROM ${pfx}xr) AS n_truth, " +
    s"(SELECT count(*) FROM ${pfx}sc) AS n_screen, " +
    s"(SELECT count(*) FROM ${pfx}ht) AS n_hit) " +
    "SELECT CAST(n_truth AS BIGINT) AS n_truth, " +
    "CAST(n_screen AS BIGINT) AS n_screen, " +
    "CAST(n_hit AS BIGINT) AS n_hit, " +
    "CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
    "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_truth END AS recall_micro, " +
    "CASE WHEN n_screen = 0 THEN CAST(0 AS BIGINT) " +
    "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_screen END " +
    s"AS precision_micro FROM ${pfx}cm"

  /** sim_trained_recall_eval's oracle — the eval tail over the trained
    * serve chain's `r`. */
  private def trainedRecallOracleSql: String =
    trainedServeChainSql + ", " + recallEvalTailSqlFor("tre", "r")

  /** sim_split_trained_recall_eval's oracle — the eval tail over the
    * trained-split serve chain's `tstr`. */
  private def trainedSplitRecallOracleSql: String =
    trainedSplitServeChainSql + ", " + recallEvalTailSqlFor("tse", "tstr")

  /** The IVF-PQ ADC top-k oracle — registered VERBATIM for BOTH
    * sim_ivfpq_topk and sim_ivfpq_persist (the storage-moved rule). */
  private lazy val ivfpqTopKOracleSql: String =
    s"WITH $ivfpqCteSql " +
    "SELECT q_id, vec_id, CAST(rn AS INTEGER) AS rn, adist FROM (" +
    "SELECT q_id, vec_id, round((CAST(ts AS DOUBLE) / 1e6) * 1e6) / 1e6 AS adist, " +
    "row_number() OVER (PARTITION BY q_id ORDER BY ts ASC, vec_id ASC) AS rn " +
    "FROM vad) WHERE rn <= 3"

  /** Unrolled Lloyd trajectory as CTEs: `tr1` = the shared one-step
    * chain ([[ivfTrainCte]]'s `tr`), then per round r: list-form
    * centroids `cl(r-1)`, re-assignment `a r` (same rounded cosine +
    * tie-break), recomputed means `tr r`. The STATIC unroll depth is
    * [[LloydMaxRounds]] — in lockstep with the Spark loop because the
    * early-stop provably can't fire at sf0.01 (IvfTrainIterSpec pins
    * d2 > 0 per round). */
  private def lloydCteSql(rounds: Int): String = {
    val sb = new StringBuilder(ivfTrainCte)
    sb ++= ", tr1 AS (SELECT cell, pos1, m FROM tr)"
    for (r <- 2 to rounds) {
      val p = r - 1
      sb ++= s", cl$p AS (SELECT cell, list(m ORDER BY pos1) AS cv " +
        s"FROM tr$p GROUP BY cell)"
      sb ++= s", s$r AS (SELECT e.vec_id, t.cell, " +
        "round((list_cosine_similarity(e.embedding::DOUBLE[], t.cv)) * 1e6) / 1e6 AS csim " +
        s"FROM embeddings e CROSS JOIN cl$p t)"
      sb ++= s", a$r AS (SELECT vec_id, cell FROM (SELECT vec_id, cell, " +
        "row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn " +
        s"FROM s$r) WHERE rn = 1)"
      sb ++= s", tr$r AS (SELECT a.cell, p.pos1, " +
        "round((avg(CAST(e.embedding[p.pos1] AS DOUBLE))) * 1e6) / 1e6 AS m " +
        s"FROM embeddings e JOIN a$r a ON e.vec_id = a.vec_id, " +
        "UNNEST(range(1, len(e.embedding)+1)) AS p(pos1) " +
        "GROUP BY a.cell, p.pos1)"
    }
    sb.toString
  }

  /** One deflated power round as CTEs (matvec over `ce` from iterate
    * `in`.v, renorm to `et r`, orthogonalize against v2c scaled by
    * vq.vv, renorm to `ew r`.`vcol`) — mirrors [[pcaTop2]]'s `round`
    * 1:1. */
  private def pcaTop2RoundSql(r: Int, in: String, vcol: String): String =
    s"es$r AS (SELECT ce.vec_id, CAST(sum(ce.c * $in.v) AS BIGINT) AS sc " +
    s"FROM ce JOIN $in USING (pos) GROUP BY ce.vec_id), " +
    s"eu$r AS (SELECT ce.pos, CAST(sum(ce.c * es$r.sc) AS BIGINT) AS u " +
    s"FROM ce JOIN es$r USING (vec_id) GROUP BY ce.pos), " +
    s"em$r AS (SELECT max(abs(u)) AS m FROM eu$r), " +
    s"et$r AS MATERIALIZED (SELECT pos, (CASE WHEN u < 0 THEN -1 ELSE 1 END) * " +
    s"((abs(u) * 100) // m) AS t FROM eu$r CROSS JOIN em$r), " +
    s"ed$r AS (SELECT CAST(sum(et$r.t * v2c.v2) AS BIGINT) AS tv " +
    s"FROM et$r JOIN v2c USING (pos)), " +
    s"eg$r AS (SELECT et$r.pos, et$r.t * vq.vv - ed$r.tv * v2c.v2 AS g " +
    s"FROM et$r JOIN v2c USING (pos) CROSS JOIN vq CROSS JOIN ed$r), " +
    s"eh$r AS (SELECT max(abs(g)) AS m FROM eg$r), " +
    s"ew$r AS MATERIALIZED (SELECT pos, (CASE WHEN g < 0 THEN -1 ELSE 1 END) * " +
    s"((abs(g) * 100) // m) AS $vcol FROM eg$r CROSS JOIN eh$r)"

  /** Squared-L2 oracle expression with the EXACT association of
    * [[pqAssign]]: ((sv·sv − 2·sv·cv) + cv·cv), identical IEEE ops over
    * identical inputs ⇒ bit-identical before the rounding. */
  private def pqD2Sql(sv: String, cv: String): String =
    s"((list_dot_product($sv, $sv) - 2 * list_dot_product($sv, $cv)) + " +
    s"list_dot_product($cv, $cv))"

  /** PQ CTE chain: subvectors `psub`, seed codebook `pcb0`, seed assign
    * `pa0`, one-Lloyd-step trained codebook `ptr`/`pcl`, final codes
    * `pfin` — the [[pqCodebook]]+[[pqCodes]] composition with the same
    * constants (8 subspaces × 8 dims, 16 codes). */
  private def pqCteSql: String = {
    val d0 = pqD2Sql("p.sv", "c.cv")
    s"psub AS (SELECT e.vec_id, CAST(s.sub AS INTEGER) AS sub, " +
    s"(e.embedding[s.sub*$PqSubDim+1 : s.sub*$PqSubDim+$PqSubDim])::DOUBLE[] AS sv " +
    s"FROM embeddings e, UNNEST(range(0, $PqSubs)) AS s(sub)), " +
    s"pcb0 AS (SELECT sub, vec_id AS code, sv AS cv FROM psub WHERE vec_id < $PqCodes), " +
    s"pax AS (SELECT p.vec_id, p.sub, c.code, round(($d0) * 1e6) / 1e6 AS d2 " +
    "FROM psub p JOIN pcb0 c USING (sub)), " +
    "pa0 AS (SELECT vec_id, sub, code FROM (SELECT vec_id, sub, code, " +
    "row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, code ASC) AS rn " +
    "FROM pax) WHERE rn = 1), " +
    "ptr AS (SELECT a.sub, a.code, p.pos1, round((avg(s.sv[p.pos1])) * 1e6) / 1e6 AS m " +
    "FROM psub s JOIN pa0 a ON s.vec_id = a.vec_id AND s.sub = a.sub, " +
    s"UNNEST(range(1, ${PqSubDim + 1})) AS p(pos1) GROUP BY a.sub, a.code, p.pos1), " +
    "pcl AS (SELECT sub, code, list(m ORDER BY pos1) AS cv FROM ptr GROUP BY sub, code), " +
    s"pfx AS (SELECT p.vec_id, p.sub, c.code, round(($d0) * 1e6) / 1e6 AS d2 " +
    "FROM psub p JOIN pcl c USING (sub)), " +
    "pfin AS (SELECT vec_id, sub, code, d2 FROM (SELECT vec_id, sub, code, d2, " +
    "row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, code ASC) AS rn " +
    "FROM pfx) WHERE rn = 1)"
  }

  /** [[pqCteSql]] extended with the ADC ranking: query distance table
    * `qd` (exact integer micro-units), per-candidate sums `ad`, ranked
    * shortlist `rk` — shared by the ADC top-k and re-rank oracles. */
  private def pqAdcCteSql: String =
    s"$pqCteSql, " +
    "qd AS (SELECT q.vec_id AS q_id, q.sub, c.code, " +
    s"CAST(round((${pqD2Sql("q.sv", "c.cv")}) * 1e6) AS BIGINT) AS t " +
    s"FROM psub q JOIN pcl c USING (sub) WHERE q.vec_id < $PqQueries), " +
    "ad AS (SELECT d.q_id, f.vec_id, sum(d.t) AS ts FROM pfin f " +
    "JOIN qd d ON f.sub = d.sub AND f.code = d.code AND f.vec_id <> d.q_id " +
    "GROUP BY 1, 2), " +
    "rk AS (SELECT q_id, vec_id, round((CAST(ts AS DOUBLE) / 1e6) * 1e6) / 1e6 AS adist, " +
    "row_number() OVER (PARTITION BY q_id ORDER BY ts ASC, vec_id ASC) AS rn " +
    s"FROM ad QUALIFY rn <= $PqShortlist)"

  /** Per-(vec_id, cell) residual subvector CTE body — element-wise
    * (embedding − trained centroid) over the PQ geometry, mirroring
    * [[residualSubs]]; `src` must provide (vec_id, cell). */
  private def residualSubSql(src: String): String =
    s"SELECT h.vec_id, h.cell, CAST(s.sub AS INTEGER) AS sub, " +
    s"list_transform(range(1, ${PqSubDim + 1}), i -> " +
    s"CAST(e.embedding[s.sub*$PqSubDim + i] AS DOUBLE) - t.cv[s.sub*$PqSubDim + i]) AS sv " +
    s"FROM $src h JOIN embeddings e ON e.vec_id = h.vec_id " +
    s"JOIN tc t ON t.cell = h.cell, UNNEST(range(0, $PqSubs)) AS s(sub)"

  /** IVF-PQ oracle chain: trained coarse ranking (tc/s2/pr2 — the
    * sim_ivf_assign_trained chain, keep in lockstep), home + probe
    * splits, residual subvectors, residual codebook (seed + one Lloyd
    * step, the pqCteSql discipline), final codes `vfin`, query ADC
    * table `vqd`, candidate sums `vad`. */
  private def ivfpqCteSql: String = {
    val d0 = pqD2Sql("p.sv", "c.cv")
    s"$ivfTrainCte, " +
    "tc AS (SELECT cell, list(m ORDER BY pos1) AS cv FROM tr GROUP BY cell), " +
    "s2 AS (SELECT e.vec_id, t.cell, " +
    "round((list_cosine_similarity(e.embedding::DOUBLE[], t.cv)) * 1e6) / 1e6 AS csim " +
    "FROM embeddings e CROSS JOIN tc t), " +
    "pr2 AS (SELECT vec_id, cell, row_number() OVER (" +
    "PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn FROM s2), " +
    "vhome AS (SELECT vec_id, cell FROM pr2 WHERE rn = 1), " +
    s"vprobes AS (SELECT vec_id, cell FROM pr2 WHERE rn <= $NProbe " +
    s"AND vec_id < $PqQueries), " +
    s"vrsub AS (${residualSubSql("vhome")}), " +
    s"vcb0 AS (SELECT sub, vec_id AS code, sv AS cv FROM vrsub WHERE vec_id < $PqCodes), " +
    s"vax AS (SELECT p.vec_id, p.sub, c.code, round(($d0) * 1e6) / 1e6 AS d2 " +
    "FROM vrsub p JOIN vcb0 c USING (sub)), " +
    "va0 AS (SELECT vec_id, sub, code FROM (SELECT vec_id, sub, code, " +
    "row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, code ASC) AS rn " +
    "FROM vax) WHERE rn = 1), " +
    "vtr AS (SELECT a.sub, a.code, p.pos1, round((avg(s.sv[p.pos1])) * 1e6) / 1e6 AS m " +
    "FROM vrsub s JOIN va0 a ON s.vec_id = a.vec_id AND s.sub = a.sub, " +
    s"UNNEST(range(1, ${PqSubDim + 1})) AS p(pos1) GROUP BY a.sub, a.code, p.pos1), " +
    "vcl AS (SELECT sub, code, list(m ORDER BY pos1) AS cv FROM vtr GROUP BY sub, code), " +
    s"vfx AS (SELECT p.vec_id, p.sub, c.code, round(($d0) * 1e6) / 1e6 AS d2 " +
    "FROM vrsub p JOIN vcl c USING (sub)), " +
    "vfin AS (SELECT vec_id, sub, code FROM (SELECT vec_id, sub, code, " +
    "row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, code ASC) AS rn " +
    "FROM vfx) WHERE rn = 1), " +
    s"vqs AS (${residualSubSql("vprobes")}), " +
    "vqd AS (SELECT p.vec_id AS q_id, p.cell, p.sub, c.code, " +
    s"CAST(round(($d0) * 1e6) AS BIGINT) AS t " +
    "FROM vqs p JOIN vcl c USING (sub)), " +
    "vcand AS (SELECT f.vec_id, h.cell, f.sub, f.code FROM vfin f " +
    "JOIN vhome h ON h.vec_id = f.vec_id), " +
    "vad AS (SELECT d.q_id, c.vec_id, sum(d.t) AS ts FROM vcand c " +
    "JOIN vqd d ON c.cell = d.cell AND c.sub = d.sub AND c.code = d.code " +
    "AND c.vec_id <> d.q_id GROUP BY 1, 2)"
  }

  private val oracleBase: Map[String, String] = Map(
    "sim_pq_codes" ->
      s"WITH $pqCteSql SELECT vec_id, sub, code, d2 FROM pfin",
    // per-sub distortion over the SAME pfin chain; d2 micronized
    // BEFORE summing (6-dp grain -> exact integers), nonneg div —
    // lockstep with pqDistortion
    "sim_pq_distortion" ->
      (s"WITH $pqCteSql " +
       "SELECT sub, count(*) AS n_vecs, " +
       "CAST(sum(CAST(round(d2 * 1e6) AS BIGINT)) AS BIGINT) AS sum_d2_micro, " +
       "CAST(max(CAST(round(d2 * 1e6) AS BIGINT)) AS BIGINT) AS max_d2_micro, " +
       "CAST(sum(CAST(round(d2 * 1e6) AS BIGINT)) AS BIGINT) // count(*) AS mean_d2_micro " +
       "FROM pfin GROUP BY sub ORDER BY sub"),
    // ADC: per-query (sub, code) distance table in exact integer
    // micro-units; candidate distance = sum of 8 lookups (exact BIGINT
    // sum, order-invariant); rank by the sum, ties to the lower id.
    "sim_pq_adc_topk" ->
      (s"WITH $pqAdcCteSql " +
       "SELECT q_id, vec_id, CAST(rn AS INTEGER) AS rn, adist FROM rk WHERE rn <= 3"),
    // serving path: ADC shortlist (rn <= 32) then exact squared-L2
    // re-rank against the float vectors, same ((qq - 2qv) + vv)
    // association as the Spark side
    "sim_pq_rerank_topk" ->
      (s"WITH $pqAdcCteSql, " +
       s"sl AS (SELECT q_id, vec_id FROM rk WHERE rn <= $PqShortlist), " +
       "ex AS (SELECT s.q_id, s.vec_id, " +
       "round(((list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]) - " +
       "2 * list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[])) + " +
       "list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * 1e6) / 1e6 AS d2 " +
       "FROM sl s JOIN embeddings e ON e.vec_id = s.vec_id " +
       "JOIN embeddings q ON q.vec_id = s.q_id) " +
       "SELECT q_id, vec_id, CAST(rn AS INTEGER) AS rn, d2 FROM (" +
       "SELECT q_id, vec_id, d2, row_number() OVER (" +
       "PARTITION BY q_id ORDER BY d2 ASC, vec_id ASC) AS rn FROM ex) " +
       "WHERE rn <= 3"),
    // IVF-PQ: residual codebook within trained coarse cells, ADC over
    // probed cells only — the integer micro-unit sum ranks identically
    // on both engines (order-invariant BIGINT)
    "sim_ivfpq_topk" -> ivfpqTopKOracleSql,
    // persisted composed-index round trip: the oracle IS
    // sim_ivfpq_topk's, UNCHANGED — centroids/postings/codebook/codes
    // moved to parquet, the search they serve did not (the
    // dedup_index_persist / sim_index_persist rule)
    "sim_ivfpq_persist" -> ivfpqTopKOracleSql,
    // composed-index re-rank: the sim_ivfpq_topk ADC chain widened to
    // the shortlist, then the sim_pq_rerank_topk exact-L2 stage verbatim
    // (keep all three in lockstep)
    "sim_ivfpq_rerank_topk" ->
      (s"WITH $ivfpqCteSql, " +
       "irk AS (SELECT q_id, vec_id, row_number() OVER (" +
       "PARTITION BY q_id ORDER BY ts ASC, vec_id ASC) AS rn FROM vad), " +
       s"isl AS (SELECT q_id, vec_id FROM irk WHERE rn <= $PqShortlist), " +
       "iex AS (SELECT s.q_id, s.vec_id, " +
       "round(((list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]) - " +
       "2 * list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[])) + " +
       "list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * 1e6) / 1e6 AS d2 " +
       "FROM isl s JOIN embeddings e ON e.vec_id = s.vec_id " +
       "JOIN embeddings q ON q.vec_id = s.q_id) " +
       "SELECT q_id, vec_id, CAST(rn AS INTEGER) AS rn, d2 FROM (" +
       "SELECT q_id, vec_id, d2, row_number() OVER (" +
       "PARTITION BY q_id ORDER BY d2 ASC, vec_id ASC) AS rn FROM iex) " +
       "WHERE rn <= 3"),
    "sim_ivf_train_iter" ->
      (s"WITH ${lloydCteSql(LloydMaxRounds)} " +
       s"SELECT cell, CAST(pos1 - 1 AS INTEGER) AS pos, m FROM tr$LloydMaxRounds " +
       "ORDER BY cell, pos"),
    "sim_ivf_train_hist" ->
      (s"WITH ${lloydCteSql(LloydMaxRounds)}, " +
       "tr0 AS (SELECT c.cell, p.pos1, CAST(e.embedding[p.pos1] AS DOUBLE) AS m " +
       "FROM embeddings e JOIN c ON e.vec_id = c.cell, " +
       "UNNEST(range(1, len(e.embedding)+1)) AS p(pos1)), " +
       (1 to LloydMaxRounds).map { r =>
         s"d$r AS (SELECT $r AS iter, cur.cell, " +
         "CAST(round((cur.m - prev.m) * (cur.m - prev.m) * 1e12) AS BIGINT) AS t " +
         s"FROM tr$r cur JOIN tr${r - 1} prev " +
         "ON cur.cell = prev.cell AND cur.pos1 = prev.pos1)"
       }.mkString(", ") + ", " +
       s"dd AS (${(1 to LloydMaxRounds).map(r => s"SELECT * FROM d$r").mkString(" UNION ALL ")}) " +
       "SELECT iter, cell, count(*) AS n_dims, " +
       "round((CAST(sum(t) AS DOUBLE) / 1e12) * 1e6) / 1e6 AS d2, " +
       "CAST(round((CAST(sum(t) AS DOUBLE) / 1e12) * 1e6) / 1e6 > 0 AS INTEGER) AS moved " +
       "FROM dd GROUP BY iter, cell ORDER BY iter, cell"),
    "sim_ivf_train" ->
      (s"WITH $ivfTrainCte " +
       "SELECT cell, CAST(pos1 - 1 AS INTEGER) AS pos, m FROM tr " +
       "ORDER BY cell, pos"),
    "sim_ivf_train_delta" ->
      (s"WITH $ivfTrainCte, " +
       "sd AS (SELECT c.cell, p.pos1, CAST(e.embedding[p.pos1] AS DOUBLE) AS sv " +
       "FROM embeddings e JOIN c ON e.vec_id = c.cell, " +
       "UNNEST(range(1, len(e.embedding)+1)) AS p(pos1)), " +
       "d AS (SELECT tr.cell, " +
       "CAST(round((tr.m - sd.sv) * (tr.m - sd.sv) * 1e12) AS BIGINT) AS t " +
       "FROM tr JOIN sd ON tr.cell = sd.cell AND tr.pos1 = sd.pos1) " +
       "SELECT cell, count(*) AS n_dims, " +
       "round((CAST(sum(t) AS DOUBLE) / 1e12) * 1e6) / 1e6 AS d2, " +
       "CAST(round((CAST(sum(t) AS DOUBLE) / 1e12) * 1e6) / 1e6 > 0 AS INTEGER) AS moved " +
       "FROM d GROUP BY cell ORDER BY cell"),
    "sim_ivf_assign_trained" ->
      (s"WITH $ivfTrainCte, " +
       "tc AS (SELECT cell, list(m ORDER BY pos1) AS cv FROM tr GROUP BY cell), " +
       "s2 AS (SELECT e.vec_id, t.cell, " +
       "round((list_cosine_similarity(e.embedding::DOUBLE[], t.cv)) * 1e6) / 1e6 AS csim " +
       "FROM embeddings e CROSS JOIN tc t) " +
       "SELECT vec_id, cell, csim FROM (SELECT vec_id, cell, csim, " +
       "row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn " +
       "FROM s2) WHERE rn = 1"),
    // per-cell cohesion/outlier report: the sim_ivf_assign_trained
    // chain folded per cell — exact micro-unit csim mass, worst member
    // by (csim asc, vec_id asc)
    "emb_outlier_report" ->
      (s"WITH $ivfTrainCte, " +
       "tc AS (SELECT cell, list(m ORDER BY pos1) AS cv FROM tr GROUP BY cell), " +
       "s2 AS (SELECT e.vec_id, t.cell, " +
       "round((list_cosine_similarity(e.embedding::DOUBLE[], t.cv)) * 1e6) / 1e6 AS csim " +
       "FROM embeddings e CROSS JOIN tc t), " +
       "oasg AS (SELECT vec_id, cell, csim FROM (SELECT vec_id, cell, csim, " +
       "row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn " +
       "FROM s2) WHERE rn = 1), " +
       "orr AS (SELECT vec_id, cell, csim, " +
       "CAST(round(csim * 1e6) AS BIGINT) AS cm, " +
       "row_number() OVER (PARTITION BY cell ORDER BY csim ASC, vec_id ASC) AS rn " +
       "FROM oasg) " +
       "SELECT cell, count(*) AS n_members, " +
       "CAST(sum(cm) AS BIGINT) AS sum_csim_micro, " +
       "max(CASE WHEN rn = 1 THEN vec_id END) AS worst_id, " +
       "max(CASE WHEN rn = 1 THEN csim END) AS worst_csim " +
       "FROM orr GROUP BY cell"),
    // SemDeDup: trained home-cell assignment (tc/s2/home as in
    // sim_ivf_assign_trained), within-cell pairs at a < b, cosine
    // confirm >= 0.4, keep iff no confirmed dup with a smaller id.
    // The cap CTE is omitted: no sf0.01 cell approaches 1024 (the
    // regime note at the top of this section), so the capped Spark
    // plan and this uncapped SQL are byte-identical where verified.
    "dedup_semantic" ->
      (s"WITH $semanticCellCte " +
       "SELECT m.vec_id, m.cell, " +
       "coalesce(d.n, CAST(0 AS BIGINT)) AS n_dups_smaller, " +
       "CAST(coalesce(d.n, CAST(0 AS BIGINT)) = 0 AS INTEGER) AS keep " +
       "FROM m LEFT JOIN d ON d.b_id = m.vec_id"),
    // dsc-prefixed tail over the SAME semanticCellCte chain's `p` (the
    // un-thresholded in-cell pairs — dedup and curve move together);
    // grid in micro-units, comparison value = CAST(τµ AS DOUBLE)/1e6 on
    // BOTH engines (correctly-rounded division ≡ the parsed literal);
    // counts nonneg so // ≡ div
    "dedup_semantic_curve" ->
      (s"WITH $semanticCellCte, " +
       "dscg AS (SELECT UNNEST([200000, 300000, 400000, 500000, 600000, " +
       "700000]) AS tau_micro), " +
       "dscc AS (SELECT g.tau_micro, count(*) AS n_pairs, " +
       "count(DISTINCT p.b_id) AS n_drop FROM p CROSS JOIN dscg g " +
       "WHERE p.sim >= CAST(g.tau_micro AS DOUBLE) / 1e6 " +
       "GROUP BY g.tau_micro), " +
       "dscn AS (SELECT count(*) AS n_vec FROM embeddings) " +
       "SELECT CAST(g.tau_micro AS BIGINT) AS tau_micro, " +
       "CAST(coalesce(c.n_pairs, 0) AS BIGINT) AS n_pairs, " +
       "CAST(coalesce(c.n_drop, 0) AS BIGINT) AS n_drop, " +
       "(CAST(coalesce(c.n_drop, 0) AS BIGINT) * 1000000) // n.n_vec " +
       "AS drop_frac_micro " +
       "FROM dscg g LEFT JOIN dscc c USING (tau_micro) CROSS JOIN dscn n " +
       "ORDER BY tau_micro"),
    // composes the SAME semanticCellCte chain as dedup_semantic (the
    // eval can never drift from the decision it measures); probe 100 /
    // 0.4 threshold literals mirror semanticDedupEval — lockstep
    "dedup_semantic_eval" ->
      (s"WITH $semanticCellCte, " +
       "sdk AS (SELECT m.vec_id, " +
       "CAST(coalesce(d.n, CAST(0 AS BIGINT)) = 0 AS INTEGER) AS keep " +
       "FROM m LEFT JOIN d ON d.b_id = m.vec_id WHERE m.vec_id < 100), " +
       "sdt AS (SELECT DISTINCT x.vec_id AS a_id FROM embeddings x " +
       "JOIN embeddings y ON y.vec_id < x.vec_id WHERE x.vec_id < 100 AND " +
       "round((list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])) * 1e6) / 1e6 >= 0.4), " +
       "sdm AS (SELECT (SELECT count(*) FROM sdk) AS n_probes, " +
       "(SELECT count(*) FROM sdt) AS n_truth, " +
       "(SELECT count(*) FROM sdk WHERE keep = 0) AS n_pred, " +
       "(SELECT count(*) FROM sdk JOIN sdt ON sdt.a_id = sdk.vec_id " +
       "WHERE keep = 0) AS n_hit) " +
       "SELECT n_probes, n_truth, n_pred, n_hit, " +
       "CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
       "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_truth END AS recall_micro, " +
       "CASE WHEN n_pred = 0 THEN CAST(1000000 AS BIGINT) " +
       "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_pred END AS precision_micro " +
       "FROM sdm"),
    // trained-index search: the sim_ivf_topk probe/home/cap composition
    // over the TRAINED cells (tc/s2 as in sim_ivf_assign_trained)
    "sim_ivf_topk_trained" -> trainedTopKOracleSql,
    // persisted-index round trip: the oracle IS sim_ivf_topk_trained's,
    // UNCHANGED — only the index's storage moved (localCheckpoint →
    // cell-partitioned parquet), so hash equality proves the reloaded
    // index serves identical results (the dedup_index_persist rule)
    "sim_index_persist" -> trainedTopKOracleSql,
    "emb_centroid_by_source" ->
      (s"WITH $centroidCte " +
       "SELECT source, CAST(pos1 - 1 AS INTEGER) AS pos, m FROM cent " +
       "ORDER BY source, pos"),
    "emb_quantize" ->
      ("SELECT vec_id, round((mn) * 1e6) / 1e6 AS mn_r, " +
       "round((mx) * 1e6) / 1e6 AS mx_r, " +
       "CASE WHEN mx > mn THEN array_to_string(list_transform(embedding, " +
       "v -> CAST(least(255, floor((CAST(v AS DOUBLE) - mn) / (mx - mn) * 255)) " +
       "AS INTEGER)), ',') " +
       "ELSE array_to_string(list_transform(embedding, v -> 0), ',') END AS codes " +
       "FROM (SELECT vec_id, embedding, " +
       "CAST(list_min(embedding) AS DOUBLE) AS mn, " +
       "CAST(list_max(embedding) AS DOUBLE) AS mx FROM embeddings) t"),
    // exact integer-moment per-dim stats: identical element quantization
    // (round(x*1e6), round(x*x*1e12)) and exact big-integer sums on both
    // engines (DuckDB sums BIGINT into HUGEINT; Spark uses DECIMAL(38,0)
    // accumulators), so every downstream double op folds identical inputs
    "emb_pca_power" ->
      (pcaCteSql + " SELECT pos, u2, v2 FROM v2c ORDER BY pos"),
    // deflated second component: the SAME chain (keep in lockstep) plus
    // per-round matvec -> renorm -> iterate-level orthogonalization
    // (w = t*vv - (t*v)*v, multiplied through by vv so no division);
    // every sum CAST to BIGINT, every // behind abs() (sign split)
    "emb_pca_top2" ->
      (pcaCteSql + ", " +
       "vq AS (SELECT CAST(sum(v2*v2) AS BIGINT) AS vv, " +
       "CAST(sum(v2) AS BIGINT) AS sv FROM v2c), " +
       "g0 AS (SELECT pos, vq.vv - vq.sv * v2c.v2 AS g FROM v2c CROSS JOIN vq), " +
       "gm AS (SELECT max(abs(g)) AS m FROM g0), " +
       "g1 AS MATERIALIZED (SELECT pos, (CASE WHEN g < 0 THEN -1 ELSE 1 END) * " +
       "((abs(g) * 100) // m) AS v FROM g0 CROSS JOIN gm), " +
       pcaTop2RoundSql(1, "g1", "v") + ", " +
       pcaTop2RoundSql(2, "ew1", "w2") + " " +
       "SELECT v2c.pos, v2c.v2, ew2.w2 FROM v2c JOIN ew2 USING (pos) ORDER BY pos"),
    // projection composes the SAME chain (keep in lockstep): one more
    // ce ⋈ v2 matvec, still exact BIGINT
    "emb_pca_project" ->
      (pcaCteSql + ", sc AS (SELECT ce.vec_id, " +
       "CAST(sum(ce.c * v2c.v2) AS BIGINT) AS score " +
       "FROM ce JOIN v2c USING (pos) GROUP BY ce.vec_id) " +
       "SELECT e.vec_id, e.label, sc.score " +
       "FROM embeddings e JOIN sc ON e.vec_id = sc.vec_id"),
    "emb_dim_stats" ->
      (dimStatsCteSql + " SELECT pos, n, mean, var_samp, mn, mx FROM ds ORDER BY pos"),
    // whitening composes the SAME moment chain (keep in lockstep): the
    // 6-dp-rounded mean/σ are identical doubles on both engines, and
    // (x−mean)/sqrt(var) is a fixed tree of exactly-rounded IEEE ops
    "emb_whiten" ->
      (dimStatsCteSql + " SELECT x.vec_id, x.pos, " +
       "(round(((x.x - ds.mean) / sqrt(ds.var_samp)) * 1e4) / 1e4) + 0.0 AS z " +
       "FROM x JOIN ds USING (pos) WHERE ds.var_samp > 0"),
    "emb_centroid_sim" ->
      (s"WITH $centroidCte, " +
       "cl AS (SELECT source, list(m ORDER BY pos1) AS c FROM cent GROUP BY source) " +
       "SELECT x.source AS a_src, y.source AS b_src, " +
       "round((list_cosine_similarity(x.c, y.c)) * 1e6) / 1e6 AS sim " +
       "FROM cl x JOIN cl y ON x.source < y.source"),
    "emb_label_eval" ->
      ("WITH u AS (SELECT e.label, p.pos1, CAST(e.embedding[p.pos1] AS DOUBLE) AS val " +
       "FROM embeddings e, UNNEST(range(1, len(e.embedding)+1)) AS p(pos1)), " +
       "cent AS (SELECT label AS plabel, pos1, round((avg(val)) * 1e6) / 1e6 AS m " +
       "FROM u GROUP BY label, pos1), " +
       "cl AS (SELECT plabel, list(m ORDER BY pos1) AS c FROM cent GROUP BY plabel), " +
       "s AS (SELECT e.vec_id, e.label, cl.plabel, " +
       "round((list_cosine_similarity(e.embedding::DOUBLE[], cl.c)) * 1e6) / 1e6 AS sim " +
       "FROM embeddings e CROSS JOIN cl), " +
       "r AS (SELECT vec_id, label, plabel, " +
       "row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, plabel ASC) AS rn FROM s), " +
       "a AS (SELECT label, count(*) AS n, " +
       "CAST(sum(CASE WHEN plabel = label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct " +
       "FROM r WHERE rn = 1 GROUP BY label) " +
       "SELECT label, n, n_correct, " +
       "round((100.0 * n_correct / n) * 1e2) / 1e2 AS acc_pct FROM a ORDER BY label"),
    // kNN majority vote over the production top-3: kl-prefixed tail on
    // the composed chain's ranked candidates `r`; tie rule (c desc,
    // label asc) and the acc_pct form mirror emb_label_eval — lockstep
    "emb_knn_label_eval" ->
      (ivfTopKCteSql +
       ", kln AS (SELECT r.a_id, e.label AS nl FROM r " +
       "JOIN embeddings e ON r.b_id = e.vec_id WHERE r.rn <= 3), " +
       "klc AS (SELECT a_id, nl, count(*) AS c FROM kln GROUP BY a_id, nl), " +
       "klp AS (SELECT a_id, nl AS plabel FROM (SELECT a_id, nl, " +
       "row_number() OVER (PARTITION BY a_id ORDER BY c DESC, nl ASC) AS rn2 " +
       "FROM klc) t WHERE rn2 = 1), " +
       "kla AS (SELECT e.label, count(*) AS n, " +
       "CAST(sum(CASE WHEN klp.plabel = e.label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct " +
       "FROM klp JOIN embeddings e ON klp.a_id = e.vec_id GROUP BY e.label) " +
       "SELECT label, n, n_correct, " +
       "round((100.0 * n_correct / n) * 1e2) / 1e2 AS acc_pct FROM kla ORDER BY label"),
    "sim_norms" ->
      ("SELECT vec_id, round((sqrt(list_dot_product(embedding::DOUBLE[], " +
       "embedding::DOUBLE[]))) * 1e6) / 1e6 AS nrm FROM embeddings"),
    "sim_brute_topk" ->
      ("SELECT e.vec_id, round((list_cosine_similarity(e.embedding::DOUBLE[], " +
       "q.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim FROM embeddings e, " +
       "(SELECT embedding FROM embeddings WHERE vec_id = 0) q " +
       "WHERE e.vec_id <> 0 ORDER BY sim DESC, e.vec_id ASC LIMIT 10"),
    "sim_lsh_buckets" ->
      s"SELECT vec_id, CAST($bucketSql AS INTEGER) AS bucket FROM embeddings",
    // gs-prefixed; beam B=4 / 2 rounds / entry = sign-bit Hamming top-4
    // (gsb0) / probe
    // vec_id < 100 — all lockstep with graphSearch; UNION dedups ≡
    // .distinct(); search and eval share the chain (move both or
    // neither)
    "sim_graph_search" ->
      (graphSearchCteSql + " " +
       "SELECT a_id, b_id, CAST(rn AS INTEGER) AS rn, sim FROM gsb2 " +
       "WHERE rn <= 3"),
    "sim_graph_search_eval" ->
      (graphSearchCteSql + ", " +
       "gst AS (SELECT p.a_id, e.vec_id AS b_id, " +
       "round((list_dot_product(e.embedding, p.qv) / (e.nrm * p.qnrm)) * 1e6) / 1e6 AS sim " +
       "FROM gse e CROSS JOIN gsp p WHERE e.vec_id <> p.a_id), " +
       "gsr AS (SELECT a_id, b_id FROM (SELECT gst.*, row_number() OVER (" +
       "PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn FROM gst) gsq " +
       "WHERE rn <= 3), " +
       "gsh AS (SELECT count(*) AS n_hit FROM gsr JOIN gsb2 " +
       "ON gsr.a_id = gsb2.a_id AND gsr.b_id = gsb2.b_id AND gsb2.rn <= 3), " +
       "gsn AS (SELECT count(*) AS n_truth FROM gsr) " +
       "SELECT CAST(gsn.n_truth AS BIGINT) AS n_truth, " +
       "CAST(gsh.n_hit AS BIGINT) AS n_hit, " +
       "CASE WHEN gsn.n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
       "ELSE (CAST(gsh.n_hit AS BIGINT) * 1000000) // gsn.n_truth END " +
       "AS recall_micro FROM gsn, gsh"),
    // eb-prefixed; identical fold discipline as sim_bucket_entropy over
    // the composed chain's home cells (unreferenced CTEs are free —
    // the emb_cell_purity rule)
    "emb_cell_balance" ->
      (ivfTopKCteSql + ", " +
       "ebc AS (SELECT cell, count(*) AS c FROM home GROUP BY cell), " +
       "eba AS (SELECT CAST(count(*) AS BIGINT) AS n_cells, " +
       "CAST(sum(c) AS BIGINT) AS n_vecs, CAST(max(c) AS BIGINT) AS max_cell, " +
       "CAST(sum(c * CAST(round(ln(c) * 1e6) AS BIGINT)) AS BIGINT) AS sclnc " +
       "FROM ebc), " +
       "ebf AS (SELECT n_cells, n_vecs, max_cell, " +
       "CAST(round(ln(n_vecs) * 1e6) AS BIGINT) - (sclnc // n_vecs) AS h_micro, " +
       "CAST(round(ln(n_cells) * 1e6) AS BIGINT) AS h_max_micro FROM eba) " +
       "SELECT n_cells, n_vecs, max_cell, h_micro, h_max_micro, " +
       "CASE WHEN n_cells = 1 THEN CAST(1000000 AS BIGINT) " +
       "ELSE (h_micro * CAST(1000000 AS BIGINT)) // h_max_micro END " +
       "AS balance_micro FROM ebf"),
    // be-prefixed; micronized-ln entropy discipline, everything nonneg;
    // the n_buckets=1 guard mirrors the Spark CASE
    "sim_bucket_entropy" ->
      (s"WITH beb AS (SELECT CAST($bucketSql AS INTEGER) AS bucket " +
       "FROM embeddings), " +
       "bec AS (SELECT bucket, count(*) AS c FROM beb GROUP BY bucket), " +
       "bea AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets, " +
       "CAST(sum(c) AS BIGINT) AS n_vecs, CAST(max(c) AS BIGINT) AS max_bucket, " +
       "CAST(sum(c * CAST(round(ln(c) * 1e6) AS BIGINT)) AS BIGINT) AS sclnc " +
       "FROM bec), " +
       "bef AS (SELECT n_buckets, n_vecs, max_bucket, " +
       "CAST(round(ln(n_vecs) * 1e6) AS BIGINT) - (sclnc // n_vecs) AS h_micro, " +
       "CAST(round(ln(n_buckets) * 1e6) AS BIGINT) AS h_max_micro FROM bea) " +
       "SELECT n_buckets, n_vecs, max_bucket, h_micro, h_max_micro, " +
       "CASE WHEN n_buckets = 1 THEN CAST(1000000 AS BIGINT) " +
       "ELSE (h_micro * CAST(1000000 AS BIGINT)) // h_max_micro END " +
       "AS balance_micro FROM bef"),
    // bc mirrors the Spark-side bucket cap (salted-scramble order, cap
    // 1024): no sf0.01 bucket approaches the cap, so results are
    // unchanged — the CTE pins the truncation ORDER parity for when it
    // would fire.
    "sim_ann_topk" ->
      ("WITH b AS (SELECT vec_id, embedding, CAST(" + bucketSql + " AS INTEGER) AS bucket " +
       "FROM embeddings), " +
       "bc AS (SELECT * FROM b QUALIFY row_number() OVER (PARTITION BY bucket " +
       s"ORDER BY ${saltOrdSql("vec_id")}, vec_id) <= 1024), " +
       "p AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
       "round((list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
       "FROM b x JOIN bc y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id), " +
       "r AS (SELECT a_id, b_id, sim, row_number() OVER (PARTITION BY a_id " +
       "ORDER BY sim DESC, b_id ASC) AS rn FROM p) " +
       "SELECT a_id, b_id, rn, sim FROM r WHERE rn <= 3"),
    "dedup_embedding" ->
      ("WITH b AS (SELECT vec_id, embedding, CAST(" + bucketSql + " AS INTEGER) AS bucket " +
       "FROM embeddings), " +
       "bc AS (SELECT * FROM b QUALIFY row_number() OVER (PARTITION BY bucket " +
       s"ORDER BY ${saltOrdSql("vec_id")}, vec_id) <= 1024) " +
       "SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
       "round((list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
       "FROM b x JOIN bc y ON x.bucket = y.bucket AND x.vec_id < y.vec_id " +
       "WHERE round((list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])) * 1e6) / 1e6 >= 0.4"),
    "sim_ivf_assign" ->
      ("WITH c AS (SELECT vec_id AS cell, embedding AS cv FROM embeddings WHERE vec_id < 16), " +
       "s AS (SELECT e.vec_id, c.cell, " +
       "round((list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[])) * 1e6) / 1e6 AS csim " +
       "FROM embeddings e CROSS JOIN c), " +
       "r AS (SELECT vec_id, cell, csim, row_number() OVER (PARTITION BY vec_id " +
       "ORDER BY csim DESC, cell ASC) AS rn FROM s) " +
       "SELECT vec_id, cell, csim FROM r WHERE rn = 1"),
    // whiten -> index composition: the emb_whiten z chain (dimStatsCteSql
    // + w, keep in lockstep) rebuilt to pos-ordered lists, then the
    // sim_ivf_assign shape over whitened vectors; + 0.0 on csim because
    // cosines of zero-centered vectors can round to a signed zero
    "sim_ivf_assign_whitened" ->
      (dimStatsCteSql + ", " +
       "w AS (SELECT x.vec_id, x.pos, " +
       "(round(((x.x - ds.mean) / sqrt(ds.var_samp)) * 1e4) / 1e4) + 0.0 AS z " +
       "FROM x JOIN ds USING (pos) WHERE ds.var_samp > 0), " +
       "wl AS (SELECT vec_id, list(z ORDER BY pos) AS wv FROM w GROUP BY vec_id), " +
       "wc AS (SELECT vec_id AS cell, wv AS cv FROM wl WHERE vec_id < 16), " +
       "ws AS (SELECT a.vec_id, c.cell, " +
       "(round((list_cosine_similarity(a.wv, c.cv)) * 1e6) / 1e6) + 0.0 AS csim " +
       "FROM wl a CROSS JOIN wc c), " +
       "wr AS (SELECT vec_id, cell, csim, row_number() OVER (PARTITION BY vec_id " +
       "ORDER BY csim DESC, cell ASC) AS rn FROM ws) " +
       "SELECT vec_id, cell, csim FROM wr WHERE rn = 1"),
    // multi-probe composition: pr ranks every (vector, cell); queries (x)
    // take rn <= NProbe, the indexed side (y) its rn = 1 home cell, with
    // the same salted-order cap as the Spark b-side.
    "sim_ivf_topk" ->
      (ivfTopKCteSql + " SELECT a_id, b_id, rn, sim FROM r WHERE rn <= 3"),
    // batch split literal 250 (= n/2 at sf0.01), micronize-then-
    // DECIMAL-sum moment discipline shared with dimStatsCteSql, signed-
    // zero `+ 0.0` after every mean round, drift threshold literal
    // 100000 µ — all lockstep with driftReport
    "emb_drift_report" ->
      ("WITH dx AS (SELECT e.vec_id, CAST(p.pos1 - 1 AS INTEGER) AS pos, " +
       "CAST(e.embedding[p.pos1] AS DOUBLE) AS x " +
       "FROM embeddings e, UNNEST(range(1, len(e.embedding)+1)) AS p(pos1)), " +
       "dt AS (SELECT vec_id, pos, CAST(round(x * 1e6) AS BIGINT) AS t1 FROM dx), " +
       "dr AS (SELECT pos, count(*) AS n_ref, CAST(sum(t1) AS DOUBLE) AS s1 " +
       "FROM dt WHERE vec_id < 250 GROUP BY pos), " +
       "dn AS (SELECT pos, count(*) AS n_new, CAST(sum(t1) AS DOUBLE) AS s1 " +
       "FROM dt WHERE vec_id >= 250 GROUP BY pos), " +
       "dm AS (SELECT dr.pos, dr.n_ref, dn.n_new, " +
       "round(((dr.s1 / 1e6) / dr.n_ref) * 1e6) / 1e6 + 0.0 AS mean_ref, " +
       "round(((dn.s1 / 1e6) / dn.n_new) * 1e6) / 1e6 + 0.0 AS mean_new " +
       "FROM dr JOIN dn USING (pos)) " +
       "SELECT pos, n_ref, n_new, mean_ref, mean_new, " +
       "CAST(round((mean_new - mean_ref) * 1e6) AS BIGINT) AS drift_micro, " +
       "CAST(abs(CAST(round((mean_new - mean_ref) * 1e6) AS BIGINT)) >= 100000 " +
       "AS INTEGER) AS shifted FROM dm ORDER BY pos"),
    // eh-prefixed; probe literal vec_id < 100 (the eval-family rule),
    // bin = least(floor((sim + 1.0)·5), 9) on the 6-dp sim with the
    // DOUBLE-cast literal (decimal rule), empty bins kept — lockstep
    // with simHist
    "emb_sim_hist" ->
      ("WITH ehp AS (SELECT vec_id AS a_id, embedding AS va " +
       "FROM embeddings WHERE vec_id < 100), " +
       "ehs AS (SELECT round((list_cosine_similarity(e.embedding::DOUBLE[], " +
       "p.va::DOUBLE[])) * 1e6) / 1e6 AS sim " +
       "FROM embeddings e, ehp p WHERE e.vec_id <> p.a_id), " +
       "eht AS (SELECT count(*) AS n_pairs FROM ehs), " +
       "ehc AS (SELECT least(CAST(floor((sim + CAST(1.0 AS DOUBLE)) * 5) " +
       "AS INTEGER), 9) AS bucket, count(*) AS n FROM ehs GROUP BY 1), " +
       "ehl AS (SELECT UNNEST(range(0, 10)) AS bucket) " +
       "SELECT CAST(l.bucket AS INTEGER) AS bucket, " +
       "CAST(coalesce(c.n, 0) AS BIGINT) AS n, " +
       "(CAST(coalesce(c.n, 0) AS BIGINT) * 1000000) // t.n_pairs " +
       "AS share_micro FROM ehl l LEFT JOIN ehc c ON c.bucket = l.bucket, " +
       "eht t ORDER BY bucket"),
    // is-prefixed; dimStats element quantization (x·1e6 / x²·1e12 as
    // BIGINT), HUGEINT carries s1² (the DECIMAL(38) twin of the Spark
    // side), three non-negative // divisions ≡ div — lockstep with
    // isotropy
    "emb_isotropy" ->
      ("WITH isx AS (SELECT CAST(p.pos1 - 1 AS INTEGER) AS pos, " +
       "CAST(e.embedding[p.pos1] AS DOUBLE) AS x " +
       "FROM embeddings e, UNNEST(range(1, len(e.embedding)+1)) AS p(pos1)), " +
       "ist AS (SELECT pos, CAST(round(x * 1e6) AS BIGINT) AS t1, " +
       "CAST(round(x * x * 1e12) AS BIGINT) AS t2 FROM isx), " +
       "isg AS (SELECT pos, count(*) AS n, CAST(sum(t1) AS HUGEINT) AS s1, " +
       "CAST(sum(t2) AS HUGEINT) AS s2 FROM ist GROUP BY pos), " +
       "isa AS (SELECT CAST(max(n) AS BIGINT) AS n, count(*) AS n_dims, " +
       "CAST(sum(s1 * s1) AS HUGEINT) AS num, " +
       "CAST(sum(s2) AS HUGEINT) AS den FROM isg) " +
       "SELECT n, n_dims, " +
       "CAST(den // (CAST(n AS HUGEINT) * 1000000) AS BIGINT) " +
       "AS mean_norm_sq_micro, " +
       "CAST(num // (CAST(n AS HUGEINT) * CAST(n AS HUGEINT) * 1000000) " +
       "AS BIGINT) AS mu_norm_sq_micro, " +
       "CAST((num * 1000000) // (CAST(n AS HUGEINT) * den) AS BIGINT) " +
       "AS aniso_micro FROM isa"),
    // cell purity composes the chain's `home` CTE (unreferenced CTEs
    // are not executed by DuckDB); ep/et-prefixed names, label-asc ties,
    // nonneg // ≡ div — lockstep with cellPurity
    "emb_cell_purity" ->
      (ivfTopKCteSql + ", " +
       "ep AS (SELECT h.cell, e.label, count(*) AS c FROM home h " +
       "JOIN embeddings e USING (vec_id) GROUP BY 1, 2), " +
       "et AS (SELECT cell, label, c, row_number() OVER (PARTITION BY cell " +
       "ORDER BY c DESC, label ASC) AS rn2, " +
       "sum(c) OVER (PARTITION BY cell) AS n FROM ep) " +
       "SELECT cell, label AS major_label, CAST(n AS BIGINT) AS n_vecs, " +
       "CAST(c AS BIGINT) AS n_major, CAST((100 * c) // n AS BIGINT) " +
       "AS purity_pct FROM et WHERE rn2 = 1"),
    // simplified silhouette: re-ranks the chain's `s` KEEPING csim
    // (pr drops it); sil-prefixed names; (c1-c2)/(1-c2)*1e6 in the
    // SAME op order as silhouette (1.0 is binary-exact, division
    // IEEE-exact on identical 6-dp operands); c2=1 gate mirrored;
    // s_micro nonneg ⇒ // ≡ div — lockstep with silhouette
    "emb_silhouette" ->
      (ivfTopKCteSql + ", " +
       "silr AS (SELECT vec_id, cell, csim, row_number() OVER (" +
       "PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn FROM s), " +
       "sil1 AS (SELECT vec_id, cell, csim AS c1 FROM silr WHERE rn = 1), " +
       "sil2 AS (SELECT vec_id, csim AS c2 FROM silr WHERE rn = 2), " +
       "silv AS (SELECT sil1.cell, " +
       "CAST(round((sil1.c1 - sil2.c2) / (CAST(1.0 AS DOUBLE) - sil2.c2) * 1e6) " +
       "AS BIGINT) AS s_micro FROM sil1 JOIN sil2 USING (vec_id) " +
       "WHERE CAST(1.0 AS DOUBLE) - sil2.c2 > 0) " +
       "SELECT cell, count(*) AS n_vecs, " +
       "CAST(sum(s_micro) AS BIGINT) // count(*) AS mean_s_micro, " +
       "min(s_micro) AS min_s_micro " +
       "FROM silv GROUP BY cell ORDER BY cell"),
    // occupancy-triggered cell split over the chain's `home` CTE
    // (composing the full chain is free — unreferenced CTEs are not
    // executed; the emb_cell_purity precedent); cs-prefixed names;
    // threshold literal = SplitOccupancy, median-τ model (seed
    // direction = lowest member id, τ = lower-median rank (n+1) div 2,
    // sub 0 iff s0sim ≥ τ) — all mirrored in cellSplit
    "sim_cell_split" ->
      (ivfTopKCteSql + ", " + cellSplitCteSql + ", " +
       "csc AS (SELECT cell, " +
       "CAST(sum(CASE WHEN sub = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0, " +
       "CAST(sum(CASE WHEN sub = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1 " +
       "FROM csp GROUP BY cell) " +
       "SELECT o.cell, o.n_before, " +
       "CAST(c.cell IS NOT NULL AS INTEGER) AS split, " +
       "coalesce(c.c0, CAST(0 AS BIGINT)) AS n_child0, " +
       "coalesce(c.c1, CAST(0 AS BIGINT)) AS n_child1, " +
       "coalesce(greatest(c.c0, c.c1), o.n_before) AS n_max_after " +
       "FROM cso o LEFT JOIN csc c USING (cell) ORDER BY o.cell"),
    // split-index serve over the shared cs-chain + st-serve chain —
    // the APPLY half of sim_cell_split (audited ≡ applied split)
    "sim_split_topk" -> splitTopKOracleSql,
    // the persisted split index serves THROUGH splitServeFrom from
    // reloaded parquet — result ≡ sim_split_topk by construction, so
    // the oracle is registered VERBATIM (only the storage moved; the
    // sim_index_persist rule)
    "sim_split_persist" -> splitTopKOracleSql,
    // the recursive split's occupancy trajectory: snapshot k = the
    // occupancy agg feeding round k+1; SplitDepth/SplitOccupancy
    // literals mirrored (lockstep)
    "sim_cell_split_deep" -> splitDeepReportOracleSql,
    // the depth-SplitDepth serve: round 1 of the chain is the audited
    // depth-1 CTEs byte-for-byte (the generator's ("cs","home")
    // instance), the dz tail mirrors the st tail
    "sim_split_deep_topk" -> splitDeepTopKOracleSql,
    // the persisted deep index serves THROUGH splitDeepServeFrom from
    // reloaded parquet — oracle VERBATIM (only the storage moved)
    "sim_split_deep_persist" -> splitDeepTopKOracleSql,
    // recall of the deep serve vs the SHARED truth (frontier leg
    // `deepsplit`) — the eval-family probe literal and metric forms
    "sim_split_deep_recall_eval" -> splitDeepRecallOracleSql,
    // the fail-closed depth chooser over the SAME snapshot union
    "sim_split_plan" -> splitPlanOracleSql,
    // the plan's APPLY half: arms over the SAME chooser + serve chains
    "sim_split_serve_planned" -> plannedServeOracleSql,
    // incremental split from the persisted index: the oracle rebuilds
    // the combined round from scratch — equality IS the proof
    "sim_split_incremental" -> splitIncrementalOracleSql,
    // the maintained index persisted back and SERVED from the reload —
    // the oracle re-derives the serve from scratch (maintain → persist
    // → serve loop closed; equality IS the proof)
    "sim_split_incremental_serve" -> splitIncrementalServeOracleSql,
    // multi-round incremental maintenance: the chain folded through
    // SplitDepth from-scratch rounds — equality proves the iterated
    // pruned-persisted path ≡ a recursive rebuild
    "sim_split_incremental_deep" -> splitIncrementalDeepOracleSql,
    // the median-τ split round applied to the TRAINED quantizer's home
    // cells — the SAME generator over trainedChainToHomeSql's `home`
    // (tcs-prefixed; probes/tc unreferenced CTEs are free)
    "sim_cell_split_trained" ->
      (trainedChainToHomeSql + ", " +
       cellSplitRoundCtesFor("tcs", "home") + ", " +
       "tcsc AS (SELECT cell, " +
       "CAST(sum(CASE WHEN sub = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0, " +
       "CAST(sum(CASE WHEN sub = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1 " +
       "FROM tcsp GROUP BY cell) " +
       "SELECT o.cell, o.n_before, " +
       "CAST(c.cell IS NOT NULL AS INTEGER) AS split, " +
       "coalesce(c.c0, CAST(0 AS BIGINT)) AS n_child0, " +
       "coalesce(c.c1, CAST(0 AS BIGINT)) AS n_child1, " +
       "coalesce(greatest(c.c0, c.c1), o.n_before) AS n_max_after " +
       "FROM tcso o LEFT JOIN tcsc c USING (cell) ORDER BY o.cell"),
    // the trained split's APPLY half: the shared serve-tail generator
    // ("tst", "tcs") over the trained chain's home/probes — report ≡
    // applied split on the trained quantizer too
    "sim_split_topk_trained" -> trainedSplitTopKOracleSql,
    // recall of the trained serve vs the SHARED truth (frontier leg
    // `trained`) — what Lloyd training buys in recall vs the stub
    "sim_trained_recall_eval" -> trainedRecallOracleSql,
    // recall of the trained split serve vs the SHARED truth (frontier
    // leg `trainedsplit`) — pointwise ≤ the trained leg
    "sim_split_trained_recall_eval" -> trainedSplitRecallOracleSql,
    // boundary dual-probe serve: the sb band chain over the UNCHANGED
    // split index (margin literal = SplitBandMargin, lockstep)
    "sim_split_band_topk" -> bandTopKOracleSql,
    // recall of the band serve vs the SHARED truth (frontier leg
    // `band`) — the eval-family probe literal and metric forms
    "sim_split_band_recall_eval" -> bandRecallOracleSql,
    // the margin grid (arms generated from SplitBandSweepMargins —
    // lockstep by construction); margin-0 row ≡ sim_split_recall_eval,
    // default-margin row ≡ sim_split_band_recall_eval
    "sim_split_band_sweep" -> bandSweepOracleSql,
    // measure → decide → apply on the band margin: the sweep's shared
    // arms, the cumulative-efficiency chooser, and full-probe serve
    // arms filtered by the choice (fail-closed to margin 0)
    "sim_split_band_planned" -> bandPlannedOracleSql,
    // mutual edges over the split serve — the knnMutualCteSql mutual
    // rule (sm-prefixed) over splitServeCteSql's `str`
    "sim_knn_mutual_split" ->
      (splitServeCteSql + ", " +
       "smt AS (SELECT a_id, b_id, sim FROM str WHERE rn <= 3), " +
       "smu AS (SELECT t.a_id, t.b_id, t.sim FROM smt t JOIN smt u " +
       "ON t.a_id = u.b_id AND t.b_id = u.a_id WHERE t.a_id < t.b_id) " +
       "SELECT a_id, b_id, sim FROM smu"),
    // recall of the split serve vs the SHARED truth (frontier leg
    // `split`) — the eval-family probe literal and metric forms
    "sim_split_recall_eval" ->
      (splitServeCteSql + ", " +
       "stex AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
       "round((list_cosine_similarity(x.embedding::DOUBLE[], " +
       "y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
       "FROM embeddings x JOIN embeddings y ON y.vec_id <> x.vec_id " +
       "WHERE x.vec_id < 100), " +
       "stxr AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
       "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) " +
       "AS rn FROM stex) e WHERE rn <= 3), " +
       "stsc AS (SELECT a_id, b_id FROM str WHERE rn <= 3 AND a_id < 100), " +
       "stht AS (SELECT a_id, b_id FROM stxr JOIN stsc USING (a_id, b_id)), " +
       "stcm AS (SELECT (SELECT count(*) FROM stxr) AS n_truth, " +
       "(SELECT count(*) FROM stsc) AS n_screen, " +
       "(SELECT count(*) FROM stht) AS n_hit) " +
       "SELECT CAST(n_truth AS BIGINT) AS n_truth, " +
       "CAST(n_screen AS BIGINT) AS n_screen, " +
       "CAST(n_hit AS BIGINT) AS n_hit, " +
       "CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
       "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_truth END AS recall_micro, " +
       "CASE WHEN n_screen = 0 THEN CAST(0 AS BIGINT) " +
       "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_screen END " +
       "AS precision_micro FROM stcm"),
    // radius query over the SAME chain through `p` (lockstep with
    // sim_ivf_topk); threshold literal CAST to DOUBLE (decimal rule)
    "sim_range_search" ->
      (ivfTopKCteSql +
       " SELECT a_id, b_id, sim FROM p WHERE sim >= CAST(0.4 AS DOUBLE)"),
    // mutual-kNN = the top-3 frame joined to its own reversal; the CTE
    // chain is shared verbatim with sim_ivf_topk (keep in lockstep)
    "sim_knn_mutual" ->
      (knnMutualCteSql + " SELECT a_id, b_id, sim FROM mu"),
    // one NN-descent round: wedges through shared mutual neighbors,
    // exact cosine on the new pairs only, re-rank over current ∪ wedge.
    // Composes knnMutualCteSql (names c/s/pr/probes/home/m/bc/p/r/t/mu
    // claimed) — nd-prefixed names keep the chain collision-free.
    "sim_nn_descent" ->
      (nnDescentCteSql + " SELECT a_id, b_id, rn, sim FROM ndr WHERE rn <= 3"),
    // recall gain of the round vs the sim_ivf_topk baseline, same probe
    // sample (vec_id < 100) and exact-truth shape as sim_ivf_recall_eval
    "sim_nn_descent_eval" ->
      (nnDescentCteSql +
       ", ndbs AS (SELECT a_id, b_id FROM r WHERE rn <= 3 AND a_id < 100), " +
       "ndrs AS (SELECT a_id, b_id FROM ndr WHERE rn <= 3 AND a_id < 100), " +
       "ndex AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
       "round((list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
       "FROM embeddings x JOIN embeddings y ON y.vec_id <> x.vec_id " +
       "WHERE x.vec_id < 100), " +
       "ndxr AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
       "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn " +
       "FROM ndex) e WHERE rn <= 3), " +
       "ndcm AS (SELECT (SELECT count(*) FROM ndxr) AS n_truth, " +
       "(SELECT count(*) FROM ndxr JOIN ndbs USING (a_id, b_id)) AS n_hit_base, " +
       "(SELECT count(*) FROM ndxr JOIN ndrs USING (a_id, b_id)) AS n_hit_ref) " +
       "SELECT n_truth, n_hit_base, n_hit_ref, " +
       "CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
       "ELSE (n_hit_base * CAST(1000000 AS BIGINT)) // n_truth END AS recall_base_micro, " +
       "CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
       "ELSE (n_hit_ref * CAST(1000000 AS BIGINT)) // n_truth END AS recall_ref_micro " +
       "FROM ndcm"),
    // recall eval: screen = the sim_ivf_topk chain restricted to the
    // probe sample (vec_id < 100 — the literal mirrors ivfRecallEval's
    // default, keep in lockstep); truth = exact top-3 per probe query;
    // all counts non-negative so DuckDB // == Spark div
    "sim_ivf_recall_eval" ->
      (ivfTopKCteSql +
       ", scr AS (SELECT a_id, b_id FROM r WHERE rn <= 3 AND a_id < 100), " +
       "exs AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
       "round((list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
       "FROM embeddings x JOIN embeddings y ON y.vec_id <> x.vec_id " +
       "WHERE x.vec_id < 100), " +
       "exr AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
       "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn " +
       "FROM exs) e WHERE rn <= 3), " +
       "hit AS (SELECT a_id, b_id FROM exr JOIN scr USING (a_id, b_id)), " +
       "rcm AS (SELECT (SELECT count(*) FROM exr) AS n_truth, " +
       "(SELECT count(*) FROM scr) AS n_screen, " +
       "(SELECT count(*) FROM hit) AS n_hit) " +
       "SELECT n_truth, n_screen, n_hit, " +
       "CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
       "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_truth END AS recall_micro, " +
       "CASE WHEN n_screen = 0 THEN CAST(0 AS BIGINT) " +
       "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_screen END AS precision_micro " +
       "FROM rcm"),
    // rk-prefixed tail: truth ranking to depth 10 (TruthDepth lockstep)
    // and ivfTopKCteSql's full `r` ranking, both prefix-sliced against
    // the {1,3,5,10} grid; the k=3 row ≡ sim_ivf_recall_eval
    "sim_recall_at_k" ->
      (ivfTopKCteSql + ", " +
       "rkg AS (SELECT UNNEST([1, 3, 5, 10]) AS k), " +
       "rke AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
       "round((list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
       "FROM embeddings x JOIN embeddings y ON y.vec_id <> x.vec_id " +
       "WHERE x.vec_id < 100), " +
       "rkr AS (SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id " +
       "ORDER BY sim DESC, b_id ASC) AS rn FROM rke), " +
       "rkt AS (SELECT g.k, a_id, b_id FROM rkr CROSS JOIN rkg g " +
       "WHERE rn <= g.k), " +
       "rks AS (SELECT g.k, a_id, b_id FROM r CROSS JOIN rkg g " +
       "WHERE a_id < 100 AND rn <= g.k), " +
       "rkh AS (SELECT t.k, count(*) AS n_hit FROM rkt t JOIN rks s " +
       "ON t.k = s.k AND t.a_id = s.a_id AND t.b_id = s.b_id GROUP BY t.k), " +
       "rkn AS (SELECT k, count(*) AS n_truth FROM rkt GROUP BY k), " +
       "rkm AS (SELECT k, count(*) AS n_screen FROM rks GROUP BY k) " +
       "SELECT CAST(n.k AS INTEGER) AS k, " +
       "CAST(n.n_truth AS BIGINT) AS n_truth, " +
       "CAST(m.n_screen AS BIGINT) AS n_screen, " +
       "CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit, " +
       "CASE WHEN n.n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
       "ELSE (CAST(coalesce(h.n_hit, 0) AS BIGINT) * 1000000) // n.n_truth END " +
       "AS recall_micro, " +
       "CASE WHEN m.n_screen = 0 THEN CAST(0 AS BIGINT) " +
       "ELSE (CAST(coalesce(h.n_hit, 0) AS BIGINT) * 1000000) // m.n_screen END " +
       "AS precision_micro " +
       "FROM rkn n JOIN rkm m USING (k) LEFT JOIN rkh h USING (k) " +
       "ORDER BY k"),
    // mq-prefixed tail over ivfTopKCteSql's full `r`: truth = exact
    // brute rank-1 NN per probe (TruthDepth's rn=1 slice in Spark),
    // screen join restricted to r.rn <= 3 (the serving cut); RR/MRR in
    // nonneg integer micro-units (// ≡ div)
    "sim_mrr_eval" ->
      (ivfTopKCteSql + ", " +
       "mqe AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
       "round((list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
       "FROM embeddings x JOIN embeddings y ON y.vec_id <> x.vec_id " +
       "WHERE x.vec_id < 100), " +
       "mqt AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
       "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn " +
       "FROM mqe) WHERE rn = 1), " +
       "mqj AS (SELECT t.a_id, r.rn FROM mqt t LEFT JOIN r " +
       "ON r.a_id = t.a_id AND r.b_id = t.b_id AND r.rn <= 3), " +
       "mqs AS (SELECT CAST(count(*) AS BIGINT) AS n_probes, " +
       "CAST(sum(CASE WHEN rn IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found, " +
       "CAST(sum(CASE WHEN rn IS NOT NULL THEN 1000000 // rn ELSE 0 END) AS BIGINT) AS rr_sum " +
       "FROM mqj) " +
       "SELECT n_probes, n_found, rr_sum, rr_sum // n_probes AS mrr_micro " +
       "FROM mqs"),
    // dl-prefixed from-scratch rebuild over the SURVIVING corpus
    // (vec_id % 10 <> 0): centroids stay the full seed POSITIONS,
    // assignment is per-vector independent, the bucket cap re-applies
    // over live members — hash equality proves filter-the-live-set ≡
    // rebuild; constants 16 / NProbe / 1024 lockstep with ivfTopKCteSql
    "sim_ivf_delete_search" ->
      ("WITH dlc AS (SELECT vec_id AS cell, embedding AS cv " +
       "FROM embeddings WHERE vec_id < 16), " +
       "dls AS (SELECT e.vec_id, c.cell, " +
       "round((list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[])) * 1e6) / 1e6 AS csim " +
       "FROM embeddings e CROSS JOIN dlc c WHERE e.vec_id % 10 <> 0), " +
       "dlp AS (SELECT vec_id, cell, row_number() OVER (" +
       "PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn FROM dls), " +
       "dlm AS (SELECT e.vec_id, e.embedding, p.cell FROM embeddings e " +
       s"JOIN dlp p ON e.vec_id = p.vec_id AND p.rn <= $NProbe " +
       "WHERE e.vec_id < 100), " +
       "dlb AS (SELECT e.vec_id, e.embedding, h.cell FROM embeddings e " +
       "JOIN dlp h ON e.vec_id = h.vec_id AND h.rn = 1 " +
       s"QUALIFY row_number() OVER (PARTITION BY h.cell " +
       s"ORDER BY ${saltOrdSql("e.vec_id")}, e.vec_id) <= 1024), " +
       "dlpr AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
       "round((list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
       "FROM dlm x JOIN dlb y ON x.cell = y.cell AND x.vec_id <> y.vec_id) " +
       "SELECT a_id, b_id, sim, CAST(rn AS INTEGER) AS rn FROM (" +
       "SELECT a_id, b_id, sim, row_number() OVER (PARTITION BY a_id " +
       "ORDER BY sim DESC, b_id ASC) AS rn FROM dlpr) t WHERE rn <= 3 " +
       "ORDER BY a_id, rn"),
    // fl-prefixed: the composite (cell, label) bucket key expressed as
    // join equality + a per-(cell,label) cap partition — identical
    // slicing to Spark's concat_ws key; constants lockstep with
    // ivfTopKCteSql; chain shared with sim_filtered_recall
    "sim_filtered_topk" ->
      (s"WITH $filteredCteSql " +
       "SELECT a_id, b_id, sim, CAST(rn AS INTEGER) AS rn FROM (" +
       "SELECT a_id, b_id, sim, row_number() OVER (PARTITION BY a_id " +
       "ORDER BY sim DESC, b_id ASC) AS rn FROM flpr) t WHERE rn <= 3 " +
       "ORDER BY a_id, rn"),
    // flsc/flex/flxr/flht/flcm tail over the SHARED fl chain (serving
    // and eval move together); truth = exact SAME-LABEL top-3 (a
    // different truth definition than the frontier's unfiltered one —
    // deliberately NOT a frontier leg)
    "sim_filtered_recall" ->
      (s"WITH $filteredCteSql, " +
       "flsc AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
       "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) " +
       "AS rn FROM flpr) t WHERE rn <= 3), " +
       "flex AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
       "round((list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
       "FROM embeddings x JOIN embeddings y ON y.vec_id <> x.vec_id " +
       "AND y.label = x.label WHERE x.vec_id < 100), " +
       "flxr AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
       "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) " +
       "AS rn FROM flex) e WHERE rn <= 3), " +
       "flht AS (SELECT a_id, b_id FROM flxr JOIN flsc USING (a_id, b_id)), " +
       "flcm AS (SELECT (SELECT count(*) FROM flxr) AS n_truth, " +
       "(SELECT count(*) FROM flsc) AS n_screen, " +
       "(SELECT count(*) FROM flht) AS n_hit) " +
       "SELECT n_truth, n_screen, n_hit, " +
       "CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
       "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_truth END AS recall_micro, " +
       "CASE WHEN n_screen = 0 THEN CAST(0 AS BIGINT) " +
       "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_screen END AS precision_micro " +
       "FROM flcm"),
    // sw-prefixed CTE chain; cell count 16 / probe 100 / cap 1024 are
    // the sf0.01 adaptive-knob constants (lockstep rule); the prn<=2
    // slice mirrors sim_ivf_recall_eval's screen exactly
    "sim_nprobe_sweep" -> nprobeSweepSql,
    // the chooser composes the SAME sw chain + per-width serve arms
    // (np1/np2/np4 from ivfChainCtesFor) filtered by the choice;
    // NprobePlanCandPerHit=150 and the {1,2,4} grid are lockstep
    "sim_nprobe_planned" -> nprobePlannedSql,
    // incremental assign: the ivfTrainCte shape restricted to the
    // existing corpus half via the shared incAssignCteSql chain, then
    // the batch (>= 250) assigned to the frozen trained centroids —
    // keep split/seed literals in lockstep with ivfIncrementalAssign's
    // runtime knobs
    "sim_ivf_incremental_assign" ->
      (s"WITH $incAssignCteSql, " +
       "iib AS (SELECT e.vec_id, t.cell, " +
       "round((list_cosine_similarity(e.embedding::DOUBLE[], t.cv)) * 1e6) / 1e6 AS csim " +
       "FROM embeddings e CROSS JOIN iicl t WHERE e.vec_id >= 250) " +
       "SELECT vec_id, cell, csim FROM (SELECT vec_id, cell, csim, " +
       "row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn " +
       "FROM iib) WHERE rn = 1"),
    // up-prefixed FROM-SCRATCH rebuild over the live membership
    // ((vec_id < 250 AND vec_id % 10 <> 0) OR vec_id >= 250) against
    // the SAME frozen base-trained centroids (the shared incAssignCteSql
    // chain — train-time snapshot includes later-deleted members):
    // hash equality proves incremental add + delete-filter + re-cap ≡
    // rebuild; constants NProbe / 1024 / probe 100 lockstep with
    // ivfTopKCteSql's family
    "sim_ivf_upsert_search" ->
      (s"WITH $incAssignCteSql, " +
       "upl AS (SELECT vec_id, embedding FROM embeddings " +
       "WHERE (vec_id < 250 AND vec_id % 10 <> 0) OR vec_id >= 250), " +
       "ups AS (SELECT e.vec_id, t.cell, " +
       "round((list_cosine_similarity(e.embedding::DOUBLE[], t.cv)) * 1e6) / 1e6 AS csim " +
       "FROM upl e CROSS JOIN iicl t), " +
       "upp AS (SELECT vec_id, cell, row_number() OVER (" +
       "PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn FROM ups), " +
       "upm AS (SELECT e.vec_id, e.embedding, p.cell FROM upl e " +
       s"JOIN upp p ON e.vec_id = p.vec_id AND p.rn <= $NProbe " +
       "WHERE e.vec_id < 100), " +
       "upb AS (SELECT e.vec_id, e.embedding, h.cell FROM upl e " +
       "JOIN upp h ON e.vec_id = h.vec_id AND h.rn = 1 " +
       s"QUALIFY row_number() OVER (PARTITION BY h.cell " +
       s"ORDER BY ${saltOrdSql("e.vec_id")}, e.vec_id) <= 1024), " +
       "uppr AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
       "round((list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
       "FROM upm x JOIN upb y ON x.cell = y.cell AND x.vec_id <> y.vec_id) " +
       "SELECT a_id, b_id, sim, CAST(rn AS INTEGER) AS rn FROM (" +
       "SELECT a_id, b_id, sim, row_number() OVER (PARTITION BY a_id " +
       "ORDER BY sim DESC, b_id ASC) AS rn FROM uppr) t WHERE rn <= 3 " +
       "ORDER BY a_id, rn"),
    // sign-bit family: packed words mirror packWord bit for bit (1-based
    // element i in [lo, lo+32) gets shift i-lo; Spark's 0-based lambda i
    // over slice(embedding, lo+1, 32) is the same bit); >= 0 is exact
    // float sign on both engines. Shortlist literal 8 = SignShortlist,
    // probe literal vec_id < 100 — keep in lockstep.
    "emb_sign_bits" ->
      (s"WITH $signCteSql " +
       "SELECT vec_id, w1, w2, " +
       "CAST(bit_count(w1) + bit_count(w2) AS INTEGER) AS nbits FROM sgpk"),
    "sim_hamming_topk" ->
      (s"WITH $signCteSql, " +
       "sgex AS (SELECT s.a_id, s.b_id, s.hd, " +
       "round((list_cosine_similarity(e.embedding::DOUBLE[], " +
       "q.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
       "FROM sgsh s JOIN embeddings e ON e.vec_id = s.b_id " +
       "JOIN embeddings q ON q.vec_id = s.a_id) " +
       "SELECT a_id, b_id, CAST(rn AS INTEGER) AS rn, hd, sim FROM (" +
       "SELECT a_id, b_id, hd, sim, row_number() OVER (" +
       "PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn FROM sgex) t " +
       "WHERE rn <= 3"),
    "emb_sign_recall" ->
      (s"WITH $signCteSql, " +
       "sgts AS (SELECT q.vec_id AS a_id, x.vec_id AS b_id, " +
       "round((list_cosine_similarity(x.embedding::DOUBLE[], " +
       "q.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
       "FROM embeddings x JOIN embeddings q ON x.vec_id <> q.vec_id " +
       "WHERE q.vec_id < 100), " +
       "sgtr AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
       "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn " +
       "FROM sgts) t WHERE rn <= 3), " +
       "sght AS (SELECT a_id, b_id FROM sgtr JOIN sgsh USING (a_id, b_id)), " +
       "sgcm AS (SELECT (SELECT count(*) FROM sgtr) AS n_truth, " +
       "(SELECT count(*) FROM sgsh) AS n_screen, " +
       "(SELECT count(*) FROM sght) AS n_hit) " +
       "SELECT n_truth, n_screen, n_hit, " +
       "CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
       "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_truth END AS recall_micro, " +
       "CASE WHEN n_screen = 0 THEN CAST(0 AS BIGINT) " +
       "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_screen END AS precision_micro " +
       "FROM sgcm"),
    // rf-prefixed; RRF composes BOTH shared chains (ivfTopKCteSql's `r`
    // + signCteSql's `sgsh`) then fuses by exact integer
    // 1e6 // (60 + rank) — depth 8 / K=60 literals mirror
    // RrfDepth/RrfK (lockstep); fusion and recall share the chain
    // (move both or neither); nonneg scores so // ≡ div
    "sim_rrf_fusion" ->
      (rrfCteSql + " " +
       "SELECT a_id, b_id, CAST(rrf_micro AS BIGINT) AS rrf_micro, " +
       "CAST(rn AS INTEGER) AS rn FROM rfr WHERE rn <= 3"),
    "sim_rrf_recall" ->
      (rrfCteSql + ", " +
       "rfs AS (SELECT a_id, b_id FROM rfr WHERE rn <= 3), " +
       "rft AS (SELECT q.vec_id AS a_id, x.vec_id AS b_id, " +
       "round((list_cosine_similarity(x.embedding::DOUBLE[], " +
       "q.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
       "FROM embeddings x JOIN embeddings q ON x.vec_id <> q.vec_id " +
       "WHERE q.vec_id < 100), " +
       "rftr AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
       "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn " +
       "FROM rft) t WHERE rn <= 3), " +
       "rfht AS (SELECT a_id, b_id FROM rftr JOIN rfs USING (a_id, b_id)), " +
       "rfcm AS (SELECT (SELECT count(*) FROM rftr) AS n_truth, " +
       "(SELECT count(*) FROM rfs) AS n_screen, " +
       "(SELECT count(*) FROM rfht) AS n_hit) " +
       "SELECT n_truth, n_screen, n_hit, " +
       "CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
       "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_truth END AS recall_micro, " +
       "CASE WHEN n_screen = 0 THEN CAST(0 AS BIGINT) " +
       "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_screen END AS precision_micro " +
       "FROM rfcm"),
    // JL family: integer micro-coordinate chain shared by both queries;
    // projected similarity = exact BIGINT dot/norms, one double divide,
    // 6-dp round — both engines fold identical integers
    "emb_rand_proj" ->
      (s"WITH $jlCteSql " +
       "SELECT vec_id, CAST(t.k AS INTEGER) AS k, jl[t.k + 1] AS p_micro " +
       "FROM jlw, UNNEST(range(0, 16)) AS t(k)"),
    // mk-prefixed CTEs; prefix [1:16] and denominators mirror
    // matryoshkaRecallEval term for term (NOT list_cosine_similarity on
    // the prefix — both engines must build the same doubles)
    "emb_matryoshka_recall" ->
      ("WITH mkn AS (SELECT vec_id, embedding[1:16] AS pv, " +
       "list_dot_product(embedding[1:16]::DOUBLE[], embedding[1:16]::DOUBLE[]) AS pn2 " +
       "FROM embeddings), " +
       "mkq AS (SELECT vec_id AS a_id, pv AS qpv, pn2 AS qpn2 FROM mkn " +
       "WHERE vec_id < 100), " +
       "mks AS (SELECT q.a_id, x.vec_id AS b_id, " +
       "CASE WHEN x.pn2 = 0 OR q.qpn2 = 0 THEN -2.0 ELSE " +
       "round((list_dot_product(x.pv::DOUBLE[], q.qpv::DOUBLE[]) / " +
       "(sqrt(x.pn2) * sqrt(q.qpn2))) * 1e6) / 1e6 END AS sim " +
       "FROM mkn x CROSS JOIN mkq q WHERE x.vec_id <> q.a_id), " +
       "mkap AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
       "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn " +
       "FROM mks) t WHERE rn <= 3), " +
       "mkts AS (SELECT q.vec_id AS a_id, x.vec_id AS b_id, " +
       "round((list_cosine_similarity(x.embedding::DOUBLE[], " +
       "q.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
       "FROM embeddings x JOIN embeddings q ON x.vec_id <> q.vec_id " +
       "WHERE q.vec_id < 100), " +
       "mktr AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
       "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn " +
       "FROM mkts) t WHERE rn <= 3), " +
       "mkh AS (SELECT a_id, b_id FROM mktr JOIN mkap USING (a_id, b_id)) " +
       "SELECT (SELECT count(*) FROM mktr) AS n_truth, " +
       "(SELECT count(*) FROM mkh) AS n_hit, " +
       "CASE WHEN (SELECT count(*) FROM mktr) = 0 THEN CAST(1000000 AS BIGINT) " +
       "ELSE ((SELECT count(*) FROM mkh) * CAST(1000000 AS BIGINT)) " +
       "// (SELECT count(*) FROM mktr) END AS recall_micro"),
    "sim_jl_recall" ->
      (s"WITH $jlCteSql, " +
       "jln AS (SELECT vec_id, jl, " +
       "CAST(list_sum(list_transform(jl, x -> x * x)) AS BIGINT) AS n2 " +
       "FROM jlw), " +
       "jlq AS (SELECT vec_id AS a_id, jl AS qjl, n2 AS qn2 FROM jln " +
       "WHERE vec_id < 100), " +
       "jlps AS (SELECT q.a_id, x.vec_id AS b_id, " +
       "CASE WHEN x.n2 = 0 OR q.qn2 = 0 THEN -2.0 ELSE " +
       "round((CAST(list_sum(list_transform(range(1, 17), " +
       "i -> x.jl[i] * q.qjl[i])) AS DOUBLE) / " +
       "(sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(q.qn2 AS DOUBLE)))) * 1e6) / 1e6 " +
       "END AS sim FROM jln x CROSS JOIN jlq q WHERE x.vec_id <> q.a_id), " +
       "jlap AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
       "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn " +
       "FROM jlps) t WHERE rn <= 3), " +
       "jlts AS (SELECT q.vec_id AS a_id, x.vec_id AS b_id, " +
       "round((list_cosine_similarity(x.embedding::DOUBLE[], " +
       "q.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
       "FROM embeddings x JOIN embeddings q ON x.vec_id <> q.vec_id " +
       "WHERE q.vec_id < 100), " +
       "jltr AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
       "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn " +
       "FROM jlts) t WHERE rn <= 3), " +
       "jlht AS (SELECT a_id, b_id FROM jltr JOIN jlap USING (a_id, b_id)), " +
       "jlcm AS (SELECT (SELECT count(*) FROM jltr) AS n_truth, " +
       "(SELECT count(*) FROM jlht) AS n_hit) " +
       "SELECT n_truth, n_hit, " +
       "CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
       "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_truth END AS recall_micro " +
       "FROM jlcm"),
    // int8 recall: dequant mirrors the emb_quantize code formula term
    // for term (mn + code*(mx-mn)/255, code = least(255, floor(...)));
    // probe literal vec_id < 100 mirrors int8RecallEval's default
    "emb_int8_recall" ->
      ("WITH b0 AS (SELECT vec_id, embedding::DOUBLE[] AS e, " +
       "CAST(list_min(embedding) AS DOUBLE) AS mn, " +
       "CAST(list_max(embedding) AS DOUBLE) AS mx FROM embeddings), " +
       "dqt AS (SELECT vec_id, CASE WHEN mx > mn THEN " +
       "list_transform(e, v -> mn + " +
       "CAST(least(255, floor((v - mn) / (mx - mn) * 255)) AS DOUBLE) " +
       "* (mx - mn) / 255.0) " +
       "ELSE list_transform(e, v -> mn) END AS d FROM b0), " +
       "qp AS (SELECT vec_id AS a_id, e AS qv FROM b0 WHERE vec_id < 100), " +
       "trs AS (SELECT q.a_id, x.vec_id AS b_id, " +
       "round((list_cosine_similarity(x.e, q.qv)) * 1e6) / 1e6 AS sim " +
       "FROM b0 x CROSS JOIN qp q WHERE x.vec_id <> q.a_id), " +
       "tr AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
       "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn " +
       "FROM trs) t WHERE rn <= 3), " +
       "aps AS (SELECT q.a_id, x.vec_id AS b_id, " +
       "round((list_cosine_similarity(x.d, q.qv)) * 1e6) / 1e6 AS sim " +
       "FROM dqt x CROSS JOIN qp q WHERE x.vec_id <> q.a_id), " +
       "ap AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
       "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn " +
       "FROM aps) t WHERE rn <= 3), " +
       "ht AS (SELECT a_id, b_id FROM tr JOIN ap USING (a_id, b_id)), " +
       "cm AS (SELECT (SELECT count(*) FROM tr) AS n_truth, " +
       "(SELECT count(*) FROM ht) AS n_hit) " +
       "SELECT n_truth, n_hit, " +
       "CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
       "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_truth END AS recall_micro " +
       "FROM cm"))

  /** The dedup_semantic oracle's chain (trained cells → home assignment
    * `m` → within-cell pairs `p` → smaller-id dup counts `d`) — ONE
    * definition shared by dedup_semantic and dedup_semantic_eval, the
    * same single-source rule as knnMutualCteSql. Composes ivfTrainCte
    * (names tc/s2/home/m/p/d claimed). */
  private def semanticCellCte: String =
    s"$ivfTrainCte, " +
    "tc AS (SELECT cell, list(m ORDER BY pos1) AS cv FROM tr GROUP BY cell), " +
    "s2 AS (SELECT e.vec_id, t.cell, " +
    "round((list_cosine_similarity(e.embedding::DOUBLE[], t.cv)) * 1e6) / 1e6 AS csim " +
    "FROM embeddings e CROSS JOIN tc t), " +
    "home AS (SELECT vec_id, cell FROM (SELECT vec_id, cell, " +
    "row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn " +
    "FROM s2) WHERE rn = 1), " +
    "m AS (SELECT e.vec_id, e.embedding, h.cell FROM embeddings e " +
    "JOIN home h ON e.vec_id = h.vec_id), " +
    "p AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
    "round((list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
    "FROM m x JOIN m y ON x.cell = y.cell AND x.vec_id < y.vec_id), " +
    "d AS (SELECT b_id, count(*) AS n FROM p WHERE sim >= 0.4 GROUP BY b_id)"

  /** nprobe-sweep oracle: probe-side ranks to 4 cells over the 100-probe
    * sample, home-cell index capped identically to ivfTopKCteSql's `bc`,
    * one candidates CTE, three prn-sliced rankings unioned. */
  /** The nprobe-sweep measurement chain (sw-prefixed, through the
    * exact-truth `swexr` and the per-width top-3 screens sw1s/sw2s/
    * sw4s) — extracted so the sweep's read-out AND
    * [[nprobePlannedSql]]'s chooser price ONE chain (the
    * bandSweepArmsCtesSql precedent: measure and decision can never
    * drift). Grid {1, 2, 4} and the INTERSECT hit shape are the shared
    * lockstep literals. */
  private def nprobeSweepChainSql: String = {
    def slice(k: Int): String =
      s"sw${k}s AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
      "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn " +
      s"FROM swcand WHERE prn <= $k) t WHERE rn <= 3)"
    "swc AS (SELECT vec_id AS cell, embedding AS cv FROM embeddings " +
    "WHERE vec_id < 16), " +
    "sws AS (SELECT e.vec_id AS a_id, swc.cell, " +
    "round((list_cosine_similarity(e.embedding::DOUBLE[], swc.cv::DOUBLE[])) * 1e6) / 1e6 AS csim " +
    "FROM embeddings e CROSS JOIN swc WHERE e.vec_id < 100), " +
    "swp AS (SELECT a_id, cell, prn FROM (SELECT a_id, cell, " +
    "row_number() OVER (PARTITION BY a_id ORDER BY csim DESC, cell ASC) AS prn " +
    "FROM sws) t WHERE prn <= 4), " +
    "swall AS (SELECT e.vec_id, swc.cell, " +
    "round((list_cosine_similarity(e.embedding::DOUBLE[], swc.cv::DOUBLE[])) * 1e6) / 1e6 AS csim " +
    "FROM embeddings e CROSS JOIN swc), " +
    "swh AS (SELECT vec_id, cell FROM (SELECT vec_id, cell, " +
    "row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn " +
    "FROM swall) t WHERE rn = 1), " +
    "swb AS (SELECT e.vec_id, e.embedding, h.cell FROM embeddings e " +
    "JOIN swh h ON e.vec_id = h.vec_id " +
    s"QUALIFY row_number() OVER (PARTITION BY h.cell ORDER BY ${saltOrdSql("e.vec_id")}, e.vec_id) <= 1024), " +
    "swcand AS (SELECT p.a_id, y.vec_id AS b_id, p.prn, " +
    "round((list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
    "FROM swp p JOIN embeddings x ON x.vec_id = p.a_id " +
    "JOIN swb y ON y.cell = p.cell AND y.vec_id <> p.a_id), " +
    "swex AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
    "round((list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
    "FROM embeddings x JOIN embeddings y ON y.vec_id <> x.vec_id " +
    "WHERE x.vec_id < 100), " +
    "swexr AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
    "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn " +
    "FROM swex) e WHERE rn <= 3), " +
    Seq(1, 2, 4).map(slice).mkString(", ")
  }

  private def nprobeSweepSql: String = {
    def metrics(k: Int): String =
      s"SELECT CAST($k AS INTEGER) AS nprobe, " +
      s"(SELECT count(*) FROM swcand WHERE prn <= $k) AS n_cand, " +
      "(SELECT count(*) FROM swexr) AS n_truth, " +
      s"(SELECT count(*) FROM sw${k}s) AS n_screen, " +
      s"(SELECT count(*) FROM (SELECT a_id, b_id FROM swexr " +
      s"INTERSECT SELECT a_id, b_id FROM sw${k}s) h) AS n_hit, " +
      "CASE WHEN (SELECT count(*) FROM swexr) = 0 THEN CAST(1000000 AS BIGINT) " +
      s"ELSE ((SELECT count(*) FROM (SELECT a_id, b_id FROM swexr " +
      s"INTERSECT SELECT a_id, b_id FROM sw${k}s) h) * CAST(1000000 AS BIGINT)) " +
      "// (SELECT count(*) FROM swexr) END AS recall_micro"
    "WITH " + nprobeSweepChainSql + " " +
    Seq(1, 2, 4).map(metrics).mkString(" UNION ALL ") +
    " ORDER BY nprobe"
  }

  /** sim_nprobe_planned oracle: the SHARED sweep chain (byte-identical
    * with sim_nprobe_sweep's), a chooser CTE mirroring the Spark rule
    * — largest grid width with (n_hit − h1) · [[NprobePlanCandPerHit]]
    * ≥ (n_cand − c1) vs the k = 1 arm (which qualifies trivially, the
    * fail-closed floor) — and one full-corpus serve arm per grid width
    * from [[ivfChainCtesFor]] (np1/np2/np4 prefixes), each filtered by
    * the choice (the sim_split_serve_planned arm pattern: measure,
    * decide and serve in ONE WITH). */
  private def nprobePlannedSql: String = {
    def arm(k: Int): String =
      ivfChainCtesFor(s"np$k", k) +
      s", np${k}t AS (SELECT a_id, b_id, rn, sim FROM np${k}r " +
      s"WHERE rn <= 3 AND (SELECT chosen FROM npch) = $k)"
    val cm = Seq(1, 2, 4).map { k =>
      s"SELECT $k AS k, " +
      s"(SELECT count(*) FROM swcand WHERE prn <= $k) AS n_cand, " +
      s"(SELECT count(*) FROM (SELECT a_id, b_id FROM swexr " +
      s"INTERSECT SELECT a_id, b_id FROM sw${k}s) h) AS n_hit"
    }.mkString(" UNION ALL ")
    "WITH " + nprobeSweepChainSql +
    s", npcm AS ($cm), " +
    "npch AS (SELECT max(m.k) AS chosen FROM npcm m CROSS JOIN " +
    "(SELECT n_cand AS c1, n_hit AS h1 FROM npcm WHERE k = 1) b " +
    s"WHERE (m.n_hit - b.h1) * $NprobePlanCandPerHit >= (m.n_cand - b.c1)), " +
    Seq(1, 2, 4).map(arm).mkString(", ") +
    " SELECT a_id, b_id, rn, sim, " +
    "CAST((SELECT chosen FROM npch) AS INTEGER) AS nprobe_used " +
    "FROM (SELECT * FROM np1t UNION ALL SELECT * FROM np2t " +
    "UNION ALL SELECT * FROM np4t) u"
  }

  /** The sim_knn_mutual oracle's full CTE chain through `mu` (mutual
    * edges, a_id < b_id) — shared with Graph's triangle/label-prop
    * oracles so the similarity graph can never drift from its
    * consumers. */
  private[ext] def knnMutualCteSql: String =
    ivfTopKCteSql + ", t AS (SELECT a_id, b_id, sim FROM r WHERE rn <= 3), " +
    "mu AS (SELECT t.a_id, t.b_id, t.sim FROM t JOIN t u " +
    "ON t.a_id = u.b_id AND t.b_id = u.a_id WHERE t.a_id < t.b_id)"

  /** The sim_nn_descent chain through `ndr` (refined ranking) — shared
    * by the descent and its recall eval so the two can never drift.
    * Composes [[knnMutualCteSql]]; nd-prefixed names stay disjoint from
    * the composed chain's claims. */
  private def nnDescentCteSql: String =
    knnMutualCteSql +
    ", nda AS (SELECT a_id AS v, b_id AS n FROM mu " +
    "UNION ALL SELECT b_id AS v, a_id AS n FROM mu), " +
    "ndw AS (SELECT DISTINCT x.n AS a_id, y.n AS b_id " +
    "FROM nda x JOIN nda y ON x.v = y.v WHERE x.n <> y.n), " +
    "nds AS (SELECT w.a_id, w.b_id, " +
    "round((list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
    "FROM ndw w JOIN embeddings ea ON ea.vec_id = w.a_id " +
    "JOIN embeddings eb ON eb.vec_id = w.b_id), " +
    "ndu AS (SELECT DISTINCT a_id, b_id, sim FROM " +
    "(SELECT a_id, b_id, sim FROM t UNION ALL SELECT a_id, b_id, sim FROM nds)), " +
    "ndr AS (SELECT a_id, b_id, sim, row_number() OVER (PARTITION BY a_id " +
    "ORDER BY sim DESC, b_id ASC) AS rn FROM ndu)"

  /** The sim_ivf_topk oracle's full CTE chain through `r` (ranked
    * multi-probe candidates) — shared by the top-k and mutual-kNN
    * oracles so the two can never drift. */
  /** The cell-split chain through `csp` (hot-cell member→child picks) —
    * cs-prefixed names cso/csh/csm/css/csa/csp claimed; composed over
    * [[ivfTopKCteSql]]'s `home` by the sim_cell_split report AND the
    * sim_split_topk / sim_split_recall_eval serve chain (the audited
    * split and the applied split can never drift). Threshold literal =
    * [[SplitOccupancy]]; model = median-τ bisection (seed direction =
    * the lowest member id's embedding, τ = the lower-median 6-dp
    * member cosine to it, rank (n+1) div 2 under (s0sim desc, vec_id
    * asc)); sub 0 iff s0sim ≥ τ. */
  private def cellSplitCteSql: String = cellSplitRoundCtesFor("cs", "home")

  /** ONE split round's CTEs, generated per (prefix, source assignment
    * relation) — the bpeChainCteSqlFor discipline applied to the split:
    * the ("cs", "home") instance IS the audited depth-1 chain
    * byte-for-byte (CellSplitSpec pins the literal), and the deep
    * chain's rounds k ≥ 2 are the SAME generator over the previous
    * round's map — the audited rule and the recursed rule can never
    * drift. Emits `<pfx>o/h/m/g/d/t/s/p`: g = the seed direction
    * (lowest member id), d = member→seed 6-dp sims, t = τ (the exact
    * lower-median selection, rank (n+1) div 2 under (s0sim desc,
    * vec_id asc)), s = the per-cell model (seed embedding + τ), p =
    * the threshold child picks. */
  private[graft] def cellSplitRoundCtesFor(pfx: String, src: String): String =
    s"${pfx}o AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_before " +
    s"FROM $src GROUP BY cell), " +
    s"${pfx}h AS (SELECT cell FROM ${pfx}o WHERE n_before > 32), " +
    s"${pfx}m AS (SELECT h.cell, h.vec_id, e.embedding FROM $src h " +
    s"JOIN ${pfx}h USING (cell) JOIN embeddings e ON e.vec_id = h.vec_id), " +
    s"${pfx}g AS (SELECT cell, min(vec_id) AS v0 FROM ${pfx}m GROUP BY cell), " +
    s"${pfx}d AS (SELECT m.cell, m.vec_id, " +
    "round((list_cosine_similarity(m.embedding::DOUBLE[], " +
    "e.embedding::DOUBLE[])) * 1e6) / 1e6 AS s0sim " +
    s"FROM ${pfx}m m JOIN ${pfx}g g ON g.cell = m.cell " +
    "JOIN embeddings e ON e.vec_id = g.v0), " +
    s"${pfx}t AS (SELECT cell, s0sim AS tau FROM (SELECT cell, s0sim, " +
    "row_number() OVER (PARTITION BY cell " +
    "ORDER BY s0sim DESC, vec_id ASC) AS srn, " +
    s"count(*) OVER (PARTITION BY cell) AS n FROM ${pfx}d) q " +
    "WHERE srn = (n + 1) // 2), " +
    s"${pfx}s AS (SELECT g.cell, e.embedding, t.tau FROM ${pfx}g g " +
    "JOIN embeddings e ON e.vec_id = g.v0 " +
    s"JOIN ${pfx}t t ON t.cell = g.cell), " +
    s"${pfx}p AS (SELECT d.cell, d.vec_id, " +
    "CAST(CASE WHEN d.s0sim >= t.tau THEN 0 ELSE 1 END AS INTEGER) AS sub " +
    s"FROM ${pfx}d d JOIN ${pfx}t t ON t.cell = d.cell)"

  /** The post-round full assignment map `<pfx>i` (vec_id, cell) —
    * [[nextSplitAsg]]'s mirror: hot members to cell·2 + sub, cool
    * sources to cell·2. */
  private def splitMapCteFor(pfx: String, src: String): String =
    s"${pfx}i AS (SELECT vec_id, CAST(cell * 2 + sub AS BIGINT) AS cell " +
    s"FROM ${pfx}p " +
    s"UNION ALL SELECT h.vec_id, CAST(h.cell * 2 AS BIGINT) AS cell " +
    s"FROM $src h LEFT JOIN ${pfx}h ON ${pfx}h.cell = h.cell " +
    s"WHERE ${pfx}h.cell IS NULL)"

  /** The probe-side descent `<pfx>z`/`<pfx>q` over probe source `psrc`
    * — [[probeDescend]]'s mirror: a probed hot cell routes by its own
    * `s0sim ≥ τ` compare (the exact member rule), a cool one maps to
    * cell·2. */
  private def probeDescendCteFor(pfx: String, psrc: String): String =
    probeDescendCtesFor(pfx, pfx, psrc)

  /** The descent with SEPARATE output and model prefixes — the
    * incremental serve descends one probe stream through TWO rounds'
    * models (ics then jcs), so the output names can't reuse the model
    * prefix; the (pfx, pfx, psrc) instance is [[probeDescendCteFor]]
    * byte-for-byte. */
  private def probeDescendCtesFor(outPfx: String, modelPfx: String,
                                  psrc: String): String =
    s"${outPfx}z AS (SELECT pb.vec_id, pb.cell, s.tau, " +
    "round((list_cosine_similarity(e.embedding::DOUBLE[], " +
    "s.embedding::DOUBLE[])) * 1e6) / 1e6 AS s0sim " +
    s"FROM $psrc pb JOIN ${modelPfx}s s ON s.cell = pb.cell " +
    "JOIN embeddings e ON e.vec_id = pb.vec_id), " +
    s"${outPfx}q AS (SELECT vec_id, CAST(cell * 2 + " +
    "CASE WHEN s0sim >= tau THEN 0 ELSE 1 END AS BIGINT) AS cell " +
    s"FROM ${outPfx}z " +
    s"UNION ALL SELECT pb.vec_id, CAST(pb.cell * 2 AS BIGINT) AS cell " +
    s"FROM $psrc pb LEFT JOIN ${modelPfx}h ON ${modelPfx}h.cell = pb.cell " +
    s"WHERE ${modelPfx}h.cell IS NULL)"

  /** Round-k prefix of the deep chain: round 1 is "cs" (the audited
    * depth-1 names), round k ≥ 2 is "cs<k>" — cs<k>-prefixed names
    * cs2o/h/m/s/a/p/i/z/q claimed per depth. */
  private def splitRoundPfx(k: Int): String = if (k == 1) "cs" else s"cs$k"

  /** The full depth-d chain: per round, the index-side split CTEs +
    * the assignment map + the probe descent; round 1 sources `home` /
    * `probes` (ivfTopKCteSql's names), round k the previous round's
    * `<pfx>i` / `<pfx>q`. Consumed by sim_cell_split_deep (index side
    * only — unreferenced probe CTEs are free in DuckDB) and
    * sim_split_deep_topk (both sides). */
  private def splitDeepChainSql(depth: Int): String =
    (1 to depth).map { k =>
      val pfx = splitRoundPfx(k)
      val src = if (k == 1) "home" else s"${splitRoundPfx(k - 1)}i"
      val psrc = if (k == 1) "probes" else s"${splitRoundPfx(k - 1)}q"
      cellSplitRoundCtesFor(pfx, src) + ", " +
        splitMapCteFor(pfx, src) + ", " + probeDescendCteFor(pfx, psrc)
    }.mkString(", ")

  /** The deep report's snapshot UNION (no ORDER BY): snapshot k = the
    * occupancy agg of round k+1's source (`<pfx>o`), snapshot depth =
    * a fresh agg over the final map. Shared by sim_cell_split_deep and
    * the sim_split_plan chooser (measure → decide lockstep). */
  private def splitDeepSnapshotsSql: String = snapUnionSqlFor(splitRoundPfx)

  /** ONE definition site for the snapshot SELECT shape (round /
    * n_cells / n_hot / max_occ) — shared by the deep-report chain
    * ([[splitDeepSnapshotsSql]], [[splitRoundPfx]] rounds) and the
    * deep-incremental oracle ([[incRoundPfx]] rounds); a shape change
    * moves both generators AND the Spark-side snap() together
    * (ADVICE r18: three hand-kept copies of the same literal). */
  private def snapSelectSql(k: Int, from: String): String =
    s"SELECT CAST($k AS BIGINT) AS round, " +
    "CAST(count(*) AS BIGINT) AS n_cells, " +
    s"CAST(sum(CASE WHEN n_before > $SplitOccupancy THEN 1 ELSE 0 END) " +
    "AS BIGINT) AS n_hot, " +
    s"CAST(max(n_before) AS BIGINT) AS max_occ FROM $from"

  /** The snapshot UNION over a round-prefix function (no ORDER BY):
    * snapshot k = the occupancy agg of round k+1's source (`<pfx>o`),
    * snapshot depth = a fresh agg over the final map `<pfx>i`. */
  private def snapUnionSqlFor(roundPfx: Int => String): String = {
    val snaps = (0 until SplitDepth).map { k =>
      snapSelectSql(k, s"${roundPfx(k + 1)}o")
    } :+ snapSelectSql(SplitDepth,
      "(SELECT cell, CAST(count(*) AS BIGINT) AS n_before " +
      s"FROM ${roundPfx(SplitDepth)}i GROUP BY cell) fz")
    snaps.mkString(" UNION ALL ")
  }

  /** sim_split_incremental's oracle — a FROM-SCRATCH rebuild of the
    * combined-corpus split round (hash equality proves the
    * pruned-postings incremental path ≡ rebuild): the shared
    * [[incAssignCteSql]] frozen-quantizer chain, base home (ibs/ibh)
    * and arrival home (ias/iah) against the frozen `iicl` centroids,
    * the base depth-1 split round (ics-prefixed, the SAME round
    * generator) + its map (icsi) + the arrival descent (icsz/icsq),
    * the combined map (icb), and the incremental round (jcs-prefixed)
    * with the sim_cell_split report tail. Split literal 250 = the
    * CountMemo n/2 at sf0.01 (lockstep with the runtime knob). */
  /** The frozen-quantizer home CTE pair `<pfx>s/<pfx>h` over `iicl`. */
  private def frozenHomeCteFor(pfx: String, where: String): String =
    s"${pfx}s AS (SELECT e.vec_id, t.cell, " +
    "round((list_cosine_similarity(e.embedding::DOUBLE[], t.cv)) * 1e6) " +
    "/ 1e6 AS csim " +
    s"FROM embeddings e CROSS JOIN iicl t WHERE $where), " +
    s"${pfx}h AS (SELECT vec_id, cell FROM (SELECT vec_id, cell, " +
    "row_number() OVER (PARTITION BY vec_id " +
    s"ORDER BY csim DESC, cell ASC) AS rn FROM ${pfx}s) WHERE rn = 1)"

  /** The incremental chain through the jcs round CTEs — shared by the
    * sim_split_incremental report and the sim_split_incremental_serve
    * round trip (maintenance and serving can never drift). */
  private def splitIncrementalChainSql: String =
    s"WITH $incAssignCteSql, " +
    frozenHomeCteFor("ib", "e.vec_id < 250") + ", " +
    cellSplitRoundCtesFor("ics", "ibh") + ", " +
    splitMapCteFor("ics", "ibh") + ", " +
    frozenHomeCteFor("ia", "e.vec_id >= 250") + ", " +
    probeDescendCteFor("ics", "iah") + ", " +
    "icb AS (SELECT vec_id, cell FROM icsi " +
    "UNION ALL SELECT vec_id, cell FROM icsq), " +
    cellSplitRoundCtesFor("jcs", "icb")

  private def splitIncrementalOracleSql: String = {
    splitIncrementalChainSql + ", " +
    "jcsc AS (SELECT cell, " +
    "CAST(sum(CASE WHEN sub = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0, " +
    "CAST(sum(CASE WHEN sub = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1 " +
    "FROM jcsp GROUP BY cell) " +
    "SELECT o.cell, o.n_before, " +
    "CAST(c.cell IS NOT NULL AS INTEGER) AS split, " +
    "coalesce(c.c0, CAST(0 AS BIGINT)) AS n_child0, " +
    "coalesce(c.c1, CAST(0 AS BIGINT)) AS n_child1, " +
    "coalesce(greatest(c.c0, c.c1), o.n_before) AS n_max_after " +
    "FROM jcso o LEFT JOIN jcsc c USING (cell) ORDER BY o.cell"
  }

  /** sim_split_incremental_serve's oracle — from-scratch rebuild of
    * the maintained-index SERVE: the shared incremental chain, the
    * final index map (jcsi), the all-vector frozen-quantizer probe
    * ranking (ipa/ipb, rn ≤ NProbe), the probe descent folded through
    * BOTH rounds' models (ip1 over ics, ip2 over jcs — the
    * two-prefix descent generator), and the capped pair + rerank tail
    * (ivb/ivm/ivq/ivr, the dz tail's shape). Hash equality proves
    * serving the persisted maintained index ≡ serving a from-scratch
    * build of the combined corpus. */
  private def splitIncrementalServeOracleSql: String =
    splitIncrementalChainSql + ", " +
    splitMapCteFor("jcs", "icb") + ", " +
    "ipa AS (SELECT e.vec_id, t.cell, " +
    "round((list_cosine_similarity(e.embedding::DOUBLE[], t.cv)) * 1e6) " +
    "/ 1e6 AS csim FROM embeddings e CROSS JOIN iicl t), " +
    "ipb AS (SELECT vec_id, cell FROM (SELECT vec_id, cell, " +
    "row_number() OVER (PARTITION BY vec_id " +
    s"ORDER BY csim DESC, cell ASC) AS rn FROM ipa) WHERE rn <= $NProbe), " +
    probeDescendCtesFor("ip1", "ics", "ipb") + ", " +
    probeDescendCtesFor("ip2", "jcs", "ip1q") + ", " +
    "ivb AS (SELECT e.vec_id, e.embedding, i.cell AS ncell " +
    "FROM embeddings e JOIN jcsi i ON e.vec_id = i.vec_id " +
    "QUALIFY row_number() OVER (PARTITION BY i.cell " +
    s"ORDER BY ${saltOrdSql("e.vec_id")}, e.vec_id) <= 1024), " +
    "ivm AS (SELECT e.vec_id, e.embedding, p.cell AS ncell " +
    "FROM embeddings e JOIN ip2q p ON e.vec_id = p.vec_id), " +
    "ivq AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
    "round((list_cosine_similarity(x.embedding::DOUBLE[], " +
    "y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
    "FROM ivm x JOIN ivb y ON x.ncell = y.ncell AND x.vec_id <> y.vec_id), " +
    "ivr AS (SELECT a_id, b_id, sim, row_number() OVER (PARTITION BY a_id " +
    "ORDER BY sim DESC, b_id ASC) AS rn FROM ivq) " +
    "SELECT a_id, b_id, rn, sim FROM ivr WHERE rn <= 3"

  /** Incremental-round prefix: round 1 = "jcs" (the audited
    * [[splitIncrementalChainSql]] round), round k = the next letter —
    * kcs, lcs, … (names claimed per depth). */
  private def incRoundPfx(k: Int): String = s"${('i' + k).toChar}cs"

  /** sim_split_incremental_deep's oracle — the incremental chain
    * folded through [[SplitDepth]] from-scratch rounds (round k ≥ 2 =
    * the SAME round generator over round k−1's full map), with the
    * [[splitDeepSnapshotsSql]]-shaped trajectory union: snapshot 0 =
    * the combined occupancy (round 1's own `jcso`), snapshot k = the
    * occupancy after k rounds. Hash equality proves the
    * pruned-persisted iterated maintenance ≡ this rebuild. */
  private def splitIncrementalDeepOracleSql: String = {
    val rounds = (1 to SplitDepth).map { k =>
      val maps = splitMapCteFor(incRoundPfx(k),
        if (k == 1) "icb" else s"${incRoundPfx(k - 1)}i")
      if (k == 1) maps
      else cellSplitRoundCtesFor(incRoundPfx(k),
        s"${incRoundPfx(k - 1)}i") + ", " + maps
    }.mkString(", ")
    splitIncrementalChainSql + ", " + rounds + " " +
      snapUnionSqlFor(incRoundPfx) + " ORDER BY round"
  }

  /** sim_split_serve_planned's oracle — ONE WITH composing the deep
    * chain (round 1 = the audited cs split), the st depth-1 serve
    * tail, the dz depth-2 serve tail, and the [[splitPlanOracleSql]]
    * chooser (spl/plc); the final union has one arm per possible
    * depth, each filtered by the chosen value (sentinel 1e9 and
    * converged 0 both route to the UNSPLIT `r` arm with depth_used 0 —
    * the fail-closed contract). Arms mirror [[SplitDepth]] = 2. */
  private def plannedServeOracleSql: String =
    ivfTopKCteSql + ", " + splitDeepChainSql(SplitDepth) + ", " +
    splitServeTailFor("st", "cs") + ", " +
    splitDeepServeTailSql + ", " +
    s"spl AS ($splitDeepSnapshotsSql), " +
    "plc AS (SELECT coalesce(min(CASE WHEN n_hot = 0 THEN round END), " +
    "CAST(1000000000 AS BIGINT)) AS chosen FROM spl) " +
    "SELECT a_id, b_id, rn, sim, CAST(0 AS BIGINT) AS depth_used " +
    "FROM r, plc WHERE rn <= 3 " +
    "AND (plc.chosen = 0 OR plc.chosen = 1000000000) " +
    "UNION ALL SELECT a_id, b_id, rn, sim, CAST(1 AS BIGINT) AS depth_used " +
    "FROM str, plc WHERE rn <= 3 AND plc.chosen = 1 " +
    "UNION ALL SELECT a_id, b_id, rn, sim, CAST(2 AS BIGINT) AS depth_used " +
    "FROM dzr, plc WHERE rn <= 3 AND plc.chosen = 2"

  /** sim_cell_split_deep's oracle. */
  private def splitDeepReportOracleSql: String =
    ivfTopKCteSql + ", " + splitDeepChainSql(SplitDepth) + " " +
      splitDeepSnapshotsSql + " ORDER BY round"

  /** sim_split_plan's oracle — the chooser over the SAME snapshot
    * union (spl CTE): smallest all-cool round, fail-closed sentinel
    * 1e9 / converged 0 when none qualifies, final-snapshot context. */
  private def splitPlanOracleSql: String =
    ivfTopKCteSql + ", " + splitDeepChainSql(SplitDepth) + ", " +
    s"spl AS ($splitDeepSnapshotsSql) " +
    "SELECT coalesce(min(CASE WHEN n_hot = 0 THEN round END), " +
    "CAST(1000000000 AS BIGINT)) AS chosen_depth, " +
    "CAST(min(CASE WHEN n_hot = 0 THEN round END) IS NOT NULL " +
    "AS INTEGER) AS converged, " +
    s"max(CASE WHEN round = $SplitDepth THEN n_hot END) AS n_hot_final, " +
    s"max(CASE WHEN round = $SplitDepth THEN max_occ END) AS max_occ_final " +
    "FROM spl"

  /** The deep-serve CTE chain through `dzr` (dz-prefixed serve tail —
    * same saltOrd cap + (sim desc, b_id asc) rerank as the depth-1
    * serve — over the final index map and final probe map); shared by
    * sim_split_deep_topk and its recall eval. */
  private def splitDeepServeCteSql: String =
    ivfTopKCteSql + ", " + splitDeepChainSql(SplitDepth) + ", " +
    splitDeepServeTailSql

  /** The deep-serve dz tail alone — composed by [[splitDeepServeCteSql]]
    * and re-used (with the st tail and the plan chooser) by the
    * plan-driven serve's arm union. */
  private def splitDeepServeTailSql: String =
    s"dzb AS (SELECT e.vec_id, e.embedding, i.cell AS ncell " +
    s"FROM embeddings e JOIN ${splitRoundPfx(SplitDepth)}i i " +
    "ON e.vec_id = i.vec_id " +
    "QUALIFY row_number() OVER (PARTITION BY i.cell " +
    s"ORDER BY ${saltOrdSql("e.vec_id")}, e.vec_id) <= 1024), " +
    s"dzm AS (SELECT e.vec_id, e.embedding, p.cell AS ncell " +
    s"FROM embeddings e JOIN ${splitRoundPfx(SplitDepth)}q p " +
    "ON e.vec_id = p.vec_id), " +
    "dzq AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
    "round((list_cosine_similarity(x.embedding::DOUBLE[], " +
    "y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
    "FROM dzm x JOIN dzb y ON x.ncell = y.ncell AND x.vec_id <> y.vec_id), " +
    "dzr AS (SELECT a_id, b_id, sim, row_number() OVER (PARTITION BY a_id " +
    "ORDER BY sim DESC, b_id ASC) AS rn FROM dzq)"

  private def splitDeepTopKOracleSql: String =
    splitDeepServeCteSql + " SELECT a_id, b_id, rn, sim FROM dzr WHERE rn <= 3"

  /** sim_split_deep_recall_eval's oracle — the st-eval tail with dz
    * names (probe literal 100, brute top-3 truth, integer micro
    * metric forms). */
  private def splitDeepRecallOracleSql: String =
    splitDeepServeCteSql + ", " +
    "dzex AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
    "round((list_cosine_similarity(x.embedding::DOUBLE[], " +
    "y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
    "FROM embeddings x JOIN embeddings y ON y.vec_id <> x.vec_id " +
    "WHERE x.vec_id < 100), " +
    "dzxr AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
    "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) " +
    "AS rn FROM dzex) e WHERE rn <= 3), " +
    "dzsc AS (SELECT a_id, b_id FROM dzr WHERE rn <= 3 AND a_id < 100), " +
    "dzht AS (SELECT a_id, b_id FROM dzxr JOIN dzsc USING (a_id, b_id)), " +
    "dzcm AS (SELECT (SELECT count(*) FROM dzxr) AS n_truth, " +
    "(SELECT count(*) FROM dzsc) AS n_screen, " +
    "(SELECT count(*) FROM dzht) AS n_hit) " +
    "SELECT CAST(n_truth AS BIGINT) AS n_truth, " +
    "CAST(n_screen AS BIGINT) AS n_screen, " +
    "CAST(n_hit AS BIGINT) AS n_hit, " +
    "CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
    "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_truth END AS recall_micro, " +
    "CASE WHEN n_screen = 0 THEN CAST(0 AS BIGINT) " +
    "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_screen END " +
    "AS precision_micro FROM dzcm"

  /** The split-serve chain through `str` (st-prefixed names sti/stph/
    * stp/stb/stm/stq/str claimed) — composes [[ivfTopKCteSql]] +
    * [[cellSplitCteSql]]; shared by sim_split_topk and its recall eval.
    * ncell = cell·2 + sub for hot members / cell·2 for cool (bijective);
    * probes route a probed hot cell by the model's s0sim ≥ τ compare
    * (ties to child 0); same saltOrd 1024 cap and (sim desc, b_id asc)
    * rerank as the unsplit serve. */
  /** The COMPLETE split-serve oracle — shared VERBATIM by
    * sim_split_topk and sim_split_persist (the persisted index serves
    * through the same [[splitServeFrom]] tail; only the storage
    * moved). */
  private lazy val splitTopKOracleSql: String =
    splitServeCteSql + " SELECT a_id, b_id, rn, sim FROM str WHERE rn <= 3"

  private def splitServeCteSql: String =
    ivfTopKCteSql + ", " + cellSplitCteSql + ", " +
    splitServeTailFor("st", "cs")

  /** The split-serve tail, generated per (serve prefix, split-round
    * prefix) — emits `<s>i/<s>ph/<s>p/<s>b/<s>m/<s>q/<s>r` over a
    * round's `<c>p/<c>h/<c>s` picks/hot-set/model plus the chain's
    * `home`/`probes` relations (whatever quantizer produced them).
    * The ("st", "cs") instance IS [[splitServeCteSql]]'s audited tail
    * byte-for-byte (CellSplitSpec pins the literal — the
    * cellSplitRoundCtesFor discipline applied to the serve), and the
    * ("tst", "tcs") instance serves the TRAINED split
    * (sim_split_topk_trained) over [[trainedChainToHomeSql]]'s
    * `home`/`probes` — the stub serve and the trained serve can never
    * drift. */
  private[graft] def splitServeTailFor(spfx: String, cspfx: String): String =
    s"${spfx}i AS (SELECT vec_id, CAST(cell * 2 + sub AS BIGINT) AS ncell " +
    s"FROM ${cspfx}p " +
    "UNION ALL SELECT h.vec_id, CAST(h.cell * 2 AS BIGINT) AS ncell " +
    s"FROM home h LEFT JOIN ${cspfx}h ON ${cspfx}h.cell = h.cell " +
    s"WHERE ${cspfx}h.cell IS NULL), " +
    s"${spfx}ph AS (SELECT pb.vec_id, pb.cell, s.tau, " +
    "round((list_cosine_similarity(e.embedding::DOUBLE[], " +
    "s.embedding::DOUBLE[])) * 1e6) / 1e6 AS s0sim " +
    s"FROM probes pb JOIN ${cspfx}s s ON s.cell = pb.cell " +
    "JOIN embeddings e ON e.vec_id = pb.vec_id), " +
    s"${spfx}p AS (SELECT vec_id, CAST(cell * 2 + " +
    "CASE WHEN s0sim >= tau THEN 0 ELSE 1 END AS BIGINT) AS ncell " +
    s"FROM ${spfx}ph " +
    "UNION ALL SELECT pb.vec_id, CAST(pb.cell * 2 AS BIGINT) AS ncell " +
    s"FROM probes pb LEFT JOIN ${cspfx}h ON ${cspfx}h.cell = pb.cell " +
    s"WHERE ${cspfx}h.cell IS NULL), " +
    s"${spfx}b AS (SELECT e.vec_id, e.embedding, i.ncell FROM embeddings e " +
    s"JOIN ${spfx}i i ON e.vec_id = i.vec_id " +
    s"QUALIFY row_number() OVER (PARTITION BY i.ncell " +
    s"ORDER BY ${saltOrdSql("e.vec_id")}, e.vec_id) <= 1024), " +
    s"${spfx}m AS (SELECT e.vec_id, e.embedding, p.ncell FROM embeddings e " +
    s"JOIN ${spfx}p p ON e.vec_id = p.vec_id), " +
    s"${spfx}q AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
    "round((list_cosine_similarity(x.embedding::DOUBLE[], " +
    "y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
    s"FROM ${spfx}m x JOIN ${spfx}b y ON x.ncell = y.ncell " +
    "AND x.vec_id <> y.vec_id), " +
    s"${spfx}r AS (SELECT a_id, b_id, sim, row_number() OVER (" +
    s"PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn FROM ${spfx}q)"

  /** The COMPLETE trained-split-serve oracle (sim_split_topk_trained) —
    * the SAME serve-tail generator over [[trainedChainToHomeSql]]'s
    * Lloyd-trained `home`/`probes` and the "tcs" split round the
    * sim_cell_split_trained report audits (report ≡ applied split, the
    * sim_split_topk rule lifted to the trained quantizer). */
  private def trainedSplitServeChainSql: String =
    trainedChainToHomeSql + ", " +
    cellSplitRoundCtesFor("tcs", "home") + ", " +
    splitServeTailFor("tst", "tcs")

  private def trainedSplitTopKOracleSql: String =
    trainedSplitServeChainSql +
    " SELECT a_id, b_id, rn, sim FROM tstr WHERE rn <= 3"

  /** One band probe-map CTE `<pfx>p` over [[splitServeCteSql]]'s
    * `stph` (probed-hot-cell s0sim/τ rows) and `probes`/`csh` (cool
    * branch) — [[probeDescendBand]]'s mirror: compare-selected child,
    * PLUS the other child when the exact integer µ distance
    * |round(s0sim·1e6) − round(τ·1e6)| is inside the margin, plus
    * cool cells at cell·2. `probeWhere` restricts the probe sample
    * (the sweep's vec_id < 100 arms); empty = all probes.
    * CONSTRAINT: `probeWhere` must be either empty or a predicate
    * BEGINNING with a bare column name (e.g. "vec_id < 100") — the
    * cool arm splices it as `pb.$probeWhere`, which alias-qualifies
    * only the FIRST column; a compound predicate ("vec_id < 100 AND
    * label = 'x'") would leave its later columns unqualified and
    * silently change the cool arm's filter (ADVICE r17). */
  private def bandProbeMapSqlFor(pfx: String, marginMicro: Long,
                                 probeWhere: String): String = {
    // enforce the splice constraint documented above instead of letting
    // a future compound predicate generate a subtly wrong cool arm
    // (ADVICE r18): must start with a bare column name, no AND/OR
    require(probeWhere.isEmpty ||
      (probeWhere.matches("^[a-z_][a-z0-9_]*\\s*[<>=!].*") &&
       !probeWhere.toUpperCase.contains(" AND ") &&
       !probeWhere.toUpperCase.contains(" OR ")),
      s"bandProbeMapSqlFor probeWhere must be a single bare-column " +
      s"predicate (the cool arm alias-qualifies only the first column): " +
      s"'$probeWhere'")
    val w1 = if (probeWhere.isEmpty) "" else s" WHERE $probeWhere"
    val w2 = if (probeWhere.isEmpty) "" else s" AND $probeWhere"
    s"${pfx}p AS (SELECT vec_id, CAST(cell * 2 + " +
    "CASE WHEN s0sim >= tau THEN 0 ELSE 1 END AS BIGINT) AS ncell " +
    s"FROM stph$w1 " +
    "UNION ALL SELECT vec_id, CAST(cell * 2 + " +
    "CASE WHEN s0sim >= tau THEN 1 ELSE 0 END AS BIGINT) AS ncell " +
    "FROM stph WHERE abs(CAST(round(s0sim * 1e6) AS BIGINT) - " +
    s"CAST(round(tau * 1e6) AS BIGINT)) < $marginMicro$w2 " +
    "UNION ALL SELECT pb.vec_id, CAST(pb.cell * 2 AS BIGINT) AS ncell " +
    "FROM probes pb LEFT JOIN csh ON csh.cell = pb.cell " +
    s"WHERE csh.cell IS NULL${if (probeWhere.isEmpty) ""
      else s" AND pb.$probeWhere"})"
  }

  /** The band serve tail `<pfx>m/<pfx>q/<pfx>r` from a band probe map
    * against the UNCHANGED split index side `stb` (the band is
    * query-time work only). */
  private def bandServeTailSqlFor(pfx: String): String =
    s"${pfx}m AS (SELECT e.vec_id, e.embedding, p.ncell " +
    s"FROM embeddings e JOIN ${pfx}p p ON e.vec_id = p.vec_id), " +
    s"${pfx}q AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
    "round((list_cosine_similarity(x.embedding::DOUBLE[], " +
    "y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
    s"FROM ${pfx}m x JOIN stb y ON x.ncell = y.ncell " +
    "AND x.vec_id <> y.vec_id), " +
    s"${pfx}r AS (SELECT a_id, b_id, sim, row_number() OVER (" +
    s"PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn FROM ${pfx}q)"

  /** The band-serve chain through `sbr` — composes [[splitServeCteSql]]
    * (sti/stb/stph and the split model come from there; its st-tail
    * probe CTEs stay unreferenced — free in DuckDB) with the sb-
    * prefixed band probe map + serve tail at the [[SplitBandMargin]]
    * literal; shared by sim_split_band_topk and its recall eval. */
  private def bandServeCteSql: String =
    splitServeCteSql + ", " +
    bandProbeMapSqlFor("sb", SplitBandMargin, "") + ", " +
    bandServeTailSqlFor("sb")

  private def bandTopKOracleSql: String =
    bandServeCteSql + " SELECT a_id, b_id, rn, sim FROM sbr WHERE rn <= 3"

  /** sim_split_band_recall_eval's oracle — the eval-family tail with
    * sb names (probe literal 100, brute top-3 truth, integer micro
    * metric forms). */
  private def bandRecallOracleSql: String =
    bandServeCteSql + ", " +
    "sbex AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
    "round((list_cosine_similarity(x.embedding::DOUBLE[], " +
    "y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
    "FROM embeddings x JOIN embeddings y ON y.vec_id <> x.vec_id " +
    "WHERE x.vec_id < 100), " +
    "sbxr AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
    "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) " +
    "AS rn FROM sbex) e WHERE rn <= 3), " +
    "sbsc AS (SELECT a_id, b_id FROM sbr WHERE rn <= 3 AND a_id < 100), " +
    "sbht AS (SELECT a_id, b_id FROM sbxr JOIN sbsc USING (a_id, b_id)), " +
    "sbcm AS (SELECT (SELECT count(*) FROM sbxr) AS n_truth, " +
    "(SELECT count(*) FROM sbsc) AS n_screen, " +
    "(SELECT count(*) FROM sbht) AS n_hit) " +
    "SELECT CAST(n_truth AS BIGINT) AS n_truth, " +
    "CAST(n_screen AS BIGINT) AS n_screen, " +
    "CAST(n_hit AS BIGINT) AS n_hit, " +
    "CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
    "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_truth END AS recall_micro, " +
    "CASE WHEN n_screen = 0 THEN CAST(0 AS BIGINT) " +
    "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_screen END " +
    "AS precision_micro FROM sbcm"

  /** The sweep's shared brute truth (bwx/bwxr) + one bw<i>-prefixed
    * probe-restricted arm per [[SplitBandSweepMargins]] entry
    * (generated from the SAME grid the Spark side folds — lockstep by
    * construction) — composed by the sweep oracle AND the planned-band
    * oracle, so the measure and the decision read ONE chain. */
  private def bandSweepArmsCtesSql: String = {
    val arms = SplitBandSweepMargins.zipWithIndex.map { case (m, i) =>
      val pfx = s"bw$i"
      bandProbeMapSqlFor(pfx, m, "vec_id < 100") + ", " +
      bandServeTailSqlFor(pfx) + ", " +
      s"${pfx}s AS (SELECT a_id, b_id FROM ${pfx}r WHERE rn <= 3), " +
      s"${pfx}c AS (SELECT (SELECT count(*) FROM ${pfx}q) AS n_cand, " +
      "(SELECT count(*) FROM bwxr) AS n_truth, " +
      s"(SELECT count(*) FROM ${pfx}s) AS n_screen, " +
      s"(SELECT count(*) FROM bwxr JOIN ${pfx}s USING (a_id, b_id)) " +
      "AS n_hit)"
    }
    "bwx AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
    "round((list_cosine_similarity(x.embedding::DOUBLE[], " +
    "y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
    "FROM embeddings x JOIN embeddings y ON y.vec_id <> x.vec_id " +
    "WHERE x.vec_id < 100), " +
    "bwxr AS (SELECT a_id, b_id FROM (SELECT a_id, b_id, " +
    "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) " +
    "AS rn FROM bwx) e WHERE rn <= 3), " +
    arms.mkString(", ")
  }

  /** sim_split_band_sweep's oracle — the shared arm chain + one
    * read-out row per grid margin. */
  private def bandSweepOracleSql: String = {
    val selects = SplitBandSweepMargins.zipWithIndex.map { case (m, i) =>
      s"SELECT CAST($m AS BIGINT) AS margin_micro, " +
      "CAST(n_cand AS BIGINT) AS n_cand, " +
      "CAST(n_truth AS BIGINT) AS n_truth, " +
      "CAST(n_screen AS BIGINT) AS n_screen, " +
      "CAST(n_hit AS BIGINT) AS n_hit, " +
      "CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) " +
      "ELSE (n_hit * CAST(1000000 AS BIGINT)) // n_truth END " +
      s"AS recall_micro FROM bw${i}c"
    }
    splitServeCteSql + ", " + bandSweepArmsCtesSql + " " +
    selects.mkString(" UNION ALL ") + " ORDER BY margin_micro"
  }

  /** sim_split_band_planned's oracle — ONE WITH composing the sweep's
    * shared arm chain (the measure), the cumulative-efficiency chooser
    * (bps/bpb/bpc — Δn_hit · [[BandPlanCandPerHit]] ≥ Δn_cand vs the
    * margin-0 arm, coalesced to the fail-closed 0), and one FULL-PROBE
    * serve arm per grid margin (bp<i>-prefixed; the margin-0 arm is
    * the split serve's own `str`), each filtered by the chosen margin
    * — the plannedServeOracleSql pattern applied to the band knob. */
  private def bandPlannedOracleSql: String = {
    val serveArms = SplitBandSweepMargins.zipWithIndex.collect {
      case (m, i) if m != 0L =>
        bandProbeMapSqlFor(s"bp$i", m, "") + ", " +
        bandServeTailSqlFor(s"bp$i")
    }
    val decision =
      "bps AS (" + SplitBandSweepMargins.zipWithIndex.map { case (m, i) =>
        s"SELECT CAST($m AS BIGINT) AS margin_micro, n_cand, n_hit " +
        s"FROM bw${i}c"
      }.mkString(" UNION ALL ") + "), " +
      "bpb AS (SELECT n_cand AS c0, n_hit AS h0 " +
      s"FROM bw${SplitBandSweepMargins.indexOf(0L)}c), " +
      "bpc AS (SELECT coalesce(max(CASE WHEN (s.n_hit - b.h0) * " +
      s"$BandPlanCandPerHit >= (s.n_cand - b.c0) THEN s.margin_micro " +
      "END), CAST(0 AS BIGINT)) AS chosen FROM bps s, bpb b)"
    val armSelects = SplitBandSweepMargins.zipWithIndex.map { case (m, i) =>
      val rel = if (m == 0L) "str" else s"bp${i}r"
      s"SELECT a_id, b_id, rn, sim, CAST($m AS BIGINT) AS margin_used " +
      s"FROM $rel, bpc WHERE rn <= 3 AND bpc.chosen = $m"
    }
    splitServeCteSql + ", " + bandSweepArmsCtesSql + ", " +
    (serveArms :+ decision).mkString(", ") + " " +
    armSelects.mkString(" UNION ALL ")
  }

  /** The stub-quantizer IVF serve chain at a name PREFIX and probe
    * WIDTH — the ("", [[NProbe]]) instance reproduces the audited
    * unprefixed chain BYTE-FOR-BYTE (NprobePlannedSpec pins the frozen
    * literal; [[ivfTopKCteSql]] IS that instance, so the chain's many
    * composers are untouched); sim_nprobe_planned's serve arms are the
    * np1/np2/np4 instances (the incScreenCtesFor extraction pattern). */
  private[graft] def ivfChainCtesFor(pfx: String, k: Int): String = {
    val (cN, sN, prN, probesN, homeN, mN, bcN, pN, rN) =
      (s"${pfx}c", s"${pfx}s", s"${pfx}pr", s"${pfx}probes", s"${pfx}home",
       s"${pfx}m", s"${pfx}bc", s"${pfx}p", s"${pfx}r")
    s"$cN AS (SELECT vec_id AS cell, embedding AS cv FROM embeddings WHERE vec_id < 16), " +
    s"$sN AS (SELECT e.vec_id, $cN.cell, " +
    s"round((list_cosine_similarity(e.embedding::DOUBLE[], $cN.cv::DOUBLE[])) * 1e6) / 1e6 AS csim " +
    s"FROM embeddings e CROSS JOIN $cN), " +
    s"$prN AS (SELECT vec_id, cell, row_number() OVER (" +
    s"PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn FROM $sN), " +
    s"$probesN AS (SELECT vec_id, cell FROM $prN WHERE rn <= $k), " +
    s"$homeN AS (SELECT vec_id, cell FROM $prN WHERE rn = 1), " +
    s"$mN AS (SELECT e.vec_id, e.embedding, p.cell FROM embeddings e JOIN $probesN p ON e.vec_id = p.vec_id), " +
    s"$bcN AS (SELECT e.vec_id, e.embedding, h.cell FROM embeddings e JOIN $homeN h ON e.vec_id = h.vec_id " +
    s"QUALIFY row_number() OVER (PARTITION BY h.cell ORDER BY ${saltOrdSql("e.vec_id")}, e.vec_id) <= 1024), " +
    s"$pN AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
    "round((list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
    s"FROM $mN x JOIN $bcN y ON x.cell = y.cell AND x.vec_id <> y.vec_id), " +
    s"$rN AS (SELECT a_id, b_id, sim, row_number() OVER (PARTITION BY a_id " +
    s"ORDER BY sim DESC, b_id ASC) AS rn FROM $pN)"
  }

  private def ivfTopKCteSql: String = "WITH " + ivfChainCtesFor("", NProbe)

  /** The filtered-search chain through `flpr` (fl-prefixed names
    * flc/fls/flp/flm/flb/flpr claimed; recall adds flsc/flex/flxr/
    * flht/flcm) — the composite (cell, label) key as join equality +
    * per-(cell,label) cap partition; shared by sim_filtered_topk and
    * sim_filtered_recall so serving and eval can never drift. */
  private def filteredCteSql: String =
    "flc AS (SELECT vec_id AS cell, embedding AS cv " +
    "FROM embeddings WHERE vec_id < 16), " +
    "fls AS (SELECT e.vec_id, c.cell, " +
    "round((list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[])) * 1e6) / 1e6 AS csim " +
    "FROM embeddings e CROSS JOIN flc c), " +
    "flp AS (SELECT vec_id, cell, row_number() OVER (" +
    "PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn FROM fls), " +
    "flm AS (SELECT e.vec_id, e.embedding, e.label, p.cell " +
    s"FROM embeddings e JOIN flp p ON e.vec_id = p.vec_id AND p.rn <= $NProbe " +
    "WHERE e.vec_id < 100), " +
    "flb AS (SELECT e.vec_id, e.embedding, e.label, h.cell " +
    "FROM embeddings e JOIN flp h ON e.vec_id = h.vec_id AND h.rn = 1 " +
    s"QUALIFY row_number() OVER (PARTITION BY h.cell, e.label " +
    s"ORDER BY ${saltOrdSql("e.vec_id")}, e.vec_id) <= 1024), " +
    "flpr AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id, " +
    "round((list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[])) * 1e6) / 1e6 AS sim " +
    "FROM flm x JOIN flb y ON x.cell = y.cell AND x.label = y.label " +
    "AND x.vec_id <> y.vec_id)"

  /** The RRF chain through `rfr` (rf-prefixed names rfa/rfb/rff/rfr
    * claimed; recall adds rfs/rft/rftr/rfht/rfcm) — composes
    * [[ivfTopKCteSql]]'s `r` and [[signCteSql]]'s `sgsh`; shared by
    * sim_rrf_fusion and sim_rrf_recall so the serving and eval paths
    * can never drift. Depth/K literals = [[RrfDepth]]/[[RrfK]]. */
  private def rrfCteSql: String =
    ivfTopKCteSql + ", " + signCteSql + ", " +
    s"rfa AS (SELECT a_id, b_id, rn AS ra FROM r WHERE a_id < 100 AND rn <= $RrfDepth), " +
    "rfb AS (SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id " +
    "ORDER BY hd ASC, b_id ASC) AS rb FROM sgsh), " +
    "rff AS (SELECT coalesce(a.a_id, b.a_id) AS a_id, " +
    "coalesce(a.b_id, b.b_id) AS b_id, " +
    s"coalesce(CAST(1000000 AS BIGINT) // ($RrfK + a.ra), 0) + " +
    s"coalesce(CAST(1000000 AS BIGINT) // ($RrfK + b.rb), 0) AS rrf_micro " +
    "FROM rfa a FULL JOIN rfb b ON a.a_id = b.a_id AND a.b_id = b.b_id), " +
    "rfr AS (SELECT a_id, b_id, rrf_micro, row_number() OVER (" +
    "PARTITION BY a_id ORDER BY rrf_micro DESC, b_id ASC) AS rn FROM rff)"

  /** The frontier oracle wraps the twelve REGISTERED leg oracles
    * verbatim as parenthesized subqueries (CTE names stay scoped per
    * leg) plus the inline nn_descent column rename — thirteen legs
    * total, so frontier and legs move together by construction. */
  private def frontierLegSql(m: String, q: String): String =
    s"SELECT '$m' AS method, n_truth, n_hit, recall_micro " +
    s"FROM (${oracleBase(q)}) f_$m"

  // Every registered Similarity oracle gets the DuckDB materialization
  // hint post-composition (see [[OracleHints.materializeCtes]] — the
  // VERDICT r18 item-1 fix): Similarity has no recursive CTEs, the
  // byte-frozen generator literals stay untouched at their definition
  // sites, and verbatim-pair oracles transform identically because
  // both names map the same val.
  val oracle: Map[String, String] = (oracleBase +
    ("sim_eval_frontier" ->
      ((Seq("band" -> "sim_split_band_recall_eval",
            "deepsplit" -> "sim_split_deep_recall_eval",
            "graph" -> "sim_graph_search_eval",
            "int8" -> "emb_int8_recall",
            "ivf" -> "sim_ivf_recall_eval",
            "jl" -> "sim_jl_recall",
            "matryoshka" -> "emb_matryoshka_recall",
            "rrf" -> "sim_rrf_recall",
            "sign" -> "emb_sign_recall",
            "split" -> "sim_split_recall_eval",
            "trained" -> "sim_trained_recall_eval",
            "trainedsplit" -> "sim_split_trained_recall_eval")
          .map { case (m, q) => frontierLegSql(m, q) } :+
         // descent's refined columns renamed to the frontier contract
         ("SELECT 'nn_descent' AS method, n_truth, n_hit_ref AS n_hit, " +
          "recall_ref_micro AS recall_micro " +
          s"FROM (${oracleBase("sim_nn_descent_eval")}) f_nnd"))
         .mkString(" UNION ALL ") + " ORDER BY method")))
    .map { case (k, v) => k -> OracleHints.materializeCtes(v) }
}
