package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — exact, n-gram Jaccard,
  * MinHash-LSH, SimHash (north star, BASELINE.json).
  *
  * Scale notes (100 TB): every variant is a pure shuffle-by-key pipeline —
  * no driver collection, no cross join. Candidate generation joins on
  * shingle / band-bucket keys whose fan-out is bounded by construction
  * (rare 5-gram shingles; 4-row MinHash bands), so the pairwise step
  * touches only near-duplicate candidates, never O(n²).
  *
  * Jaccard outputs are exact integers (intersection, union) — threshold
  * tests are integer comparisons, immune to float drift.
  */
object Dedup {

  /** Exact dedup: deterministic survivor (min doc_id) + multiplicity per
    * text key. `groupBy(key).agg(min(id))` rather than dropDuplicates so
    * the survivor is well-defined for the oracle. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("text")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** Exact dedup on normalized text (lower + trim + whitespace collapse). */
  def exactNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(regexp_replace(lower(trim(col("text"))), " +", " ").as("norm"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** Distinct (doc_id, shingle) pairs: word n-grams via slice over the
    * token array (higher-order functions, codegen-friendly, no UDF). */
  private[graft] def shingles(df: DataFrame, n: Int): DataFrame =
    df.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= n) // docs shorter than n yield no shingles
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(1, size(toks) - ${n - 1}), " +
                     s"i -> concat_ws(' ', slice(toks, i, $n)))")).as("sh"))
      .distinct()

  /** Exact n-gram Jaccard near-dup: candidate pairs share >= 1 word
    * 5-gram (rare by construction → small join fan-out), then exact
    * integer Jaccard over shingle sets, threshold 0.2. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // the shingle frame feeds four consumers (both join sides + both
    // size lookups) and the executed plan shows Catalyst does NOT reuse
    // its distinct-shuffle across them — persist materializes the
    // tokenize+explode+distinct once instead of 4 full recomputations
    // (at 100 TB: 1 shuffle instead of 4)
    val sh = shingles(Tables.documents(spark, dir), 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = sh.select(col("doc_id").as("a_id"), col("sh"))
    val b = sh.select(col("doc_id").as("b_id"), col("sh"))
    val inter = a.join(b, Seq("sh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a_id")
                 .withColumnRenamed("sz", "sz_a"), Seq("a_id"))
      .join(sizes.withColumnRenamed("doc_id", "b_id")
                 .withColumnRenamed("sz", "sz_b"), Seq("b_id"))
      .withColumn("uni", col("sz_a") + col("sz_b") - col("inter"))
      .filter(col("inter") * 5 >= col("uni")) // jaccard >= 0.2, exact ints
      .select("a_id", "b_id", "inter", "uni")
  }

  private val NumHashes = 32
  private val Bands = 8
  private val RowsPerBand = NumHashes / Bands

  /** MinHash + LSH banding near-dup. 32 minhashes from seeded xxhash64
    * over word 3-gram shingles; 8 bands × 4 rows; pairs colliding in any
    * band are candidates; exact integer Jaccard >= 0.5 confirms.
    * (xxhash64 is Spark-specific → no DuckDB oracle; rows-only check.) */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sh = shingles(docs, 3) // reused 4x, same rationale as ngramJaccard
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one strong hash over the shingle STRING, then 32 cheap permutation
    // hashes over that 8-byte long (wrap-around multiply would be the
    // classic derivation but Spark 4 ANSI rejects long overflow; hashing
    // the long costs far less than re-hashing the string 32×)
    val base = xxhash64(col("sh"))
    val sigCols = (0 until NumHashes)
      .map(j => min(xxhash64(lit(j), base)).as(s"h$j"))
    val sigs = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    val bandStructs = array((0 until Bands).map { bId =>
      val cols = (0 until RowsPerBand).map(r => col(s"h${bId * RowsPerBand + r}"))
      struct(lit(bId).as("band"), xxhash64(lit(1000 + bId) +: cols: _*).as("bh"))
    }: _*)
    val bands = sigs.select(col("doc_id"), explode(bandStructs).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val cand = bands.select(col("doc_id").as("a_id"), col("band"), col("bh"))
      .join(bands.select(col("doc_id").as("b_id"), col("band"), col("bh")),
            Seq("band", "bh"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    // confirm candidates with exact Jaccard — computed for CANDIDATE pairs
    // only (fan out candidates to their a-side shingles, then equi-join
    // the b-side), never for every shingle-sharing pair
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.withColumnRenamed("doc_id", "a_id"), Seq("a_id"))
      .join(sh.select(col("doc_id").as("b_id"), col("sh")), Seq("b_id", "sh"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a_id")
                 .withColumnRenamed("sz", "sz_a"), Seq("a_id"))
      .join(sizes.withColumnRenamed("doc_id", "b_id")
                 .withColumnRenamed("sz", "sz_b"), Seq("b_id"))
      .withColumn("uni", col("sz_a") + col("sz_b") - col("inter"))
      .filter(col("inter") * 2 >= col("uni")) // jaccard >= 0.5
      .select("a_id", "b_id", "inter", "uni")
  }

  /** 64-bit SimHash per document: token hash bits weighted ±1, summed,
    * sign → bit. (xxhash64-based → no oracle; rows-only check.) */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("th", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("th"), j).bitwiseAND(lit(1L)) === 1L, 1)
            .otherwise(-1)).as(s"b$j")
    }
    toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map { j =>
          when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
        }.reduce(_ + _).as("simhash"))
  }

  /** Connected-component clustering over near-dup pairs: iterative
    * min-label propagation (each round: label ← min(label, neighbors'
    * labels)) until fixpoint — the distributed keep-one-per-cluster step
    * a real dedup pipeline ends with. Converges in O(diameter) rounds;
    * every round is one shuffle-by-key join, no driver graph.
    * Cluster id = smallest doc_id reachable (deterministic); the oracle
    * reconstructs it with a recursive CTE. */
  def clusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = ngramJaccard(spark, dir).select("a_id", "b_id")
    val edges = pairs
      .unionByName(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .withColumnsRenamed(Map("a_id" -> "u", "b_id" -> "v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    var labels = docs.withColumn("cluster", col("doc_id"))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 30) {
      val neighborMin = edges
        .join(labels.withColumnsRenamed(Map("doc_id" -> "v", "cluster" -> "vc")),
              Seq("v"))
        .groupBy(col("u").as("doc_id"))
        .agg(min("vc").as("nmin"))
      val updated = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
                least(col("cluster"), coalesce(col("nmin"), col("cluster")))
                  .as("cluster"),
                (col("nmin") < col("cluster")).as("chg"))
      val mat = updated.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      changed = mat.filter(col("chg")).count()
      labels = mat.select("doc_id", "cluster")
      rounds += 1
    }
    edges.unpersist()
    labels
  }

  /** The end product of the dedup pipeline: the kept document set — one
    * survivor (min doc_id) per near-dup cluster, all singletons kept. */
  def keepList(spark: SparkSession, dir: String): DataFrame =
    clusters(spark, dir)
      .groupBy("cluster")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("cluster_size"))
      .select("doc_id", "cluster_size")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_keep"          -> keepList _,
    "dedup_clusters"      -> clusters _,
    "dedup_exact"         -> exact _,
    "dedup_exact_norm"    -> exactNorm _,
    "dedup_ngram_jaccard" -> ngramJaccard _,
    "dedup_minhash_lsh"   -> minhashLsh _,
    "dedup_simhash"       -> simhash _)

  /** Shared DuckDB CTE chain: word-5-gram shingles -> sizes -> candidate
    * pairs -> integer-Jaccard-thresholded pairs (`jac`). */
  private val ngramPairCte: String =
    "toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), " +
    "sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS s " +
    "FROM toks, UNNEST(range(1, greatest(len(t) - 3, 1))) AS u(i)), " +
    "sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id), " +
    "pr AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS inter " +
    "FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2), " +
    "jac AS (SELECT a_id, b_id, inter, sa.sz + sb.sz - inter AS uni FROM pr " +
    "JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id " +
    "WHERE inter * 5 >= sa.sz + sb.sz - inter)"

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      ("SELECT min(doc_id) AS keep_id, count(*) AS n_copies " +
       "FROM documents GROUP BY text"),
    "dedup_exact_norm" ->
      ("SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM documents " +
       "GROUP BY regexp_replace(lower(trim(text)), ' +', ' ', 'g')"),
    "dedup_ngram_jaccard" ->
      s"WITH $ngramPairCte SELECT a_id, b_id, inter, uni FROM jac",
    "dedup_clusters" ->
      (s"WITH RECURSIVE $ngramPairCte, " +
       "edges AS (SELECT a_id AS u, b_id AS v FROM jac " +
       "UNION SELECT b_id, a_id FROM jac), " +
       "reach(u, v) AS (SELECT u, v FROM edges " +
       "UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u) " +
       "SELECT d.doc_id, least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster " +
       "FROM documents d LEFT JOIN reach r ON r.u = d.doc_id GROUP BY d.doc_id"),
    "dedup_keep" ->
      (s"WITH RECURSIVE $ngramPairCte, " +
       "edges AS (SELECT a_id AS u, b_id AS v FROM jac " +
       "UNION SELECT b_id, a_id FROM jac), " +
       "reach(u, v) AS (SELECT u, v FROM edges " +
       "UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), " +
       "lab AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster " +
       "FROM documents d LEFT JOIN reach r ON r.u = d.doc_id GROUP BY d.doc_id) " +
       "SELECT min(doc_id) AS doc_id, count(*) AS cluster_size FROM lab GROUP BY cluster"))
    // dedup_minhash_lsh / dedup_simhash: Spark-hash-specific, no oracle.
}
