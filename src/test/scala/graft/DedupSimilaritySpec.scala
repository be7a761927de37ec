package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Dedup + similarity semantics on a crafted corpus with KNOWN duplicate
  * structure (written as a documents.parquet fixture dir so the
  * (spark, dir) query contract is exercised end-to-end). */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft-dedup-fixture").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (0L, base, "en", "srcA", base.length.toLong),             // original
      (1L, base, "en", "srcB", base.length.toLong),             // exact dup of 0
      (2L, base + " phi", "en", "srcA", (base.length + 4).toLong), // near-dup of 0
      (3L, "one two three four five six seven eight nine ten eleven twelve",
        "en", "srcA", 60L),                                     // unrelated
      (4L, "  " + base.toUpperCase + "  ", "en", "srcC", base.length.toLong + 4)) // norm-dup
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dedup keeps min doc_id and counts copies") {
    val rows = ext.Dedup.exact(spark, fixtureDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(0L) === 2L) // docs 0 and 1 share text, survivor id 0
    assert(!rows.contains(1L))
  }

  test("media content-digest dedup folds byte-identical payloads") {
    // docs 0 and 1 share text, hence identical UTF-8 payload bytes
    val rows = ext.Multimodal.mediaDedup(spark, fixtureDir)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(rows(0L) === 2L)
    assert(!rows.contains(1L))
  }

  test("normalized dedup also folds case/whitespace variants") {
    // doc 4 differs only by case — lower+trim normalization folds it
    val plain = ext.Dedup.exact(spark, fixtureDir).count()
    val norm = ext.Dedup.exactNorm(spark, fixtureDir).count()
    assert(norm <= plain)
  }

  test("ngram jaccard finds the near-duplicate pair with exact counts") {
    val pairs = ext.Dedup.ngramJaccard(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))) // (a_id, b_id, inter, uni)
    // exact dup pair (0,1): identical shingle sets → inter == uni
    val p01 = pairs.find(p => p._1 == 0L && p._2 == 1L)
    assert(p01.isDefined, s"pairs were: ${pairs.mkString(",")}")
    assert(p01.get._3 === p01.get._4)
    // near-dup (0,2) shares most shingles
    assert(pairs.exists(p => p._1 == 0L && p._2 == 2L))
    // unrelated doc 3 pairs with nobody
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash LSH surfaces exact duplicates as candidates") {
    val pairs = ext.Dedup.minhashLsh(spark, fixtureDir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L))) // identical text → identical signature
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash of identical texts is identical; different texts differ") {
    val sh = ext.Dedup.simhash(spark, fixtureDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) === sh(1L))
    assert(sh(0L) !== sh(3L))
  }

  private lazy val embFixtureDir: String = {
    val dir = Files.createTempDirectory("graft-sim-fixture").toString
    val v1 = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val v2 = v1.map(x => x * 2.0f)           // same direction as v1
    val v3 = v1.map(x => -x)                 // opposite
    val v4 = Array.tabulate(64)(i => math.cos(3 * i + 7).toFloat) // other
    Seq((0L, v1.toSeq, 0), (1L, v2.toSeq, 0), (2L, v3.toSeq, 1), (3L, v4.toSeq, 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("cosine: same-direction = 1, opposite = -1, ranked correctly") {
    val top = ext.Similarity.bruteTopK(spark, embFixtureDir).collect()
    val byId = top.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(byId(1L) - 1.0) < 1e-9)   // scaled copy → cos 1
    assert(math.abs(byId(2L) + 1.0) < 1e-9)   // negated → cos -1
    assert(top.head.getLong(0) === 1L)        // ranked first
  }

  test("identical-direction vectors share an LSH bucket") {
    val b = ext.Similarity.lshBuckets(spark, embFixtureDir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(b(0L) === b(1L)) // sign pattern invariant under positive scaling
  }

  test("poly_hash custom expression: deterministic, order-sensitive, null-safe") {
    val df = Seq(Some("abc"), Some("acb"), Some(""), None).toDF("s")
      .select(org.apache.spark.sql.GraftSql.column(
        functions.PolyHash(org.apache.spark.sql.GraftSql.expression(col("s")))).as("h"))
    val rows = df.collect()
    val abc = rows(0).getLong(0)
    val acb = rows(1).getLong(0)
    assert(abc === functions.PolyHash.hashBytes("abc".getBytes("UTF-8")))
    assert(abc !== acb)           // order sensitivity
    assert(rows(2).getLong(0) === 0L)
    assert(rows(3).isNullAt(0))   // null in → null out
  }

  test("adaptive index sizing: oracle regime reproduced at sf0.01, grows with n") {
    // the static oracle SQL encodes 8 planes / 16 cells — these MUST be
    // what the formulas derive at the driver's verification scale (n=500)
    assert(ext.Similarity.numPlanes(500L) === 8)
    assert(ext.Similarity.ivfCells(500L) === 16)
    // growth at bench/production scales
    assert(ext.Similarity.numPlanes(5000L) === 10)   // 1024 buckets at sf0.1
    assert(ext.Similarity.numPlanes(5000000L) === 20) // clamped top
    assert(ext.Similarity.ivfCells(5000L) === 157)
    assert(ext.Similarity.ivfCells(1000000L) === 4096) // clamped top
    // monotonic non-decreasing (no scale regression as data grows)
    val planes = Seq(1L, 100L, 1000L, 10000L, 100000L).map(ext.Similarity.numPlanes)
    assert(planes === planes.sorted)
  }

  test("poly_hash_mod: single-pass expression matches the portable fold; null-safe") {
    import spark.implicits._
    val P1 = 1000000007L
    def refFold(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((acc, cp) => (acc * 31 + cp) % P1)
    val inputs = Seq(Some("hello world sample shingle"), Some(""), Some("naïve café"), None)
    val rows = inputs.toDF("s")
      .select(graft.functions.PolyHashMod.col(col("s"), 31L, P1).as("h"))
      .collect()
    assert(rows(0).getLong(0) === refFold("hello world sample shingle"))
    assert(rows(0).getLong(0) === 628018604L) // pinned: DuckDB list_reduce value
    assert(rows(1).getLong(0) === 0L)         // empty string → 0 (both engines)
    assert(rows(2).getLong(0) === refFold("naïve café")) // non-ASCII codepoint path
    assert(rows(3).isNullAt(0))               // null in → null out
  }

  test("hot-shingle DF cap: a boilerplate phrase shared by >cap docs yields no pairs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-hotshingle").toString
    val boiler = "this content is provided as is without any warranty"
    // 120 docs (> MaxShingleDf = 100) share ONLY the boilerplate 5-grams;
    // each doc's remaining text is unique → without the cap this would
    // produce 120*119/2 = 7140 candidate pairs from pure boilerplate
    val docs = (0 until 120).map { i =>
      (i.toLong, s"$boiler unique$i alpha$i beta$i gamma$i delta$i epsilon$i",
       "en", "srcX", 100L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(ext.Dedup.ngramJaccard(spark, dir).count() === 0L)
  }

  test("cluster propagation collapses an 80-doc near-dup chain within the round cap") {
    import spark.implicits._
    // doc i = phrase(i) ++ phrase(i+1): consecutive docs share exactly the
    // 4 five-grams inside the common 8-token phrase -> jaccard exactly 0.2
    // (passes), non-consecutive docs share nothing. Pure min-label
    // propagation needs ~79 rounds for this chain (over the 30-round cap);
    // pointer jumping collapses it in O(log n).
    val dir = Files.createTempDirectory("graft-chain").toString
    def phrase(k: Int) = (0 until 8).map(t => s"p${k}w$t").mkString(" ")
    val docs = (0 until 80).map { i =>
      (i.toLong, phrase(i) + " " + phrase(i + 1), "en", "srcC", 100L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cl = ext.Dedup.clusters(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl.size === 80 && cl.values.toSet === Set(0L)) // one component, min id
    val keep = ext.Dedup.keepList(spark, dir).collect()
    assert(keep.length === 1)
    assert(keep.head.getLong(0) === 0L && keep.head.getLong(1) === 80L)
  }

  test("incremental dedup screens the batch against the corpus only") {
    // split = 5/2 = 2: corpus {0,1}, batch {2,3,4}. Doc 2 is a near-dup
    // of corpus doc 0 (jaccard ~0.8 >= 1/2) -> dropped; doc 3 is
    // unrelated and doc 4 only matches after case-normalization (shingles
    // are case-sensitive) -> both kept.
    val rows = ext.Dedup.incremental(spark, fixtureDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(rows.keySet === Set(2L, 3L, 4L))
    assert(rows(2L)._1 >= 1L && rows(2L)._2 === 0)
    assert(rows(3L) === ((0L, 1)))
    assert(rows(4L) === ((0L, 1)))
  }

  test("containment catches doc-inside-doc that symmetric jaccard misses") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cont-fixture").toString
    // a 20-token quote fully embedded at the head of a 120-token page:
    // quote has 16 5-gram shingles, all shared; jaccard = 16/116 < 0.2
    // (missed) but containment = 16/16 = 1.0 (caught)
    val quote = (1 to 20).map(i => s"q$i").mkString(" ")
    val page = quote + " " + (1 to 100).map(i => s"f$i").mkString(" ")
    Seq((0L, quote, "en", "srcA", quote.length.toLong),
        (1L, page, "en", "srcB", page.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cont = ext.Dedup.containment(spark, dir).collect()
    assert(cont.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((0L, 1L)))
    val r = cont.head
    assert(r.getLong(2) === 16L)  // inter: every quote shingle
    assert(r.getLong(3) === 16L)  // sz_a
    assert(r.getLong(4) === 116L) // sz_b
    assert(ext.Dedup.jaccardPairsOf(Tables.documents(spark, dir)).count() === 0)
  }

  test("semantic dedup: one row per vector, per-cell min id always kept, " +
       "greedy rule consistent with confirmed pairs") {
    val out = ext.Similarity.semanticDedup(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val nVec = Tables.embeddings(spark, sf0001).count()
    assert(out.length.toLong === nVec)          // every vector judged once
    assert(out.map(_._1).distinct.length === out.length)
    // keep flag is exactly the n_dups_smaller == 0 predicate
    assert(out.forall { case (_, _, n, keep) => (keep == 1) == (n == 0L) })
    // the smallest vec_id in a cell can have no smaller in-cell dup
    out.groupBy(_._2).foreach { case (cell, members) =>
      val mn = members.minBy(_._1)
      assert(mn._4 === 1, s"cell $cell: min vec_id ${mn._1} must be kept")
    }
  }

  test("pairCandidates cap truncation is observable (metric counts dropped rows)") {
    import spark.implicits._
    // one bucket of 5 vectors, cap = 2: the b-side keeps ids 0,1 → 10
    // pairs survive, 3 b-rows are dropped — the observe metric must say so
    val emb = Seq.tabulate(5)(i => (i.toLong, Array(1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "bucket")
      .withColumn("nrm", lit(1.0))
    val pairs = ext.Similarity.pairCandidates(emb, "bucket", cap = 2)
    assert(pairs.collect().length === 5 * 2)
    // names carry a per-instance suffix (DUPLICATED_METRICS_NAME guard
    // in pairCandidatesAB) — match by prefix like CapMetrics does
    val m = pairs.queryExecution.observedMetrics
      .collectFirst { case (n, row) if n.startsWith("graft_bucket_cap_bucket") => row }
      .getOrElse(fail("no graft_bucket_cap_bucket* metric observed"))
    assert(m.getAs[Long]("rows_truncated") === 3L)
    assert(m.getAs[Number]("max_bucket_rows").intValue() === 5)
  }

  test("fuzzy dedup equals brute force restricted to same-block pairs") {
    val sf001 = "/root/testdata/sf0.01"
    val got = ext.Dedup.fuzzy(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(4))).toSet
    assert(got.nonEmpty)
    assert(got.forall { case (_, _, d) => d >= 1 && d <= 2 })
    // brute force over the distinct-name dictionary (tiny by design)
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
                           prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    val names = Tables.part(spark, sf001).select("p_name").distinct()
      .collect().map(_.getString(0))
    val brute = (for {
      x <- names; y <- names
      if x < y && x.split(" ")(1) == y.split(" ")(1) && lev(x, y) <= 2
    } yield (x, y, lev(x, y))).toSet
    assert(got === brute,
           s"blocked result differs from in-block brute force: " +
             s"missing=${brute -- got} extra=${got -- brute}")
  }

  test("fuzzy dedup output scales with the dictionary, not the row count") {
    // 4x-duplicated rows: same distinct names, so the SAME pairs at the
    // SAME distances must come back, with only the bearer counts scaled
    val sf001 = "/root/testdata/sf0.01"
    val base = ext.Dedup.fuzzy(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(4)) ->
                ((r.getLong(2), r.getLong(3)))).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzy-4x").toString
    val p = Tables.part(spark, sf001)
    p.unionAll(p).unionAll(p).unionAll(p)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val scaled = ext.Dedup.fuzzy(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(4)) ->
                ((r.getLong(2), r.getLong(3)))).toMap
    assert(scaled.keySet === base.keySet,
           "pair set changed under row duplication")
    base.foreach { case (k, (na, nb)) =>
      assert(scaled(k) === ((na * 4, nb * 4)),
             s"$k: bearer counts not scaled 4x: ${scaled(k)} vs ($na,$nb)")
    }
  }

  test("per-source entropy is positive and bounded by ln(vocab)") {
    val rows = ext.TextOps.entropy(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (vocab, h) = (r.getLong(2), r.getDouble(3))
      assert(h > 0.0, s"${r.getString(0)}: entropy $h not positive")
      assert(h <= math.log(vocab.toDouble) + 1e-6,
             s"${r.getString(0)}: entropy $h exceeds ln($vocab)")
    }
  }

  test("poly_hash registers and runs from SQL") {
    org.apache.spark.sql.GraftSql.register(spark, "poly_hash",
      exprs => functions.PolyHash(exprs.head))
    val got = spark.sql("SELECT poly_hash('abc') AS h").head().getLong(0)
    assert(got === functions.PolyHash.hashBytes("abc".getBytes("UTF-8")))
  }
}
