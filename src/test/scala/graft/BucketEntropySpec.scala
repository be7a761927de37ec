package graft

import org.apache.spark.sql.functions._

/** LSH bucket entropy (Similarity.bucketEntropy) and vocabulary growth
  * (TextOps.vocabGrowth): brute recomputes + structural invariants.
  */
class BucketEntropySpec extends SparkSpec {

  test("bucket entropy equals brute recompute from the bucket frame") {
    val buckets = ext.Similarity.queries("sim_lsh_buckets")(spark, sf0001)
      .collect().map(r => r.getInt(1))
    def lnM(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val cs = buckets.groupBy(identity).values.map(_.length.toLong).toSeq
    val n = cs.sum; val nb = cs.size.toLong
    val h = lnM(n) - cs.map(c => c * lnM(c)).sum / n
    val hMax = lnM(nb)
    val bal = if (nb == 1L) 1000000L else h * 1000000L / hMax
    val r = ext.Similarity.queries("sim_bucket_entropy")(spark, sf0001)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((nb, n, cs.max)))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) === ((h, hMax, bal)))
    assert(h >= 0L && h <= hMax + 1L)
    assert(nb > 1L, "single bucket — vacuous fixture")
  }

  test("cell balance equals brute entropy over the home-cell sizes") {
    val cells = ext.Similarity.queries("sim_ivf_assign")(spark, sf0001)
      .collect().map(r => r.getLong(r.fieldIndex("cell")))
    def lnM(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val cs = cells.groupBy(identity).values.map(_.length.toLong).toSeq
    val n = cs.sum; val nc = cs.size.toLong
    val h = lnM(n) - cs.map(c => c * lnM(c)).sum / n
    val r = ext.Similarity.queries("emb_cell_balance")(spark, sf0001)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((nc, n, cs.max)))
    assert(r.getLong(3) === h)
    assert(r.getLong(5) ===
      (if (nc == 1L) 1000000L else h * 1000000L / lnM(nc)))
  }

  test("label homophily equals brute recompute; signed index in bounds") {
    val mu = ext.Similarity.knnMutual(spark, sf0001)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val lab = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val pairs = mu.map { case (a, b) => (lab(a), lab(b)) }
    val nEdges = pairs.length.toLong
    val nSame = pairs.count(p => p._1 == p._2).toLong
    val obs = nSame * 1000000L / nEdges
    val ends = pairs.flatMap(p => Seq(p._1, p._2))
    val tot = BigInt(ends.length)
    val ssq = ends.groupBy(identity).values
      .map(v => BigInt(v.length) * BigInt(v.length)).sum
    val exp = ((ssq * 1000000) / (tot * tot)).toLong
    val hom = if (exp == 1000000L) 1000000L
              else (obs - exp) * 1000000L / (1000000L - exp)
    val r = ext.Graph.queries("graph_label_homophily")(spark, sf0001)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4)) === ((nEdges, nSame, obs, exp, hom)))
    assert(hom >= -1000000L && hom <= 1000000L)
  }

  test("vocab growth equals brute cumulative recompute; monotone") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val cuts = Seq(50L, 100L, 250L, 500L)
    val expect = cuts.map { cut =>
      val in = docs.filter(_._1 < cut)
      val toks = in.flatMap(_._2.split(" "))
      val nTok = toks.length.toLong
      val nVocab = toks.distinct.length.toLong
      (cut, in.length.toLong, nTok, nVocab, nVocab * 1000000L / nTok)
    }
    val got = ext.TextOps.queries("corpus_vocab_growth")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSeq.sortBy(_._1)
    assert(got === expect)
    // vocab and tokens are monotone in the cut; TTR is non-increasing
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(a._3 <= b._3 && a._4 <= b._4)
      assert(a._5 >= b._5, "TTR must fall as the corpus grows (Heaps)")
    }
  }
}
