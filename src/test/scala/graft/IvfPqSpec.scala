package graft

import graft.ext.Similarity
import org.apache.spark.sql.{functions => F}

/** IVF-PQ (sim_ivfpq_topk) — the composed residual index.
  *
  * Pins (a) the k-means contraction on the RESIDUAL codebook (one
  * Lloyd step never increases total quantization error), and (b) the
  * whole serving path — trained coarse probes, per-probed-cell query
  * residuals, ADC table, candidate sums, ranking — against an
  * INDEPENDENT driver-side recomputation from the raw embeddings and
  * trained centroids (the PqSpec discipline: a second implementation,
  * not the same code path twice). */
class IvfPqSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }
  /** Num.rnd's half-away-from-zero at 6 dp (math.round rounds negative
    * halves toward +inf — wrong mirror for csim, which can be < 0). */
  private def rnd6(x: Double): Double = {
    val y = x * 1e6
    (if (y < 0) -math.floor(-y + 0.5) else math.floor(y + 0.5)) / 1e6
  }

  private lazy val embs: Map[Long, Array[Double]] =
    Tables.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  /** Trained coarse centroids, pos-sorted (collected 6-dp means — the
    * spec's input, like PqSpec collects the codebook). */
  private lazy val cents: Map[Long, Array[Double]] =
    Similarity.ivfTrain(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).map { case (c, rows) =>
        c -> rows.sortBy(_._2).map(_._3).toArray }

  /** Driver-side trained coarse ranking: cells by (rounded csim desc,
    * cell asc) per vector. */
  private lazy val cellRank: Map[Long, Seq[Long]] = embs.map { case (id, v) =>
    val nrm = math.sqrt(dot(v, v))
    id -> cents.toSeq.map { case (c, cv) =>
      c -> rnd6(dot(v, cv) / (nrm * math.sqrt(dot(cv, cv))))
    }.sortBy { case (c, csim) => (-csim, c) }.map(_._1)
  }
  private lazy val homeD: Map[Long, Long] = cellRank.map { case (id, r) => id -> r.head }

  private def residual(id: Long, cell: Long): Array[Double] = {
    val v = embs(id); val c = cents(cell)
    Array.tabulate(v.length)(i => v(i) - c(i))
  }
  private def sub(r: Array[Double], s: Int): Array[Double] =
    r.slice(s * Similarity.PqSubDim, (s + 1) * Similarity.PqSubDim)

  test("one Lloyd step on the residual codebook does not increase quantization error") {
    val home = Similarity.ivfAssignTrained(spark, dir).select("vec_id", "cell")
    val rsubs = Similarity.residualSubs(spark, dir, home)
    val seed = rsubs.filter(F.col("vec_id") < Similarity.PqCodes)
      .select(F.col("sub"), F.col("vec_id").as("code"), F.col("sv").as("cv"),
              F.col("dxx").as("dcc"))
    val seedObj = Similarity.pqAssign(rsubs, seed)
      .agg(F.sum("d2")).head().getDouble(0)
    val trainedObj = Similarity.pqAssign(rsubs, Similarity.ivfpqCodebook(spark, dir))
      .agg(F.sum("d2")).head().getDouble(0)
    assert(trainedObj <= seedObj + 0.01,
      s"Lloyd step worsened residual objective: seed=$seedObj trained=$trainedObj")
    info(f"residual quantization objective: seed=$seedObj%.3f trained=$trainedObj%.3f")
  }

  test("IVF-PQ top-3 matches an independent driver-side recomputation") {
    val cb = Similarity.ivfpqCodebook(spark, dir).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Double](2).toArray)).toMap
    // driver-side residual codes: nearest trained sub-centroid per
    // (vector, sub), same rounded-d2 + lower-code tie-break
    val codesD: Map[(Long, Int), Long] = embs.keys.flatMap { id =>
      val res = residual(id, homeD(id))
      (0 until Similarity.PqSubs).map { s =>
        val sv = sub(res, s)
        val svv = dot(sv, sv)
        val best = (0L until Similarity.PqCodes.toLong).map { code =>
          val cv = cb((s, code))
          code -> rnd6((svv - 2 * dot(sv, cv)) + dot(cv, cv))
        }.sortBy { case (code, d2) => (d2, code) }.head._1
        (id, s) -> best
      }
    }.toMap
    val expected = (0L until Similarity.PqQueries.toLong).flatMap { q =>
      val probed = cellRank(q).take(Similarity.NProbe).toSet
      val qres = probed.map(c => c -> residual(q, c)).toMap
      val scored = embs.keys.filter(v => v != q && probed(homeD(v))).map { v =>
        val cell = homeD(v)
        val ts = (0 until Similarity.PqSubs).map { s =>
          val sv = sub(qres(cell), s)
          val cv = cb((s, codesD((v, s))))
          math.round(((dot(sv, sv) - 2 * dot(sv, cv)) + dot(cv, cv)) * 1e6)
        }.sum
        (v, ts)
      }.toSeq.sortBy { case (v, ts) => (ts, v) }
      scored.take(3).zipWithIndex.map { case ((v, ts), i) =>
        (q, v, i + 1, math.round(ts.toDouble / 1e6 * 1e6) / 1e6) }
    }.toSet
    val got = Similarity.ivfpqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(got === expected,
      s"missed=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    info(s"${got.size} IVF-PQ rows match the independent recomputation")
  }

  test("residuals within a cell are smaller than the raw vectors (the reason to encode residuals)") {
    val rawMass = embs.values.map(v => dot(v, v)).sum
    val resMass = embs.map { case (id, _) =>
      val r = residual(id, homeD(id)); dot(r, r) }.sum
    assert(resMass < rawMass,
      s"residual energy $resMass must be below raw energy $rawMass")
    info(f"energy: raw=$rawMass%.1f residual=$resMass%.1f (${100 * resMass / rawMass}%.1f%%)")
  }

  test("incremental assign == frozen-index recompute; batch side only") {
    // independent driver-side recompute: train one step on the corpus
    // half (seed assign -> 6-dp means), then nearest-frozen-centroid
    // per batch vector — the frozen-index contract
    val split = embs.size / 2
    def cos(a: Array[Double], b: Array[Double]): Double =
      rnd6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
    val seedIds = embs.keys.filter(_ < 16).toSeq.sorted
    val corpusIds = embs.keys.filter(_ < split).toSeq
    val assignSeed = corpusIds.map { id =>
      id -> seedIds.map(c => c -> cos(embs(id), embs(c)))
        .sortBy { case (c, s) => (-s, c) }.head._1
    }
    val trained = assignSeed.groupBy(_._2).map { case (cell, members) =>
      val vs = members.map(m => embs(m._1))
      cell -> Array.tabulate(vs.head.length) { i =>
        rnd6(vs.map(_(i)).sum / vs.length)
      }
    }
    val expected = embs.keys.filter(_ >= split).map { id =>
      val (cell, csim) = trained.toSeq.map { case (c, cv) =>
        c -> cos(embs(id), cv) }.sortBy { case (c, s) => (-s, c) }.head
      (id, cell, csim)
    }.toSet
    val got = ext.Similarity.ivfIncrementalAssign(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.map(_._1) == embs.keys.filter(_ >= split).toSet,
      "output must cover exactly the batch ids")
    assert(got == expected,
      s"missed=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("re-rank d2 is the exact float distance and orders the shortlist exactly") {
    // the recall-repair contract: whatever the ADC shortlist contains,
    // the re-ranked top-3 must equal an exact-L2 sort of that shortlist
    // computed independently from the raw floats
    val shortlist = Similarity.ivfpqTopK(spark, dir) // rn<=3 view of the memo
    val rerank = Similarity.ivfpqRerankTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(rerank.nonEmpty)
    rerank.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length))
      val qv = embs(q)
      rows.foreach { case (_, v, _, d2) =>
        val e = embs(v)
        val exact = rnd6((dot(qv, qv) - 2 * dot(qv, e)) + dot(e, e))
        assert(d2 == exact, s"q=$q v=$v d2=$d2 exact=$exact")
      }
      // within a query, ranks follow (d2, vec_id) exactly
      val sorted = rows.sortBy { case (_, v, _, d2) => (d2, v) }.map(_._2)
      assert(rows.sortBy(_._3).map(_._2).sameElements(sorted))
    }
  }
}
