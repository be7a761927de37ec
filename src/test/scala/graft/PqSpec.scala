package graft

import graft.ext.Similarity
import org.apache.spark.sql.{functions => F}

/** Product quantization (sim_pq_codes / sim_pq_adc_topk).
  *
  * Pins (a) the exact-zero seed self-assignment (the fp-cancellation
  * property the "no code starts empty" guarantee rests on), (b) the
  * Lloyd-step objective contraction (k-means' one invariant: one
  * assign+recompute round never increases total quantization error),
  * and (c) the ADC pipeline end-to-end against an INDEPENDENT
  * driver-side recomputation of the lookup-table distances (the
  * IvfRecallSpec discipline: a second implementation, not the same code
  * path twice).
  */
class PqSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  private def seedAssign = {
    val subs = Similarity.pqSubvectors(spark, dir)
    val seed = subs.filter(F.col("vec_id") < Similarity.PqCodes)
      .select(F.col("sub"), F.col("vec_id").as("code"), F.col("sv").as("cv"),
              F.col("dxx").as("dcc"))
    Similarity.pqAssign(subs, seed)
  }

  test("seed vectors self-assign with exactly zero distance") {
    val own = seedAssign
      .filter(F.col("vec_id") < Similarity.PqCodes)
      .collect()
    assert(own.length === Similarity.PqCodes * Similarity.PqSubs)
    own.foreach { r =>
      assert(r.getLong(2) === r.getLong(0), // code == vec_id
        s"seed ${r.getLong(0)} sub ${r.getInt(1)} assigned to ${r.getLong(2)}")
      assert(r.getDouble(3) === 0.0,
        s"seed self-distance must cancel to exactly 0, got ${r.getDouble(3)}")
    }
  }

  test("one Lloyd step does not increase total quantization error") {
    val seedObj = seedAssign.agg(F.sum("d2")).head().getDouble(0)
    val trainedObj = Similarity.pqCodes(spark, dir)
      .agg(F.sum("d2")).head().getDouble(0)
    // d2 is 6-dp-rounded per pair; 4000 pairs bound the rounding drift
    // far below 0.01 — the k-means contraction is macroscopic (>5%)
    assert(trainedObj <= seedObj + 0.01,
      s"Lloyd step worsened the objective: seed=$seedObj trained=$trainedObj")
    info(f"quantization objective: seed=$seedObj%.3f trained=$trainedObj%.3f")
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }

  /** Independent driver-side ADC ranking per query: (vec_id, micro-unit
    * distance sum) sorted ascending — plain Scala folds, not the Spark
    * code path. */
  private lazy val adcRanking: Map[Long, Seq[(Long, Long)]] = {
    val cb = Similarity.pqCodebook(spark, dir).collect()
      .map(r => ((r.getInt(0), r.getLong(1)),
                 r.getSeq[Double](2).toArray)).toMap
    val qsubs = Similarity.pqSubvectors(spark, dir)
      .filter(F.col("vec_id") < Similarity.PqQueries).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getSeq[Float](2).toArray))
      .toMap
    val codes = Similarity.pqCodes(spark, dir)
      .select("vec_id", "sub", "code").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    (0L until Similarity.PqQueries.toLong).map { q =>
      val byVec = codes.filterNot(_._1 == q).groupBy(_._1).map { case (v, cs) =>
        val ts = cs.map { case (_, sub, code) =>
          val sv = qsubs((q, sub)).map(_.toDouble)
          val cv = cb((sub, code))
          math.round(((dot(sv, sv) - 2 * dot(sv, cv)) + dot(cv, cv)) * 1e6)
        }.sum
        (v, ts)
      }
      q -> byVec.toSeq.sortBy { case (v, ts) => (ts, v) }
    }.toMap
  }

  test("ADC top-3 matches an independent driver-side recomputation") {
    // independent path: collect the (tiny) codebook + the queries'
    // subvectors, recompute every candidate's table-lookup distance with
    // plain Scala left-to-right folds, rank, and compare end-to-end
    val expected = adcRanking.toSeq.flatMap { case (q, ranked) =>
      ranked.take(3).zipWithIndex.map { case ((v, ts), i) =>
        (q, v, i + 1, math.round(ts.toDouble / 1e6 * 1e6) / 1e6) }
    }.toSet
    val got = Similarity.pqAdcTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(got === expected,
      s"missed=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    info(s"${got.size} ADC rows match the independent recomputation")
  }

  test("exact re-rank over the ADC shortlist matches driver-side recompute") {
    val embs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .toMap
    val expected = adcRanking.toSeq.flatMap { case (q, ranked) =>
      val qv = embs(q)
      val qq = dot(qv, qv)
      ranked.take(Similarity.PqShortlist).map { case (v, _) =>
        val cv = embs(v)
        (v, math.round(((qq - 2 * dot(qv, cv)) + dot(cv, cv)) * 1e6) / 1e6)
      }.sortBy { case (v, d2) => (d2, v) }.take(3).zipWithIndex
        .map { case ((v, d2), i) => (q, v, i + 1, d2) }
    }.toSet
    val got = Similarity.pqRerankTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(got === expected,
      s"missed=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // the point of re-rank: exact distances can reorder the ADC shortlist
    info(s"${got.size} re-rank rows match; shortlist=${Similarity.PqShortlist}")
  }
}
