package graft

import org.apache.spark.sql.functions._

/** Efraimidis–Spirakis weighted sample (TextOps.weightedSample): the
  * per-source selection must equal a driver-side A-ES reference (Knuth
  * scramble → (0,1] micro uniform → micro-nat ln → integer key), and
  * the weight semantics must hold: key is non-negative and ANTI-
  * monotone in w at fixed u (heavier docs get smaller keys).
  */
class WeightedSampleSpec extends SparkSpec {

  private def key(docId: Long, nTok: Long): Long = {
    val u = ((docId % 2147483648L) * 2654435761L) % 2147483648L % 1000000L + 1L
    // HALF_UP away from zero = Spark/DuckDB round on the negative ln
    val lnu = BigDecimal(math.log(u.toDouble / 1000000.0) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    (-lnu) * 1000L / nTok
  }

  test("per-source top-5 equals brute A-ES reference; keys nonneg") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("source"), col("doc_id"),
              size(split(col("text"), " ")).cast("long").as("n_tok"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = docs.groupBy(_._1).flatMap { case (src, xs) =>
      xs.toSeq.map { case (_, id, nt) => (id, nt, key(id, nt)) }
        .sortBy { case (id, _, k) => (k, id) }
        .take(5).zipWithIndex
        .map { case ((id, nt, k), i) => (src, id, i + 1, nt, k) }
    }.toSet
    val got = ext.TextOps.queries("text_weighted_sample")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
                 r.getLong(4)))
      .toSet
    assert(got === expect)
    assert(got.nonEmpty && got.forall(_._5 >= 0L))
    // weight anti-monotonicity at fixed u: doubling w halves −ln(u)/w
    docs.foreach { case (_, id, nt) =>
      assert(key(id, 2 * nt) <= key(id, nt), s"key not anti-monotone at $id")
    }
    // the weighting bites: the token-mass share of the sample exceeds
    // its doc-count share under a length-skewed corpus... only if the
    // sampled docs skew long — assert the weaker, always-true direction
    // instead: every selected key is <= the source's 5th-smallest key
    val bySrc = docs.groupBy(_._1)
    got.groupBy(_._1).foreach { case (src, sel) =>
      val allKeys = bySrc(src).map { case (_, id, nt) => key(id, nt) }.sorted
      val kth = allKeys(math.min(4, allKeys.length - 1))
      sel.foreach { case (_, _, _, _, k) =>
        assert(k <= kth, s"$src selected key $k above the 5th-smallest $kth")
      }
    }
  }

  test("dedup-weighted sample equals the brute 1/cluster_size reference") {
    // same A-ES reference with weight = 1/cluster_size, i.e. the
    // DIVISION-FREE key (−lnu)·cluster_size
    def dkey(docId: Long, csz: Long): Long = {
      val u = ((docId % 2147483648L) * 2654435761L) % 2147483648L % 1000000L + 1L
      val lnu = BigDecimal(math.log(u.toDouble / 1000000.0) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (-lnu) * csz
    }
    val lab = ext.Dedup.queries("dedup_clusters")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val csz = lab.values.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    val src = Tables.documents(spark, sf0001)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = lab.keys.groupBy(src).flatMap { case (s, ids) =>
      ids.toSeq.map { d => (d, csz(lab(d)), dkey(d, csz(lab(d)))) }
        .sortBy { case (d, _, k) => (k, d) }
        .take(5).zipWithIndex
        .map { case ((d, c, k), i) => (s, d, i + 1, c, k) }
    }.toSet
    val got = ext.Dedup.queries("dedup_weighted_sample")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
                 r.getLong(4)))
      .toSet
    assert(got === expect)
    // downweighting is live: a cluster_size-c doc's key is exactly c x
    // the singleton key at equal u
    lab.keys.take(20).foreach { d =>
      assert(dkey(d, 3L) === 3L * dkey(d, 1L))
    }
  }
}
