package graft

/** Pins sim_ivf_delete_search at sf0.001 against a driver-side
  * from-scratch rebuild over the surviving corpus (centroids = the seed
  * POSITIONS from the full corpus, per-vector assignment over live
  * vectors only, top-2 probe cells, home-cell candidates, exact 6-dp
  * top-3), plus the structural takedown guarantees: no deleted id ever
  * appears on either side of a result, and every live probe that has
  * candidates gets results. */
class DeleteSearchSpec extends SparkSpec {

  private def rnd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("delete-search ≡ from-scratch rebuild over the surviving corpus") {
    val emb: Map[Long, Array[Double]] = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nrm = emb.map { case (k, v) => k -> math.sqrt(dot(v, v)) }
    def cos(a: Long, b: Long): Double =
      rnd6(dot(emb(a), emb(b)) / (nrm(a) * nrm(b)))

    val cellCount = ext.Similarity.ivfAssign(spark, sf0001)
      .agg(org.apache.spark.sql.functions.max("cell")).collect().head.getLong(0) + 1
    val cents = (0L until cellCount).toSeq
    val live = emb.keys.filter(_ % 10 != 0).toSeq.sorted

    // per-live-vector cell ranking against the FULL seed positions
    def cellRanks(v: Long): Seq[Long] =
      cents.map(c => (c, cos(v, c))).sortBy { case (c, s) => (-s, c) }.map(_._1)
    val home = live.map(v => v -> cellRanks(v).head).toMap
    val probes2 = live.filter(_ < 100)
      .map(v => v -> cellRanks(v).take(2)).toMap

    val members = live.groupBy(home)
    val expect = probes2.flatMap { case (a, cells) =>
      val cand = cells.flatMap(c => members.getOrElse(c, Nil))
        .distinct.filterNot(_ == a)
      cand.map(b => (a, b, cos(a, b)))
        .sortBy { case (_, b, s) => (-s, b) }
        .take(3).zipWithIndex
        .map { case ((x, b, s), i) => (x, b) -> ((s, i + 1)) }
    }

    val got = ext.Similarity.ivfDeleteSearch(spark, sf0001).collect().map { r =>
      (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getInt(3)))
    }.toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (k, v) => assert(got(k) === v, s"pair $k diverged") }

    // structural takedown guarantees
    assert(got.keySet.forall { case (a, b) => a % 10 != 0 && b % 10 != 0 },
      "a deleted id appeared in a search result")
    assert(got.nonEmpty, "delete search returned nothing")
  }
}
