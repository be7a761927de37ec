package graft

/** Pins sim_filtered_topk at sf0.001 against a driver-side brute rebuild
  * (per probe: same-label members of its top-2 probe cells under the
  * home assignment, exact 6-dp top-3), plus the filtered-search
  * contracts: every result's candidate label equals the probe's own
  * label, and the filter actually BITES — at least one probe's filtered
  * top-3 differs from its unfiltered ivfTopK top-3 (otherwise the test
  * proves nothing about pre-filtering). */
class FilteredSearchSpec extends SparkSpec {

  private def rnd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("filtered search ≡ brute per-label rebuild; filter provably bites") {
    val rows = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding", "label").collect()
    val emb = rows.map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val lab = rows.map(r => r.getLong(0) -> r.getInt(2)).toMap
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
    def cellRanks(v: Long): Seq[Long] =
      cents.map(c => (c, cos(v, c))).sortBy { case (c, s) => (-s, c) }.map(_._1)
    val ids = emb.keys.toSeq.sorted
    val home = ids.map(v => v -> cellRanks(v).head).toMap
    val members = ids.groupBy(home)

    val expect = ids.filter(_ < 100).flatMap { a =>
      val cand = cellRanks(a).take(2)
        .flatMap(c => members.getOrElse(c, Nil))
        .distinct.filter(b => b != a && lab(b) == lab(a))
      cand.map(b => (a, b, cos(a, b)))
        .sortBy { case (_, b, s) => (-s, b) }
        .take(3).zipWithIndex
        .map { case ((x, b, s), i) => (x, b) -> ((s, i + 1)) }
    }.toMap

    val got = ext.Similarity.filteredTopK(spark, sf0001).collect().map { r =>
      (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getInt(3)))
    }.toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (k, v) => assert(got(k) === v, s"pair $k diverged") }

    // structural: every returned neighbor carries the probe's label
    assert(got.keySet.forall { case (a, b) => lab(a) == lab(b) },
      "a cross-label candidate leaked through the filter")
    assert(got.nonEmpty, "filtered search returned nothing")

    // the filter bites: some probe's filtered set differs from unfiltered
    val unfiltered = ext.Similarity.ivfTopK(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("a_id") < 100)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.keySet != unfiltered,
      "filtered and unfiltered top-3 are identical — the predicate never fired")
  }

  test("filtered recall eval is consistent with the serving path and brute truth") {
    val rows = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding", "label").collect()
    val emb = rows.map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val lab = rows.map(r => r.getLong(0) -> r.getInt(2)).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nrm = emb.map { case (k, v) => k -> math.sqrt(dot(v, v)) }
    def cos(a: Long, b: Long): Double =
      rnd6(dot(emb(a), emb(b)) / (nrm(a) * nrm(b)))

    // brute same-label exact top-3 truth
    val ids = emb.keys.toSeq.sorted
    val truth = ids.filter(_ < 100).flatMap { a =>
      ids.filter(b => b != a && lab(b) == lab(a))
        .map(b => (b, cos(a, b)))
        .sortBy { case (b, s) => (-s, b) }.take(3).map(b => (a, b._1))
    }.toSet
    val screen = ext.Similarity.filteredTopK(spark, sf0001)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val m = ext.Similarity.filteredRecallEval(spark, sf0001).collect().head
    assert(m.getLong(0) === truth.size.toLong, "n_truth vs brute")
    assert(m.getLong(1) === screen.size.toLong, "n_screen vs serving path")
    assert(m.getLong(2) === (truth & screen).size.toLong, "n_hit vs set intersect")
    assert(m.getLong(3) === m.getLong(2) * 1000000L / m.getLong(0), "recall identity")
    assert(m.getLong(0) > 0 && m.getLong(2) > 0, "vacuous eval")
  }
}
