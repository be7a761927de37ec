package graft

import org.apache.spark.sql.functions._

/** One NN-descent round (Similarity.nnDescent): the refined top-3 must
  * be a true re-selection over current ∪ wedge candidates — so per
  * (node, rank) similarity can only improve vs the ivfTopK baseline
  * (superset property), sims must match an independent exact-cosine
  * recompute, and the eval row must show recall_ref ≥ recall_base.
  */
class NnDescentSpec extends SparkSpec {

  private lazy val refined = ext.Similarity.nnDescent(spark, sf0001).cache()
  private lazy val base =
    ext.Similarity.queries("sim_ivf_topk")(spark, sf0001)

  test("well-formed ranking: ≤3 rows per node, contiguous rn, sim desc") {
    val rows = refined.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val byA = rows.groupBy(_._1)
    assert(byA.nonEmpty)
    byA.foreach { case (a, xs) =>
      assert(xs.length <= 3, s"node $a has ${xs.length} rows")
      val sorted = xs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq === (1 to xs.length).toSeq)
      assert(sorted.map(_._4).toSeq ===
        sorted.map(_._4).sortBy(-_).toSeq, s"node $a sims not descending")
    }
  }

  test("per-rank sim never degrades vs the ivfTopK baseline (superset)") {
    val j = refined.select(col("a_id"), col("rn"), col("sim").as("s_ref"))
      .join(base.select(col("a_id"), col("rn"), col("sim").as("s_base")),
            Seq("a_id", "rn"))
      .collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      val (sr, sb) = (r.getDouble(2), r.getDouble(3))
      assert(sr >= sb,
        s"node ${r.getLong(0)} rank ${r.getInt(1)}: refined $sr < base $sb")
    }
  }

  test("refinement actually adds edges the baseline missed") {
    val added = refined.select("a_id", "b_id")
      .except(base.select("a_id", "b_id")).count()
    assert(added > 0, "fixture exercises no wedge improvement")
  }

  test("every refined sim equals an independent exact cosine recompute") {
    val emb = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.round(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    refined.collect().foreach { r =>
      val expect = cos(emb(r.getLong(0)), emb(r.getLong(1)))
      assert(math.abs(r.getDouble(3) - expect) < 1e-9,
        s"(${r.getLong(0)},${r.getLong(1)}): ${r.getDouble(3)} != $expect")
    }
  }

  test("eval row: recall_ref >= recall_base, hits bounded by truth") {
    val r = ext.Similarity.nnDescentEval(spark, sf0001).collect()
    assert(r.length === 1)
    val row = r.head
    val (truth, hb, hr) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(truth > 0 && hb <= truth && hr <= truth)
    assert(hr >= hb, s"descent lost recall: $hr < $hb")
    assert(row.getLong(4) >= row.getLong(3))
  }
}
