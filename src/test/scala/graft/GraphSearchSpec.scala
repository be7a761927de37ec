package graft

import org.apache.spark.sql.functions._

/** Graph beam search (Similarity.graphSearch): the Hamming-seeded
  * 2-round walk must equal a brute driver-side simulation of the whole
  * cascade, and per-(probe, rank) similarity must never degrade below
  * the seeds alone (the walk can only improve the beam).
  */
class GraphSearchSpec extends SparkSpec {

  private def rnd6(x: Double): Double = math.round(x * 1e6) / 1e6

  test("beam walk equals brute cascade; walk ≥ seeds per rank") {
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .toMap
    val mu = ext.Similarity.knnMutual(spark, sf0001)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (mu ++ mu.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val nrm = emb.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    def sim(a: Long, b: Long): Double =
      rnd6(dot(emb(a), emb(b)) / (nrm(a) * nrm(b)))
    // sign-bit hamming tier (bit i of word = sign of dim lo+i)
    def words(v: Array[Double]): (Long, Long) = {
      def pack(lo: Int): Long =
        (0 until 32).foldLeft(0L)((acc, i) =>
          if (v(lo + i) >= 0.0) acc | (1L << i) else acc)
      (pack(0), pack(32))
    }
    val wds = emb.view.mapValues(words).toMap
    def hd(a: Long, b: Long): Int = {
      val (a1, a2) = wds(a); val (b1, b2) = wds(b)
      java.lang.Long.bitCount(a1 ^ b1) + java.lang.Long.bitCount(a2 ^ b2)
    }
    val probes = emb.keys.filter(_ < 100).toSeq.sorted
    def topBy[T](xs: Seq[(Long, T)], k: Int)(ord: Ordering[(T, Long)]): Seq[Long] =
      xs.sortBy(x => (x._2, x._1))(ord).take(k).map(_._1)
    val expect = probes.flatMap { p =>
      val seeds = emb.keys.filter(_ != p).toSeq
        .map(b => (b, hd(p, b)))
        .sortBy { case (b, h) => (h, b) }.take(4).map(_._1)
      var beam = seeds
      var scored: Seq[(Long, Double)] = Seq.empty
      for (_ <- 1 to 2) {
        val cand = (beam ++ beam.flatMap(b => adj.getOrElse(b, Set.empty)))
          .distinct.filter(_ != p)
        scored = cand.map(b => (b, sim(p, b)))
          .sortBy { case (b, s) => (-s, b) }.take(4)
        beam = scored.map(_._1)
      }
      scored.take(3).zipWithIndex.map { case ((b, s), i) => (p, b, i + 1, s) }
    }.toSet
    val got = ext.Similarity.queries("sim_graph_search")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
                           r.getDouble(3))).toSet
    assert(got === expect)
    // per-(probe, rank) sim never degrades vs the seeds-only top-3
    val gotByProbe = got.groupBy(_._1)
    probes.foreach { p =>
      val seedsTop = emb.keys.filter(_ != p).toSeq
        .map(b => (b, hd(p, b))).sortBy { case (b, h) => (h, b) }
        .take(4).map { case (b, _) => sim(p, b) }
        .sorted(Ordering[Double].reverse).take(3)
      val walkTop = gotByProbe(p).toSeq.sortBy(_._3).map(_._4)
      seedsTop.zip(walkTop).foreach { case (s0, s1) =>
        assert(s1 >= s0, s"probe $p: walk degraded $s1 < seed $s0")
      }
    }
    // the walk actually found something the seeds did not
    assert(probes.exists { p =>
      val seedSet = emb.keys.filter(_ != p).toSeq
        .map(b => (b, hd(p, b))).sortBy { case (b, h) => (h, b) }
        .take(4).map(_._1).toSet
      gotByProbe(p).exists(t => !seedSet.contains(t._2))
    }, "walk never left the seed set — vacuous expansion")
  }

  test("eval frontier rows equal the leg queries cell-for-cell") {
    val frontier = ext.Similarity.queries("sim_eval_frontier")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val legs = Map(
      "band" -> ("sim_split_band_recall_eval", "n_hit", "recall_micro"),
      "deepsplit" -> ("sim_split_deep_recall_eval", "n_hit", "recall_micro"),
      "graph" -> ("sim_graph_search_eval", "n_hit", "recall_micro"),
      "int8" -> ("emb_int8_recall", "n_hit", "recall_micro"),
      "ivf" -> ("sim_ivf_recall_eval", "n_hit", "recall_micro"),
      "jl" -> ("sim_jl_recall", "n_hit", "recall_micro"),
      "matryoshka" -> ("emb_matryoshka_recall", "n_hit", "recall_micro"),
      "nn_descent" -> ("sim_nn_descent_eval", "n_hit_ref", "recall_ref_micro"),
      "rrf" -> ("sim_rrf_recall", "n_hit", "recall_micro"),
      "sign" -> ("emb_sign_recall", "n_hit", "recall_micro"),
      "split" -> ("sim_split_recall_eval", "n_hit", "recall_micro"),
      "trained" -> ("sim_trained_recall_eval", "n_hit", "recall_micro"),
      "trainedsplit" ->
        ("sim_split_trained_recall_eval", "n_hit", "recall_micro"))
    assert(frontier.keySet === legs.keySet)
    legs.foreach { case (m, (q, hitCol, recCol)) =>
      val r = ext.Similarity.queries(q)(spark, sf0001).collect().head
      val leg = (r.getLong(r.fieldIndex("n_truth")),
                 r.getLong(r.fieldIndex(hitCol)),
                 r.getLong(r.fieldIndex(recCol)))
      assert(frontier(m) === leg, s"frontier row $m drifted from $q")
    }
    // Frontier-MEMBERSHIP contract (VERDICT r13 item 5): a leg belongs
    // to the frontier IFF its truth is the SHARED exactTruthRanked
    // frame — the legs are only comparable under one truth. Every
    // n_truth cell must therefore equal the brute unfiltered top-3
    // truth count; evals that define their OWN truth (sim_filtered_
    // recall's same-label truth, dedup_semantic_eval's ≥0.4 threshold
    // truth, sim_ivf_delete_search's live-set truth) are deliberately
    // NOT legs and would fail this equality.
    val embT = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .toMap
    def dotT(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val nrmT = embT.view.mapValues(v => math.sqrt(dotT(v, v))).toMap
    val truthN = embT.keys.filter(_ < 100).toSeq.map { p =>
      embT.keys.filter(_ != p).toSeq
        .map(b => (b, rnd6(dotT(embT(p), embT(b)) / (nrmT(p) * nrmT(b)))))
        .sortBy { case (b, s) => (-s, b) }.take(3).size.toLong
    }.sum
    frontier.foreach { case (m, (nt, _, _)) =>
      assert(nt === truthN,
        s"frontier leg $m has n_truth $nt != shared truth $truthN — " +
          "a leg with its own truth definition must not join the frontier")
    }
  }
}
