package graft

/** Span-excision apply (Dedup.substrExcise): the relational
  * gaps-and-islands complement must equal a brute-force recomputation
  * that builds the covered POSITION SET per doc and scans it token by
  * token into maximal kept runs — a genuinely different algorithm.
  * Plus the conservation law tying the apply to its measure half:
  * Σ n_keep per doc == n_tokens − n_covered (substrCross). */
class SubstrExciseSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)
    .select("doc_id", "text").collect()
    .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap

  /** Brute force: covered positions as a Set, kept runs by linear scan. */
  private lazy val referenceKept: Map[Long, Seq[(Long, Long)]] = {
    val grams = docs.toSeq.flatMap { case (id, ts) =>
      if (ts.length >= 5)
        (0 to ts.length - 5).map(i => (id, i + 1, ts.slice(i, i + 5).mkString(" ")))
      else Nil
    }
    val docFreq = grams.groupBy(_._3).map { case (g, xs) =>
      g -> xs.map(_._1).distinct.size
    }
    val coveredPos: Map[Long, Set[Int]] = grams
      .filter(t => docFreq(t._3) >= 2)
      .groupBy(_._1).map { case (id, xs) =>
        id -> xs.flatMap(t => t._2 until t._2 + 5).toSet
      }
    docs.map { case (id, ts) =>
      val cov = coveredPos.getOrElse(id, Set.empty)
      val runs = scala.collection.mutable.ListBuffer[(Long, Long)]()
      var start = -1
      for (p <- 1 to ts.length + 1) {
        val kept = p <= ts.length && !cov(p)
        if (kept && start < 0) start = p
        if (!kept && start >= 0) { runs += ((start.toLong, p.toLong)); start = -1 }
      }
      id -> runs.toSeq
    }
  }

  private lazy val got: Map[Long, Seq[(Long, Long, Long)]] =
    ext.Dedup.substrExcise(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (id, xs) =>
        id -> xs.map(t => (t._2, t._3, t._4)).sortBy(_._1).toSeq
      }

  test("kept intervals == brute-force maximal kept runs, every doc") {
    val nonTrivial = referenceKept.count { case (id, runs) =>
      runs.map(r => r._2 - r._1).sum < docs(id).length
    }
    assert(nonTrivial > 0, "vacuous: nothing excised anywhere")
    docs.keys.foreach { id =>
      val expect = referenceKept(id)
      val have = got.getOrElse(id, Seq.empty)
      assert(have.map(t => (t._1, t._2)) === expect, s"doc $id intervals")
      have.foreach { case (ks, ke, nk) =>
        assert(nk === ke - ks, s"doc $id n_keep arithmetic")
      }
    }
    // fully-covered docs emit no rows; all others emit >= 1
    docs.keys.foreach { id =>
      assert(got.contains(id) === referenceKept(id).nonEmpty, s"doc $id presence")
    }
  }

  test("conservation: sum(n_keep) + n_covered == n_tokens (apply vs measure)") {
    val cross = ext.Dedup.substrCross(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    docs.keys.foreach { id =>
      val (nTok, nCov) = cross(id)
      val kept = got.getOrElse(id, Seq.empty).map(_._3).sum
      assert(kept + nCov === nTok, s"doc $id conservation")
    }
  }
}
