package graft

/** Cross-document exact-substring coverage (Dedup.substrCross): the
  * relational interval-union (running max of interval ends) must equal
  * a brute-force covered-POSITION-SET recomputation — a genuinely
  * different algorithm for the same quantity. */
class SubstrCrossSpec extends SparkSpec {

  test("coverage == brute-force position-set union over shared 5-grams") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val grams = docs.toSeq.flatMap { case (id, ts) =>
      if (ts.length >= 5)
        (0 to ts.length - 5).map(i => (id, i + 1, ts.slice(i, i + 5).mkString(" ")))
      else Nil
    }
    val docFreq = grams.groupBy(_._3).map { case (g, xs) =>
      g -> xs.map(_._1).distinct.size
    }
    val covered = grams.filter(t => docFreq(t._3) >= 2)
      .groupBy(_._1).map { case (id, xs) =>
        id -> xs.flatMap(t => t._2 until t._2 + 5).toSet.size.toLong
      }
    assert(covered.nonEmpty, "vacuous: no cross-doc duplicated 5-gram")
    val got = ext.Dedup.substrCross(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == docs.keySet, "every doc reported, covered or not")
    docs.foreach { case (id, ts) =>
      val (nTok, nCov, fracMicro) = got(id)
      assert(nTok == ts.length.toLong, s"doc $id token count")
      assert(nCov == covered.getOrElse(id, 0L), s"doc $id coverage")
      assert(fracMicro == (if (nTok == 0) 0L else nCov * 1000000L / nTok))
      assert(nCov <= nTok, s"doc $id coverage exceeds length")
    }
  }
}
