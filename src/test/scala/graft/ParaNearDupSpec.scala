package graft

/** Pins dedup_para_neardup and dedup_para_excise against ONE driver-side
  * brute recompute at sf0.001 that re-derives the whole pipeline from
  * raw text: 200/200 char windows, per-paragraph distinct word 5-gram
  * STRING sets (production keys on the (h1,h2) double hash — equal
  * absent a 2^-59 collision, the SubstrDigestSpec argument), the
  * MaxShingleDf=100 DF cap, exact inter*5 >= uni Jaccard, cross-doc-only
  * pairs. The measure half checks the duplicated-paragraph fraction, the
  * apply half the b-side-drop token accounting; both consume the same
  * memoized pair frame in production, and the same brute pair set here.
  * Also asserts the operator actually fires on this corpus (a near-dup
  * detector that never detects proves nothing). */
class ParaNearDupSpec extends SparkSpec {

  // ---- shared brute reference ----
  private lazy val brute: (Map[Long, String], Set[(Long, Long)]) = {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val paras: Map[Long, String] = docs.flatMap { case (id, t) =>
      if (t.isEmpty) Nil
      else (0 to (t.length - 1) / 200).map { i =>
        (id * 1000000L + i) -> t.substring(i * 200, math.min(t.length, i * 200 + 200))
      }
    }
    val sets: Map[Long, Set[String]] = paras.map { case (pid, p) =>
      val toks = p.split(" ", -1)
      pid -> (if (toks.length < 5) Set.empty[String]
              else toks.sliding(5).map(_.mkString(" ")).toSet)
    }
    val df = sets.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
    val kept = sets.map { case (pid, s) => pid -> s.filter(df(_) <= 100) }
    val pids = kept.keys.toSeq.sorted
    val pairs = (for {
      i <- pids.indices; j <- (i + 1) until pids.length
      a = pids(i); b = pids(j)
      if a / 1000000L != b / 1000000L
      inter = (kept(a) & kept(b)).size
      uni = kept(a).size + kept(b).size - inter
      if inter > 0 && inter * 5 >= uni
    } yield (a, b)).toSet
    (paras, pairs)
  }

  test("paragraph near-dup fraction equals brute recompute at sf0.001") {
    val (paras, pairs) = brute
    val dup = pairs.flatMap(p => Seq(p._1, p._2))
    val expect = paras.keys.groupBy(_ / 1000000L).map { case (d, ps) =>
      val n = ps.size.toLong
      val nd = ps.count(dup.contains).toLong
      d -> ((n, nd, nd * 1000000L / n))
    }
    val got = ext.Dedup.paraNearDup(spark, sf0001).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    }.toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (d, (n, nd, frac)) =>
      val (gn, gnd, gfrac, gflag) = got(d)
      assert((gn, gnd, gfrac) === ((n, nd, frac)), s"doc $d diverged")
      assert(gflag === (if (frac >= 500000L) 1 else 0), s"doc $d flag")
    }
    // non-degenerate: the templated corpus must surface real paragraph dups
    assert(expect.values.exists(_._2 > 0),
      "no duplicated paragraphs found — detector never fired on sf0.001")
  }

  test("paragraph excise drops exactly the b-side pids, token-exact") {
    val (paras, pairs) = brute
    val dropped = pairs.map(_._2)
    val expect = paras.toSeq.groupBy(_._1 / 1000000L).map { case (d, ps) =>
      val nTok = ps.map { case (_, p) => p.split(" ", -1).length.toLong }
      val total = nTok.sum
      val keptTok = ps.zip(nTok).collect {
        case ((pid, _), t) if !dropped.contains(pid) => t
      }.sum
      d -> ((ps.size.toLong, ps.count(p => dropped.contains(p._1)).toLong,
             total, keptTok, (total - keptTok) * 1000000L / total))
    }
    val got = ext.Dedup.paraExcise(spark, sf0001).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
                        r.getLong(4), r.getLong(5)))
    }.toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (d, e) => assert(got(d) === e, s"doc $d diverged") }
    // a-side survivors: excised strictly fewer than flagged-dup paragraphs
    val nExcised = expect.values.map(_._2).sum
    val nDup = pairs.flatMap(p => Seq(p._1, p._2)).size.toLong
    assert(nExcised > 0 && nExcised < nDup,
      s"excise must keep the min-pid survivor of each pair ($nExcised vs $nDup)")
  }
}
