package graft

/** Pins dedup_para_neardup against a driver-side brute recompute at
  * sf0.001 that re-derives the WHOLE pipeline from raw text: 200/200
  * char windows, per-paragraph distinct word 5-gram STRING sets
  * (production keys on the (h1,h2) double hash — equal absent a 2^-59
  * collision, the SubstrDigestSpec argument), the MaxShingleDf=100 DF
  * cap, exact inter*5 >= uni Jaccard, cross-doc-only pairs, per-doc
  * duplicated-paragraph fraction. Also asserts the operator actually
  * fires on this corpus (a near-dup detector that never detects proves
  * nothing). */
class ParaNearDupSpec extends SparkSpec {

  test("paragraph near-dup fraction equals brute recompute at sf0.001") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    // paragraphs: non-overlapping 200-char windows (text_chunk 200/200)
    val paras: Map[Long, String] = docs.flatMap { case (id, t) =>
      if (t.isEmpty) Nil
      else (0 to (t.length - 1) / 200).map { i =>
        (id * 1000000L + i) -> t.substring(i * 200, math.min(t.length, i * 200 + 200))
      }
    }
    // per-paragraph distinct 5-gram sets (Spark split keeps empties)
    val sets: Map[Long, Set[String]] = paras.map { case (pid, p) =>
      val toks = p.split(" ", -1)
      pid -> (if (toks.length < 5) Set.empty[String]
              else toks.sliding(5).map(_.mkString(" ")).toSet)
    }
    // DF cap at 100 over the paragraph universe
    val df = sets.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
    val kept = sets.map { case (pid, s) => pid -> s.filter(df(_) <= 100) }

    val pids = kept.keys.toSeq.sorted
    val dup = scala.collection.mutable.Set.empty[Long]
    for {
      i <- pids.indices; j <- (i + 1) until pids.length
      a = pids(i); b = pids(j)
      if a / 1000000L != b / 1000000L
    } {
      val inter = (kept(a) & kept(b)).size
      val uni = kept(a).size + kept(b).size - inter
      if (inter > 0 && inter * 5 >= uni) { dup += a; dup += b }
    }
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
}
