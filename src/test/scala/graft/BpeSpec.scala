package graft

import graft.ext.TextOps

/** BPE merge learning (`text_bpe_merges`): the relational merge must
  * agree with the sequential greedy-scan reference implementation (they
  * coincide exactly when a ≠ b — the restriction the operator
  * enforces), and the learned pair counts must be non-increasing across
  * rounds (merging the max pair can only create pairs bounded by its
  * own count). */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  /** Sequential reference: greedy left-to-right merge scan per word —
    * a different algorithm from the window-pass relational rewrite. */
  private def bpeRef(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var cur: Map[String, (Vector[String], Long)] =
      words.map { case (w, c) => w -> (w.map(_.toString).toVector, c) }
    (1 to rounds).map { r =>
      val counts = collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      cur.values.foreach { case (syms, c) =>
        syms.iterator.sliding(2).withPartial(false).foreach { p =>
          if (p(0) != p(1)) counts((p(0), p(1))) += c
        }
      }
      val ((a, b), pc) = counts.toSeq
        .sortBy { case ((x, y), n) => (-n, x, y) }.head
      cur = cur.map { case (w, (syms, c)) =>
        val out = collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        w -> (out.toVector, c)
      }
      (r, a, b, pc)
    }
  }

  test("relational merge equals the sequential greedy reference on a classic fixture") {
    // the textbook BPE corpus (low/lower/newest/widest), shaped so the
    // first merges chain into multi-char symbols
    val docs = Seq(
      (0L, "low low low low low lower lower"),
      (1L, "newest newest newest newest newest newest"),
      (2L, "widest widest widest")
    ).toDF("doc_id", "text")
    val words = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.length.toLong }
    val expected = bpeRef(words, TextOps.BpeRounds)
    val got = TextOps.bpeMergesOf(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expected, s"got $got, reference says $expected")
    // the fixture is only interesting if a learned symbol is multi-char
    // by round 3 (a merge built on a merge)
    assert(expected.exists { case (_, a, b, _) => (a + b).length > 2 },
      "fixture never chained a merge — weak fixture")
  }

  test("apply: per-doc BPE token counts equal the greedy reference segmentation") {
    val docs = Seq(
      (0L, "low low low low low lower lower"),
      (1L, "newest newest newest newest newest newest"),
      (2L, "widest widest widest")
    ).toDF("doc_id", "text")
    // run the reference forward to the FINAL segmentation, then price
    // each doc in reference tokens
    val words = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.length.toLong }
    var cur: Map[String, Vector[String]] =
      words.map { case (w, _) => w -> w.map(_.toString).toVector }
    bpeRef(words, TextOps.BpeRounds).foreach { case (_, a, b, _) =>
      cur = cur.map { case (w, syms) =>
        val out = collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        w -> out.toVector
      }
    }
    val expected = docs.as[(Long, String)].collect().map { case (id, t) =>
      val ws = t.split(" ")
      (id, ws.length.toLong, ws.map(w => cur(w).length.toLong).sum)
    }.toSet
    // the syms frame from training must price docs identically
    val wn = TextOps.bpeTrainOf(docs)._2
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wn == cur.map { case (w, s) => w -> s.length.toLong },
      "trained segmentation sizes diverge from greedy reference")
    val got = graft.SparkEntry.queries("text_bpe_apply")(spark, sf0001)
    // fixture check runs on the fixture, not sf0001 — rebuild via the seam
    val gotFix = {
      import org.apache.spark.sql.functions._
      val seg = TextOps.bpeTrainOf(docs)._2
        .groupBy("w").agg(count(lit(1)).as("n_sym"))
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .join(seg, "w").groupBy("doc_id")
        .agg(count(lit(1)).as("n_ws_tok"), sum("n_sym").as("n_bpe_tok"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(gotFix == expected, s"got $gotFix, reference says $expected")
    // real-corpus query: sane shape, BPE never produces more tokens than
    // characters nor fewer than words
    val rows = got.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        "BPE token count below whitespace token count")
    }
  }

  test("real-corpus merges: counts non-increasing, a != b, all rounds present") {
    val rows = TextOps.bpeMerges(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (1 to TextOps.BpeRounds))
    rows.foreach { case (r, a, b, pc) =>
      assert(a != b, s"round $r merged a self-pair")
      assert(pc > 0)
    }
    val pcs = rows.sortBy(_._1).map(_._4)
    pcs.sliding(2).foreach { case Array(x, y) =>
      assert(y <= x, s"pair count rose across rounds: $pcs")
    }
  }

  test("fertility report ties to the per-doc apply and to raw characters") {
    import org.apache.spark.sql.functions._
    val fert = TextOps.queries("text_bpe_fertility")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    // per-source sums == the per-doc apply's sums over that source's docs
    val src = Tables.documents(spark, sf0001).select("doc_id", "source")
    val byDoc = TextOps.queries("text_bpe_apply")(spark, sf0001)
      .join(src, Seq("doc_id"))
      .groupBy("source")
      .agg(sum("n_ws_tok").as("w"), sum("n_bpe_tok").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    fert.foreach { case (source, nWords, nSyms, nChars, fm, sm) =>
      assert((nWords, nSyms) === byDoc(source),
        s"$source fertility totals drifted from the per-doc apply")
      // merges only ever reduce the symbol count below raw characters
      assert(nSyms <= nChars && nSyms >= nWords)
      assert(fm === nSyms * 1000000L / nWords)
      assert(sm === (nChars - nSyms) * 1000000L / nChars)
      assert(sm > 0L, s"$source: learned merges saved nothing — vacuous")
    }
  }

  test("rounds sweep: monotone compression, baseline row, production tie") {
    import org.apache.spark.sql.functions._
    val rows = TextOps.queries("text_bpe_sweep")(spark, sf0001)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq === (0 to TextOps.BpeSweepRounds))
    val nChars = rows.head._4
    assert(rows.forall(_._4 === nChars), "n_chars not constant across rows")
    // round 0 IS the character baseline: zero savings, n_syms = n_chars
    assert(rows.head._3 === nChars && rows.head._6 === 0L)
    // a merge only ever reduces the symbol count → n_syms nonincreasing,
    // savings nondecreasing, fertility nonincreasing — and every round
    // actually merged something on the real corpus (strict decrease)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._3 < lo._3, s"round ${hi._1} merged nothing: $lo -> $hi")
      assert(hi._6 >= lo._6 && hi._5 <= lo._5)
      case _ => ()
    }
    // the r = BpeRounds row is the production tokenizer's global pricing
    val prod = TextOps.queries("text_bpe_apply")(spark, sf0001)
      .agg(sum("n_bpe_tok")).collect().head.getLong(0)
    val atProd = rows.find(_._1 === TextOps.BpeRounds).get
    assert(atProd._3 === prod,
      "sweep row at BpeRounds diverges from the production apply total")
  }

  test("pick: chosen row is the minimal qualifying sweep row; fail-closed sentinel") {
    val sweep = TextOps.queries("text_bpe_sweep")(spark, sf0001)
      .collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(4), r.getLong(5)))
      .sortBy(_._1) // (rounds, n_syms, fertility, savings)
    // target between the extremes so an interior row qualifies
    val target = (sweep.head._3 + sweep.last._3) / 2
    val expect = sweep.filter(_._3 <= target).minBy(_._1)
    val got = TextOps.bpePick(spark, sf0001, target).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(0) === target && r.getInt(1) === 1)
    assert((r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)) === expect,
      "chosen row != its sweep row")
    // fail-closed: an unreachable target yields the sentinel row
    val closed = TextOps.bpePick(spark, sf0001, 1L).collect().head
    assert(closed.getInt(1) === 0 && closed.getInt(2) === -1 &&
      closed.getLong(4) === 1000000000L,
      "fail-closed sentinel not emitted for an unreachable target")
  }
}
