package graft

import org.apache.spark.sql.functions._

/** DSIR importance weights (TextOps.dsirWeights): the frame must equal
  * a driver-side recompute of the smoothed two-model log-ratio, and the
  * target slice must score higher on average than the rest (a target-
  * trained LM likes its own training text — the property importance
  * resampling rests on).
  */
class DsirSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)
    .select("doc_id", "text", "source").collect()
    .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq, r.getString(2)))

  private lazy val got = ext.TextOps.queries("corpus_dsir_weights")(spark, sf0001)
    .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3))))
    .toMap

  test("frame equals a driver-side recompute of the smoothed log-ratio") {
    val toks = docs.flatMap(_._2)
    val raw = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val tgtToks = docs.filter(_._3 == "src0").flatMap(_._2)
    val tgt = tgtToks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val v = raw.size.toLong
    val nr = toks.size.toLong
    val nt = tgtToks.size.toLong
    def lpm(c: Long, n: Long): Long =
      math.round(math.log((c + 1).toDouble / (n + v)) * 1e6)
    val dlt = raw.map { case (t, cr) =>
      t -> (lpm(tgt.getOrElse(t, 0L), nt) - lpm(cr, nr))
    }
    val expect = docs.map { case (id, ts, _) =>
      val lw = ts.map(dlt).sum
      id -> ((ts.size.toLong, lw, if (lw > 0) 1 else 0))
    }.toMap
    assert(got === expect)
  }

  test("select = greedy per-source prefix under the 1000-token budget") {
    val srcOf = docs.map { case (id, _, s) => id -> s }.toMap
    val rows = ext.TextOps.queries("corpus_dsir_select")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getInt(6)))
    assert(rows.length === docs.length, "select must rank every doc")
    rows.groupBy(_._1).foreach { case (src, xs) =>
      val sorted = xs.sortBy(_._3)
      // greedy reference: order by (logratio desc, doc_id asc), running sum
      val ref = xs.map(t => (t._2, t._6, got(t._2)._1))
        .sortBy { case (id, lw, _) => (-lw, id) }
      assert(sorted.map(_._2).toSeq === ref.map(_._1).toSeq, s"$src order")
      var cum = 0L
      ref.zip(sorted).foreach { case ((id, _, nt), row) =>
        cum += nt
        assert(row._5 === cum, s"$src cum_tok at doc $id")
        assert(row._7 === (if (cum <= 1000L) 1 else 0), s"$src gate at $id")
        assert(srcOf(id) === src)
      }
      // the budget actually cuts: every sf0.001 source exceeds 1000 tokens
      assert(xs.exists(_._7 == 0), s"$src budget never fired — vacuous")
      assert(xs.exists(_._7 == 1), s"$src selected nothing")
    }
  }

  test("target slice leans positive: mean log-ratio src0 > mean others") {
    val bySrc = docs.map { case (id, _, s) => (s == "src0", got(id)._2) }
    def mean(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size
    val (t, o) = (bySrc.filter(_._1).map(_._2).toSeq,
                  bySrc.filterNot(_._1).map(_._2).toSeq)
    assert(t.nonEmpty && o.nonEmpty)
    assert(mean(t) > mean(o),
      s"target mean ${mean(t)} not above non-target mean ${mean(o)}")
    // the keep gate actually splits the corpus
    val kept = got.values.count(_._3 == 1)
    assert(kept > 0 && kept < got.size)
  }
}
