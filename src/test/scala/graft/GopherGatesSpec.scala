package graft

import org.apache.spark.sql.functions._

/** text_gopher_gates invariants: integer signals must match a
  * driver-side recompute from the raw text, and the gate constants must
  * actually split the corpus (both outcomes occur — the gates are
  * exercised, not vacuous). */
class GopherGatesSpec extends SparkSpec {

  private val stops = Seq("the", "a", "to", "of", "and")

  private lazy val rows =
    ext.TextOps.gopherGates(spark, sf0001)
      .select("doc_id", "n_tok", "n_ns", "n_alpha", "n_stop",
              "mwl_x100", "alpha_x100", "gopher_ok")
      .collect()

  private lazy val texts = Tables.documents(spark, sf0001)
    .select("doc_id", "text").collect()
    .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("signals match a driver-side recompute") {
    assert(rows.nonEmpty)
    for (r <- rows) {
      val text = texts(r.getLong(0))
      val toks = text.split(" ", -1)
      val nNs = text.count(_ != ' ')
      val nAlpha = text.count(_.isLetter)
      val padded = s" $text "
      val nStop = stops.count(m => padded.contains(s" $m "))
      assert(r.getInt(1) === toks.length, s"doc ${r.getLong(0)} n_tok")
      assert(r.getInt(2) === nNs, s"doc ${r.getLong(0)} n_ns")
      assert(r.getInt(3) === nAlpha, s"doc ${r.getLong(0)} n_alpha")
      assert(r.getInt(4) === nStop, s"doc ${r.getLong(0)} n_stop")
      assert(r.getLong(5) === (if (toks.length > 0) nNs.toLong * 100 / toks.length else 0L))
      assert(r.getLong(6) === (if (nNs > 0) nAlpha.toLong * 100 / nNs else 0L))
      val ok = toks.length >= 20 && toks.length <= 100000 &&
        r.getLong(5) >= 300 && r.getLong(5) <= 1000 &&
        r.getLong(6) >= 70 && nStop >= 2
      assert(r.getInt(7) === (if (ok) 1 else 0), s"doc ${r.getLong(0)} gate")
    }
  }

  test("gate constants split the corpus — both outcomes occur") {
    val oks = rows.map(_.getInt(7)).toSet
    assert(oks === Set(0, 1), s"gates vacuous: only outcomes $oks")
  }
}
