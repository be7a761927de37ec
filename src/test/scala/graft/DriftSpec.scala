package graft

import org.apache.spark.sql.functions._

/** Embedding drift report: accounting + drift identity on the real
  * corpus, and the shifted-flag path on a crafted genuinely-drifted
  * fixture (the natural corpus never crosses the 0.1 threshold). */
class DriftSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  test("both batches fully counted; drift = mean_new - mean_ref exactly") {
    val rows = ext.Similarity.queries("emb_drift_report")(spark, sf001)
      .collect()
    assert(rows.length === 64)
    rows.foreach { r =>
      assert(r.getLong(1) === 250L && r.getLong(2) === 250L)
      val drift = math.round((r.getDouble(4) - r.getDouble(3)) * 1e6)
      assert(r.getLong(5) === drift)
      assert((r.getInt(6) == 1) === (math.abs(drift) >= 100000L))
    }
    assert(rows.forall(_.getInt(6) == 0),
      "natural corpus unexpectedly crossed the drift threshold " +
      "(fixture changed? re-derive the spec)")
  }

  test("a genuinely shifted dimension trips the flag; others stay quiet") {
    import spark.implicits._
    // 40 vectors of 4 dims; dim 2 of the new batch shifts by +0.5
    val rows = (0L until 40L).map { id =>
      val isNew = id >= 20
      val base = Array(0.1f, -0.2f, 0.3f, 0.0f)
      if (isNew) base(2) += 0.5f
      (id, base.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = ext.Similarity.driftReportOf(df, 20L).collect()
      .map(r => r.getInt(0) -> ((r.getLong(5), r.getInt(6)))).toMap
    assert(got(2)._2 == 1 && got(2)._1 == 500000L, s"dim 2: ${got(2)}")
    Seq(0, 1, 3).foreach(d => assert(got(d) == ((0L, 0)), s"dim $d moved"))
  }
}
