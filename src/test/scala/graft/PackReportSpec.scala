package graft

import org.apache.spark.sql.functions._

/** corpus_pack_report invariants: arithmetic identities across the
  * report, per-length consistency, and a driver-side recompute of the
  * boundary-split counts at L=512 from the raw corpus. */
class PackReportSpec extends SparkSpec {

  private lazy val rows =
    ext.TextOps.packReport(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
         r.getLong(6), r.getLong(7))).toMap

  test("sequences, waste and tokens satisfy the packing identity") {
    assert(rows.nonEmpty)
    for (((src, l), (nDocs, nTok, nSeqs, waste, nSplit, splitMicro)) <- rows) {
      assert(nSeqs * l - waste === nTok, s"$src L=$l identity")
      assert(waste >= 0 && waste < l, s"$src L=$l waste out of range")
      assert(nSplit <= nDocs, s"$src L=$l more splits than docs")
      assert(splitMicro === (if (nDocs > 0) nSplit * 1000000L / nDocs else 0L))
    }
  }

  test("doc and token counts agree across candidate lengths") {
    val bySrc = rows.groupBy(_._1._1)
    for ((src, entries) <- bySrc) {
      assert(entries.keySet.map(_._2) === Set(256, 512, 1024))
      assert(entries.values.map(v => (v._1, v._2)).toSet.size === 1,
             s"$src counts differ across lengths")
    }
  }

  test("split counts match a driver-side recompute at L=512") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
              size(split(col("text"), " ")).cast("long").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    for ((src, ds) <- docs.groupBy(_._2)) {
      var off = 0L; var splits = 0L
      for ((_, _, n) <- ds.sortBy(_._1)) {
        if (n > 0 && (off + n - 1) / 512 != off / 512) splits += 1
        off += n
      }
      assert(rows((src, 512))._5 === splits, s"$src split recount")
    }
  }
}
