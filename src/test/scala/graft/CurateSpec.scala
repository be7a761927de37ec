package graft

import graft.ext.{Curate, Dedup, TextOps}
import org.apache.spark.sql.functions._

/** The curation funnel is a composition — these tests pin that the
  * composed counts equal what the stage operators say independently:
  * the funnel must be an honest report of the gates, not a parallel
  * reimplementation that can drift. */
class CurateSpec extends SparkSpec {

  private def counts(dir: String): Map[Int, Long] =
    Curate.funnel(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap

  test("funnel is monotone non-increasing and starts at the corpus size") {
    val c = counts(sf0001)
    assert(c(0) == Tables.documents(spark, sf0001).count())
    (1 to 6).foreach(k => assert(c(k) <= c(k - 1),
      s"stage $k kept ${c(k)} > prior ${c(k - 1)}"))
  }

  test("stage counts equal an independent semi-join recomputation") {
    // different composition: running filters over the stage frames
    // (semi/anti joins), not flag products over one wide join
    val dir = sf0001
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), TextOps.pfxCol.as("pfx"))
    val s1 = docs.join(
      TextOps.langid(spark, dir).filter(col("predicted") === "en")
        .select("doc_id"), Seq("doc_id"), "semi")
    val s2 = s1.join(
      TextOps.quality(spark, dir).filter(col("quality_ok") === 1)
        .select("doc_id"), Seq("doc_id"), "semi")
    val bp = TextOps.boilerplate(spark, dir)
    val s3 = s2.join(bp.select(col("pfx"), col("keep_doc")), Seq("pfx"), "left")
      .filter(col("keep_doc").isNull || col("keep_doc") === col("doc_id"))
      .select("doc_id", "source")
    val s4 = s3.filter(col("source") =!= "src0")
    val s5 = s4.join(
      TextOps.contamination(spark, dir)
        .filter(col("contam_pct") >= 50.0).select("doc_id"),
      Seq("doc_id"), "anti")
    val s6 = s5.join(Dedup.keepList(spark, dir).select("doc_id"),
      Seq("doc_id"), "semi")
    val expected = Map(1 -> s1.count(), 2 -> s2.count(), 3 -> s3.count(),
                       4 -> s4.count(), 5 -> s5.count(), 6 -> s6.count())
    val c = counts(dir)
    expected.foreach { case (k, n) =>
      assert(c(k) == n, s"stage $k: funnel ${c(k)} != recomputed $n")
    }
  }

  test("per-source report ties out against direct per-source recomputation") {
    val dir = sf0001
    val rows = Curate.report(spark, dir).collect()
    val docs = Tables.documents(spark, dir)
    val bySource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == bySource.keySet)
    rows.foreach { r =>
      val (src, nDocs) = (r.getString(0), r.getLong(1))
      assert(nDocs == bySource(src))
      Seq(r.getDouble(3), r.getDouble(4), r.getDouble(5)).foreach(p =>
        assert(p >= 0.0 && p <= 100.0, s"$src percentage out of range"))
    }
    // spot-check one source end to end: en share from langid directly
    val src = rows.head.getString(0)
    val ids = docs.filter(col("source") === src).select("doc_id")
    val en = TextOps.langid(spark, dir).join(ids, Seq("doc_id"))
      .filter(col("predicted") === "en").count()
    val expectedPct = math.round(100.0 * en / bySource(src) * 100) / 100.0
    assert(rows.head.getDouble(3) == expectedPct,
      s"$src en_pct ${rows.head.getDouble(3)} != direct $expectedPct")
  }

  test("gate report ties out against the funnel; first-fail attribution holds") {
    val rows = Curate.gateReport(spark, sf0001).collect()
      .map(r => (r.getLong(0),
                 (1 to 6).map(i => r.getInt(i)),
                 r.getInt(7), r.getString(8)))
    val c = counts(sf0001)
    assert(rows.length.toLong === c(0), "one row per ingested doc")
    // funnel count k == docs passing gates 1..k per the report bits
    (1 to 6).foreach { k =>
      val pass = rows.count(t => (0 until k).forall(j => t._2(j) == 1)).toLong
      assert(pass === c(k), s"stage $k: report says $pass, funnel ${c(k)}")
    }
    val stages = Seq("langid_en", "quality", "boilerplate", "holdout",
                     "contamination", "dedup")
    rows.foreach { case (id, gs, nFail, ff) =>
      assert(nFail === gs.count(_ == 0), s"doc $id n_fail")
      val expect = gs.indexWhere(_ == 0) match {
        case -1 => "pass"; case i => stages(i)
      }
      assert(ff === expect, s"doc $id first_fail")
    }
    assert(rows.exists(_._4 == "pass") && rows.exists(_._4 != "pass"),
      "fixture must have both kept and dropped docs")
  }

  test("train manifest ties out: survivors = funnel tail, packing exact") {
    import org.apache.spark.sql.functions.{col, size, split}
    val manifest = Curate.trainManifest(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val c = counts(sf0001)
    assert(manifest.map(_._2).sum === c(6),
      "manifest doc total != funnel final survivor count")
    val passIds = Curate.gateReport(spark, sf0001).collect()
      .filter(_.getString(8) == "pass").map(_.getLong(0)).toSet
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def saltOrd(id: Long): Long =
      math.floorMod(math.floorMod(id, 2147483648L) * 2654435761L, 2147483648L)
    val expect = passIds.groupBy(id => (saltOrd(id) % 32L).toInt)
      .map { case (s, ids) =>
        val t = ids.toSeq.map(toks).sum
        (s, ids.size.toLong, t, (t + 255L) / 256L)
      }.toSet
    assert(manifest.toSet === expect)
    manifest.foreach { case (_, _, t, q) =>
      assert(q === (t + 255L) / 256L && q * 256L >= t && (q - 1) * 256L < t)
    }
  }

  test("curriculum: quartile phases are score-monotone, keys deterministic") {
    import org.apache.spark.sql.functions._
    val rows = ext.Curate.queries("corpus_curriculum")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(rows.length.toLong === nDocs, "curriculum does not cover the corpus")
    assert(rows.map(_._2).toSet.subsetOf(Set(0L, 1L, 2L, 3L)))
    // phase 0 = the HIGHEST-quality quartile: per-token scores across
    // phases must be monotone non-increasing in phase number
    val spt = ext.TextOps.queries("text_quality_score_trained")(spark, sf0001)
      .select(col("doc_id"), expr("score_micro div n_tok").as("spt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byPhase = rows.groupBy(_._2).view
      .mapValues(_.map(r => spt(r._1))).toMap
    for (p <- 0L to 2L if byPhase.contains(p) && byPhase.contains(p + 1)) {
      assert(byPhase(p).min >= byPhase(p + 1).max,
        s"phase $p scores overlap phase ${p + 1} — banding broken")
    }
    // quartiles are balanced up to score ties (each phase within ±25%
    // of n/4 on this corpus)
    byPhase.foreach { case (p, xs) =>
      assert(math.abs(xs.size - nDocs / 4.0) <= nDocs / 4.0 * 0.25 + 1,
        s"phase $p size ${xs.size} far from quartile")
    }
    // order_key/shard are the shared Knuth scramble — tie to shard_plan's
    rows.foreach { case (id, _, key, shard) =>
      val k = ((id % 2147483648L) * 2654435761L) % 2147483648L
      assert(key === k && shard === (k % 32L).toInt)
    }
  }

  test("train schedule ties to BOTH parents: manifest per shard, curriculum per phase") {
    import org.apache.spark.sql.functions.{col, size, split}
    val sched = Curate.trainSchedule(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
                 r.getLong(4)))
    // summed over phases, the schedule IS the manifest's per-shard
    // docs/tokens (n_seqs re-ceils per group, deliberately not additive)
    val byShard = sched.groupBy(_._2).view
      .mapValues(rs => (rs.map(_._3).sum, rs.map(_._4).sum)).toMap
    val manifest = Curate.trainManifest(spark, sf0001).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byShard === manifest,
      "schedule summed over phases diverges from the manifest")
    // restricted per phase, it is the curriculum's kept-member census
    val passIds = Curate.gateReport(spark, sf0001).collect()
      .filter(_.getString(8) == "pass").map(_.getLong(0)).toSet
    val cur = Curate.curriculum(spark, sf0001).collect()
      .filter(r => passIds(r.getLong(0)))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = cur.groupBy(r => (r._2, r._3)).map { case ((p, s), rs) =>
      val t = rs.map(r => toks(r._1)).sum
      (p, s, rs.length.toLong, t, (t + 255L) / 256L)
    }.toSet
    assert(sched.toSet === expect,
      "schedule diverges from the curriculum's kept-member phase census")
  }
}
