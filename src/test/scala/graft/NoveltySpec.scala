package graft

import org.apache.spark.sql.functions._

/** N-gram novelty (Dedup.ngramNovelty) and the dedup savings report
  * (Dedup.dedupSavings): brute recomputes + cross-query consistency.
  */
class NoveltySpec extends SparkSpec {

  test("novelty equals brute first-occurrence recompute; doc 0 fully novel") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val shingles = docs.map { case (id, t) =>
      val toks = t.split(" ")
      id -> toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val first = collection.mutable.Map[String, Long]()
    docs.foreach { case (id, _) =>
      shingles(id).foreach(s => if (!first.contains(s)) first(s) = id)
    }
    val expect = docs.map { case (id, _) =>
      val sh = shingles(id)
      val novel = sh.count(s => first(s) == id).toLong
      val nm = if (sh.isEmpty) 1000000L else novel * 1000000L / sh.size
      id -> ((sh.size.toLong, novel, nm))
    }.toMap
    val got = ext.Dedup.queries("text_ngram_novelty")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expect)
    val firstDoc = docs.head._1
    if (shingles(firstDoc).nonEmpty)
      assert(got(firstDoc)._3 === 1000000L, "earliest doc must be fully novel")
    assert(got.values.map(_._3).toSet.size > 1, "constant novelty — vacuous")
  }

  test("df histogram equals brute shingle-frequency recompute") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val dfs = docs.flatMap { case (id, t) =>
      val shs: Seq[String] = t.split(" ").sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSeq.distinct
      shs.map(sh => (id, sh))
    }.groupBy(_._2).values.map(_.length.toLong).toSeq
    def bucket(df: Long): Int =
      if (df == 1) 0 else if (df <= 2) 1 else if (df <= 4) 2
      else if (df <= 8) 3 else if (df <= 16) 4 else if (df <= 32) 5
      else if (df <= 64) 6 else if (df <= 100) 7 else 8
    val expect = dfs.groupBy(bucket).map { case (b, xs) =>
      b -> ((xs.size.toLong, xs.sum, xs.size.toLong * 1000000L / dfs.size))
    }
    val got = ext.Dedup.queries("dedup_df_hist")(spark, sf0001)
      .collect()
      .map(r => (r.getInt(0), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === expect)
    assert(got.values.map(_._1).sum === dfs.size.toLong)
    assert(got.size >= 2, "one-band histogram — vacuous fixture")
  }

  test("savings report consistent with keep list and token totals") {
    val keep = ext.Dedup.queries("dedup_keep")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val r = ext.Dedup.queries("corpus_dedup_savings")(spark, sf0001)
      .collect().head
    val (nDocs, nKept, nDropped) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (tokTotal, tokKept, tokDropped, sav) =
      (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    assert(nDocs === toks.size.toLong)
    assert(nKept === keep.length.toLong)
    assert(nDropped === nDocs - nKept)
    assert(tokTotal === toks.values.sum)
    assert(tokKept === keep.map(k => toks(k._1)).sum)
    assert(tokDropped === tokTotal - tokKept)
    assert(sav === tokDropped * 1000000L / tokTotal)
    assert(nDropped > 0L, "no dup clusters at sf0.001 — vacuous fixture")
  }
}
