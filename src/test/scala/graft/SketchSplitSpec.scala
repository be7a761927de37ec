package graft

import graft.ext.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Round-7 eval/fold operators: the leakage-safe split
  * (`corpus_split_safe`) and the mergeable minhash sketch re-agg
  * (`dedup_sketch_merge`). The split's whole contract is structural —
  * no cluster may straddle a fold — and the sketch's whole contract is
  * algebraic — a union's signature IS the element-wise min of member
  * signatures; both are pinned here directly rather than trusted from
  * the docstrings. */
class SketchSplitSpec extends SparkSpec {

  import spark.implicits._

  private val sf001 = "/root/testdata/sf0.01"

  test("no near-dup cluster ever straddles a fold boundary") {
    val straddlers = Dedup.splitSafe(spark, sf001)
      .groupBy("cluster").agg(countDistinct("split").as("nf"))
      .filter(col("nf") > 1)
    assert(straddlers.count() == 0, "cluster members split across folds")
  }

  test("singleton clusters reproduce the plain doc_id hash split rule") {
    // cluster == doc_id for singletons, so the Knuth-scramble bucket of
    // the cluster label must equal the bucket of the doc_id — splitSafe
    // and corpus_split only disagree where a real near-dup cluster
    // forces cohesion
    val b = Similarity.saltOrd(col("doc_id")) % 100
    val expected = when(b < 80, "train")
      .when(b < 90, "validation").otherwise("test")
    val mism = Dedup.splitSafe(spark, sf001)
      .filter(col("cluster") === col("doc_id"))
      .filter(col("split") =!= expected)
    assert(mism.count() == 0, "singleton fold differs from hash-split rule")
  }

  test("fold assignment is total and covers every document") {
    val n = Tables.documents(spark, sf001).count()
    val df = Dedup.splitSafe(spark, sf001)
    assert(df.count() == n)
    assert(df.filter(!col("split").isin("train", "validation", "test"))
      .count() == 0)
  }

  test("minhash signature of a union is the element-wise min of member signatures") {
    // the re-agg property sketchMerge rests on, checked on the real
    // corpus: re-signing ALL shingles under one label must equal the
    // min-merge of the per-doc signature index
    val docs = Tables.documents(spark, sf0001).limit(40)
    val hs = Dedup.hsOf(Dedup.shingleGroups(docs, 3))
    val perDoc = Dedup.sigsOf(hs)
    val mergedCols = (0 until 32).map(j => min(col(s"h$j")).as(s"h$j"))
    val merged = perDoc.agg(mergedCols.head, mergedCols.tail: _*).collect().head
    val direct = Dedup.sigsOf(hs.withColumn("doc_id", lit(0L)))
      .drop("doc_id").collect().head
    (0 until 32).foreach { j =>
      assert(merged.getLong(j) == direct.getLong(j),
        s"component $j: min-merge ${merged.getLong(j)} != re-sign ${direct.getLong(j)}")
    }
  }

  test("identical sources estimate J=1; disjoint sources measure J=0 exactly") {
    val txt = (1 to 20).map(i => s"w$i").mkString(" ")
    val other = (1 to 20).map(i => s"z$i").mkString(" ")
    val docs = Seq(
      (0L, "sA", txt), (1L, "sB", txt), (2L, "sC", other)
    ).toDF("doc_id", "source", "text")
    val out = Dedup.sketchMergeOf(docs)
      .select("a_src", "b_src", "est_jaccard_micro", "exact_jaccard_micro")
      .collect().map(r => (r.getString(0), r.getString(1),
                           r.getLong(2), r.getLong(3))).toMap2
    assert(out(("sA", "sB")) == (1000000L, 1000000L),
      "identical sources must agree on every component and exactly")
    assert(out(("sA", "sC"))._2 == 0L && out(("sB", "sC"))._2 == 0L,
      "disjoint sources share no shingle hashes")
  }

  test("sketch metrics stay in range on the real corpus") {
    val bad = Dedup.sketchMerge(spark, sf001).filter(
      col("n_agree") < 0 || col("n_agree") > 32 ||
      col("est_jaccard_micro") < 0 || col("est_jaccard_micro") > 1000000 ||
      col("exact_jaccard_micro") < 0 || col("exact_jaccard_micro") > 1000000 ||
      col("inter") > col("uni"))
    assert(bad.count() == 0, "sketch-merge metric out of range")
  }

  private implicit class Tupled(
      rows: Array[(String, String, Long, Long)]) {
    def toMap2: Map[(String, String), (Long, Long)] =
      rows.map { case (a, b, e, x) => ((a, b), (e, x)) }.toMap
  }
}
