package graft

import org.apache.spark.sql.functions._

/** Bloom pre-screen (Dedup.bloomScreen): must equal a brute driver-side
  * bloom (same portable folds), and false negatives must be structurally
  * impossible — every true duplicate is flagged.
  */
class BloomScreenSpec extends SparkSpec {

  private def polyHash(s: String, base: Long, m: Long): Long = {
    var acc = 0L
    s.foreach { ch => acc = (acc * base + ch.toLong) % m }
    acc
  }

  test("screen equals brute bloom; no false negatives") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val split = docs.length / 2
    def norm(t: String): String =
      t.toLowerCase.trim.replaceAll(" +", " ")
    val bases = Seq(131L, 137L, 139L)
    def positions(t: String): Set[Long] =
      bases.map(b => polyHash(norm(t), b, 1000003L) % 4096L).toSet
    val corpus = docs.filter(_._1 < split)
    val batch = docs.filter(_._1 >= split)
    val bits = corpus.flatMap(d => positions(d._2)).toSet
    val corpusNorms = corpus.map(d => norm(d._2)).toSet
    val expect = batch.map { case (id, t) =>
      val flagged = positions(t).subsetOf(bits)
      val isDup = corpusNorms.contains(norm(t))
      id -> ((if (flagged) 1 else 0, if (isDup) 1 else 0))
    }.toMap
    val got = ext.Dedup.queries("dedup_bloom_screen")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap
    assert(got.view.mapValues(v => (v._1, v._2)).toMap === expect)
    got.values.foreach { case (f, d, v) =>
      assert(v !== "fn", "bloom false negative — structurally impossible")
      assert(v === ((f, d) match {
        case (1, 1) => "tp"; case (1, 0) => "fp"
        case (0, 0) => "tn"; case _ => "fn"
      }))
    }
    assert(got.values.exists(_._1 == 1), "no flags at all — vacuous fixture")
  }
}
