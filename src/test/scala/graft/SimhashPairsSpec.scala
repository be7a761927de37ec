package graft

import graft.ext.Dedup
import org.apache.spark.sql.{functions => F}

/** Hamming-band SimHash pair detection (dedup_simhash_pairs).
  *
  * The load-bearing property is the Manku pigeonhole guarantee: with the
  * 60-bit fingerprint split into 4 bands of 15 bits, a pair at hamming
  * distance ≤ 3 cannot differ in every band, so the band-bucket join's
  * output must equal a brute-force all-pairs XOR scan EXACTLY — banding
  * is a cost optimization here, not a recall trade-off. The spec pins
  * that equality on the real corpus (where planted and natural dups
  * exist) and the hamming-0 behavior on a planted fixture.
  */
class SimhashPairsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("banded pairs == brute-force XOR scan at sf0.01 (pigeonhole recall)") {
    val sh = Dedup.simhash(spark, dir)
    val a = sh.select(F.col("doc_id").as("a_id"), F.col("simhash").as("a_sh"))
    val b = sh.select(F.col("doc_id").as("b_id"), F.col("simhash").as("b_sh"))
    val brute = a.crossJoin(b)
      .filter(F.col("a_id") < F.col("b_id"))
      .select(F.col("a_id"), F.col("b_id"),
              F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh"))).as("hamming"))
      .filter(F.col("hamming") <= Dedup.MaxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = Dedup.simhashPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(brute.nonEmpty, "corpus yields no hamming<=3 pairs — vacuous check")
    assert(banded === brute,
      s"banding lost/invented pairs: missed=${(brute -- banded).take(5)} " +
        s"extra=${(banded -- brute).take(5)}")
    info(s"${banded.size} pairs, banding exact vs brute force")
  }

  test("planted exact duplicate collides at hamming 0") {
    import spark.implicits._
    val body = (1 to 50).map(i => s"tok$i").mkString(" ")
    val other = (1 to 50).map(i => s"zzz$i").mkString(" ")
    val docs = Seq(
      (1L, body), (2L, body),            // exact dup pair
      (3L, other)                        // unrelated
    ).toDF("doc_id", "text")
    val got = Dedup.simhashPairsOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.contains((1L, 2L, 0)),
      s"exact dup must fingerprint identically (hamming 0), got $got")
    assert(!got.exists(p => p._3 > Dedup.MaxHamming))
  }
}
