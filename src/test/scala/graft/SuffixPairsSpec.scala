package graft

import graft.functions.SuffixPairs
import org.apache.spark.sql.functions._

/** SuffixPairs must be VALUE-IDENTICAL to the interpreted HOF chain it
  * replaced ([[graft.ext.Dedup.pairExpr]]): same pairs, same order
  * (i asc, j asc), same field names (a, b). The dedup/multimodal pair
  * counts — and through them six oracle-checked queries — ride on this
  * equality, so comparison is exact row-list equality after explode. */
class SuffixPairsSpec extends SparkSpec {

  private val hof = graft.ext.Dedup.pairExpr

  test("explode(SuffixPairs) ≡ explode(pairExpr HOF) incl. order, on random arrays") {
    val spk = spark
    import spk.implicits._
    val rnd = new scala.util.Random(4242)
    val arrays = (0 until 40).map { _ =>
      Seq.fill(rnd.nextInt(12))(rnd.nextLong())
    } // lengths 0..11, arbitrary (unsorted, dup-capable) elements
    val df = arrays.zipWithIndex.map { case (xs, i) => (i, xs) }.toDF("row", "ids")
    val fast = df.select(col("row"),
        explode(SuffixPairs.col(col("ids"))).as("p"))
      .select("row", "p.a", "p.b").collect().toSeq
    val slow = df.select(col("row"), explode(expr(hof)).as("p"))
      .select("row", "p.a", "p.b").collect().toSeq
    assert(fast === slow)
  }

  test("degenerate inputs: empty and 1-element arrays yield no pairs") {
    val spk = spark
    import spk.implicits._
    val df = Seq(Tuple1(Seq.empty[Long]), Tuple1(Seq(7L))).toDF("ids")
    assert(df.select(explode(SuffixPairs.col(col("ids")))).count() === 0)
  }

  test("production posting-list shape: sorted distinct ids, pair count n(n-1)/2") {
    val spk = spark
    import spk.implicits._
    val ids = (1L to 40L).toSeq
    val df = Seq(Tuple1(ids)).toDF("ids")
    val rows = df.select(explode(SuffixPairs.col(col("ids"))).as("p"))
      .select("p.a", "p.b").collect()
    assert(rows.length === 40 * 39 / 2)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    // grouped-count path (the production consumer shape) agrees with HOF
    val cntFast = df.select(explode(SuffixPairs.col(col("ids"))).as("p"))
      .groupBy("p.a").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cntSlow = df.select(explode(expr(hof)).as("p"))
      .groupBy("p.a").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cntFast === cntSlow)
  }
}
