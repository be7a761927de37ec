package graft

import graft.functions.ArrayDotLong
import org.apache.spark.sql.functions._

/** ArrayDotLong must be VALUE-IDENTICAL to the interpreted HOF chain it
  * replaced in the JL serve
  * (`aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, x) -> s + x)`):
  * exact int64 sums, and the HOF's null semantics — a length mismatch
  * (zip_with null padding) or any null element poisons the fold to
  * NULL. sim_jl_recall's oracle-checked recall row rides on this
  * equality. */
class ArrayDotLongSpec extends SparkSpec {

  private val hof = "aggregate(zip_with(a, b, (x, y) -> x * y), " +
    "CAST(0 AS BIGINT), (s, x) -> s + x)"

  test("ArrayDotLong ≡ aggregate(zip_with) HOF on random equal-length arrays") {
    val spk = spark
    import spk.implicits._
    val rnd = new scala.util.Random(2020)
    // JL-envelope magnitudes (|coord| ≤ 24e6) plus small values and zeros
    def coord(): Long = rnd.nextInt(3) match {
      case 0 => rnd.nextLong() % 24000000L
      case 1 => (rnd.nextInt(21) - 10).toLong
      case _ => 0L
    }
    val rows = (0 until 50).map { _ =>
      val n = rnd.nextInt(20)
      (Seq.fill(n)(coord()), Seq.fill(n)(coord()))
    }
    val df = rows.toDF("a", "b")
    val fast = df.select(ArrayDotLong.col(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
    val slow = df.select(expr(hof)).collect()
      .map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
    assert(fast === slow)
  }

  test("length mismatch and null elements yield NULL (HOF parity)") {
    val spk = spark
    import spk.implicits._
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L)),          // mismatch
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](3L, 4L)),    // null elem
      (Seq[java.lang.Long](), Seq[java.lang.Long]())                   // empty → 0
    ).toDF("a", "b")
    val fast = df.select(ArrayDotLong.col(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
    val slow = df.select(expr(hof)).collect()
      .map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
    assert(fast === slow)
    assert(fast === Seq(null, null, 0L))
  }

  test("self-dot instance equals the Σx² fold the JL norm used") {
    val spk = spark
    import spk.implicits._
    val df = Seq(Tuple1(Seq(3L, -4L, 12L))).toDF("a")
    val fast = df.select(ArrayDotLong.col(col("a"), col("a"))).head.getLong(0)
    val slow = df.select(
      expr("aggregate(a, CAST(0 AS BIGINT), (s, x) -> s + x * x)"))
      .head.getLong(0)
    assert(fast === slow && fast === 169L)
  }
}
