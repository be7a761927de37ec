package graft

import graft.functions.ArrayL1
import org.apache.spark.sql.functions._

/** ArrayL1 must be VALUE-IDENTICAL to the HOF fold it stands in for
  * (`aggregate(zip_with(a, b, |x−y|), 0L, _+_)`) — pure integer
  * arithmetic, so equality is exact — with zip_with's null semantics
  * (length mismatch or null element → null).
  */
class ArrayL1Spec extends SparkSpec {

  private def hofL1 = (a: String, b: String) =>
    aggregate(zip_with(col(a), col(b),
        (x, y) => abs(x - y)),
      lit(0L), (acc, x) => acc + x)

  test("identical to the HOF fold on real histogram-sized data") {
    val spk = spark
    import spk.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)((
      Seq.fill(256)(rnd.nextInt(1000).toLong),
      Seq.fill(256)(rnd.nextInt(1000).toLong)))
    val df = rows.toDF("a", "b")
    val diff = df.select(ArrayL1.col(col("a"), col("b")).as("fast"),
                         hofL1("a", "b").as("hof"))
      .filter(col("fast") =!= col("hof"))
    assert(diff.count() === 0, "codegen'd L1 diverged from the HOF fold")
    // spot value against a driver-side recompute
    val first = df.limit(1).select(ArrayL1.col(col("a"), col("b"))).head().getLong(0)
    val (xa, xb) = rows.head
    assert(first === xa.zip(xb).map { case (x, y) => math.abs(x - y) }.sum)
  }

  test("null semantics: mismatch or null element -> null; symmetry; zero on self") {
    val spk = spark
    import spk.implicits._
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L)),
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](3L, 4L))
    ).toDF("a", "b")
    df.select(ArrayL1.col(col("a"), col("b")).as("v")).collect()
      .foreach(r => assert(r.isNullAt(0)))
    val s = Seq((Seq(5L, 7L, 9L), Seq(2L, 11L, 9L))).toDF("a", "b")
      .select(ArrayL1.col(col("a"), col("b")).as("ab"),
              ArrayL1.col(col("b"), col("a")).as("ba"),
              ArrayL1.col(col("a"), col("a")).as("self")).head()
    assert(s.getLong(0) === 7L && s.getLong(1) === 7L && s.getLong(2) === 0L)
  }
}
