package graft

import graft.functions.ArrayDot
import org.apache.spark.sql.functions._

/** ArrayDot must be VALUE-IDENTICAL to the HOF fold it replaced — same
  * left-to-right double accumulation, same null semantics (length
  * mismatch or null element → null). Bit-level equality is the claim
  * (the similarity oracles depend on it), so comparisons here are exact,
  * not within-epsilon. */
class ArrayDotSpec extends SparkSpec {

  private def hofDot = (a: String, b: String) =>
    aggregate(zip_with(col(a), col(b),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the HOF fold on real embeddings (float arrays)") {
    val e = Tables.embeddings(spark, sf0001)
    val pairs = e.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(e.filter(col("vec_id") === 0).select(col("embedding").as("b")))
    val diff = pairs.select(
        ArrayDot.col(col("a"), col("b")).as("fast"), hofDot("a", "b").as("hof"))
      .filter(col("fast") =!= col("hof")) // exact double comparison
    assert(diff.count() === 0, "codegen'd dot diverged from the HOF fold")
  }

  test("double arrays and mixed float×double sides") {
    val spk = spark
    import spk.implicits._
    val df = Seq((Seq(1.5, -2.0, 3.25), Seq(2.0f, 0.5f, -1.0f)))
      .toDF("d", "f")
    val r = df.select(
      ArrayDot.col(col("d"), col("d")).as("dd"),
      ArrayDot.col(col("d"), col("f")).as("df"),
      hofDot("d", "f").as("hof_df")).head()
    assert(r.getDouble(0) === 1.5 * 1.5 + 4.0 + 3.25 * 3.25)
    assert(r.getDouble(1) === r.getDouble(2))
  }

  test("null semantics match zip_with padding: mismatch or null element -> null") {
    val spk = spark
    import spk.implicits._
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),      // length mismatch
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)) // null element
    ).toDF("a", "b")
    val out = df.select(ArrayDot.col(col("a"), col("b")).as("v"),
                        hofDot("a", "b").as("hof")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0), s"expected null, got ${r.get(0)}")
      assert(r.isNullAt(1), "HOF reference disagrees — semantics drifted")
    }
  }

  test("registered in SQL via GraftExtensions") {
    val spk = spark
    import spk.implicits._
    Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("arraydot_v")
    val v = spark.sql("SELECT array_dot(a, b) AS v FROM arraydot_v").head().getDouble(0)
    assert(v === 11.0)
  }
}
