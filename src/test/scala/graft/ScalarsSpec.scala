package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the reference's Python edge semantics — SURVEY §7.3:
  * double/0 → Infinity (F2), sentinel→null (P10), the `or 0`
  * zero-swallowing coalesce deviation (F7), null propagation. */
class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  test("division by zero: reference parity (Glue Spark 3 non-ANSI) is NULL via try_divide (F2)") {
    // Spark 4 defaults to ANSI (plain `/` errors on zero divisor);
    // the reference ran non-ANSI Spark 3 where double/0 → NULL.
    // try_divide reproduces reference behavior under ANSI.
    val r = Seq((1.0, 0.0)).toDF("a", "b")
      .select(try_divide($"a", $"b").as("q")).head()
    assert(r.isNullAt(0))
    // and the ANSI default raises — pinned so a config change is noticed
    intercept[Exception] {
      Seq((1.0, 0.0)).toDF("a", "b").select(($"a" / $"b").as("q")).collect()
    }
  }

  test("null propagates through division and round (F2/F3)") {
    val r = Seq((Some(10.0), Option.empty[Double])).toDF("a", "b")
      .select(round($"a" / $"b", 2).as("q")).head()
    assert(r.isNullAt(0))
  }

  test("sentinel <= -999999 maps to null (P10)") {
    val df = Seq(-999999.0, -1000000.0, 42.0).toDF("v")
      .select(when($"v" > -999999, $"v").as("clean"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq === Seq(None, None, Some(42.0)))
  }

  test("Python `or 0` swallows legitimate zeros — documented deviation (F7)") {
    // reference: `safe_int(x) or 0` maps BOTH null and 0 to 0; our
    // coalesce maps only null. The deviation variant needs an explicit
    // zero-check — pin both behaviors.
    val df = Seq(Some(0.0), None, Some(5.0)).toDF("v")
    val coalesced = df.select(coalesce($"v", lit(0.0))).as[Double].collect()
    assert(coalesced.toSeq === Seq(0.0, 0.0, 5.0))
    val pythonOr = df.select(
      when($"v".isNull || $"v" === 0, lit(0.0)).otherwise($"v")).as[Double].collect()
    assert(pythonOr.toSeq === Seq(0.0, 0.0, 5.0))
  }

  test("string cast to int: invalid → null via try_cast (F8, reference parity)") {
    val got = Seq("12", "x", "").toDF("s")
      .select(expr("try_cast(s AS INT)").as("i")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got.toSeq === Seq(Some(12), None, None))
  }

  test("portable rounding matches plain round away from ties") {
    val vals = Seq(1.234, 5.678, -2.345, 100.0)
    val df = vals.toDF("v")
    val a = df.select(ops.Num.rnd($"v", 2)).as[Double].collect()
    val b = df.select(round($"v", 2)).as[Double].collect()
    assert(a.toSeq === b.toSeq)
  }

  test("zip_code stays string — leading zeros preserved (SURVEY §7.3)") {
    val schema = StructType(Seq(StructField("zip_code", StringType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row("01002"), Row("90210")), schema)
    assert(df.filter($"zip_code" === "01002").count() === 1)
  }
}
