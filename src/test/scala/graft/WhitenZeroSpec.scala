package graft

import org.apache.spark.sql.functions._

/** Pins the negative-zero normalization rule (CLAUDE.md float section):
  * zero-centered outputs can round to a signed zero, and DuckDB's float
  * round keeps IEEE −0.0 where Spark's BigDecimal round emits +0.0 — a
  * one-cell hash divergence (seen live: emb_whiten round 6, one z in
  * (−0.00005, 0) among 32,000 at sf0.01). The fix is `+ 0.0` AFTER the
  * round on BOTH engines; this spec keeps it fixed. */
class WhitenZeroSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"
  private def isNegZero(d: Double): Boolean =
    java.lang.Double.doubleToRawLongBits(d) == java.lang.Double.doubleToRawLongBits(-0.0)

  test("crafted tiny-negative value rounds to +0.0 through the normalized form") {
    import spark.implicits._
    // the exact shape that diverged: |x| < 0.5·10^-4 rounds to zero at
    // 4 dp; without + 0.0 Spark emits +0.0 but an IEEE-sign-preserving
    // engine emits −0.0 for the negative inputs
    val xs = Seq(-0.00003, -0.000049999, 0.00003, -0.0, 0.0).toDF("x")
    val zs = xs.select((ops.Num.rnd(col("x"), 4) + lit(0.0)).as("z"))
      .collect().map(_.getDouble(0))
    assert(zs.forall(_ == 0.0))
    assert(zs.forall(z => !isNegZero(z)), "normalized form must never emit -0.0")
  }

  test("whiten output at sf0.01 contains no negative-zero cells") {
    val zs = ext.Similarity.whiten(spark, sf001)
      .filter(col("z") === 0.0) // IEEE: -0.0 === 0.0, so this keeps both signs
      .select("z").collect().map(_.getDouble(0))
    assert(zs.nonEmpty, "sf0.01 corpus is known to produce at least one zero z")
    assert(zs.forall(z => !isNegZero(z)), "whiten must normalize -0.0 to +0.0")
  }
}
