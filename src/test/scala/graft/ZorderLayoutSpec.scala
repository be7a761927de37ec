package graft

import org.apache.spark.sql.functions._

/** Proves the z-order layout claim (Scalars.zorder scaladoc): writing
  * files clustered by the Morton key bounds每 file's min/max box in BOTH
  * dimensions, so file/row-group stats can prune scans filtered on
  * either column. The single-dim-sorted baseline bounds only its own
  * sort column — the other dimension spans the full range per file. */
class ZorderLayoutSpec extends SparkSpec {

  private def avgWidths(path: String): (Double, Double) = {
    val per = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg((max("zx") - min("zx")).as("wx"),
           (max("zy") - min("zy")).as("wy"))
      .collect()
    (per.map(_.getAs[Long]("wx")).sum.toDouble / per.length,
     per.map(_.getAs[Long]("wy")).sum.toDouble / per.length)
  }

  test("z-clustered files have tight min/max boxes in BOTH dims; single-dim sort does not") {
    val df = ops.Scalars.zorder(spark, sf0001)
    val zOut = Tables.scratch("zorder-layout-z")
    val xOut = Tables.scratch("zorder-layout-x")
    df.repartitionByRange(16, col("zval")).sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(zOut)
    df.repartitionByRange(16, col("zx")).sortWithinPartitions("zx")
      .write.mode("overwrite").parquet(xOut)
    val (zWx, zWy) = avgWidths(zOut)
    val (xWx, xWy) = avgWidths(xOut)
    // global range is ~255 per dim. 16 contiguous z-ranges ≈ 64×64 blocks
    // (plus range-boundary spill); both dims stay far below full range.
    assert(zWx < 180 && zWy < 180, s"z layout boxes too wide: $zWx × $zWy")
    // the x-sorted baseline is tight on zx but blind on zy
    assert(xWx < 64, s"x-sorted baseline should bound zx: $xWx")
    assert(xWy > 200, s"x-sorted baseline should NOT bound zy: $xWy")
    assert(zWy < xWy / 2, s"z layout must beat single-dim sort on the second dim: $zWy vs $xWy")
  }
}
