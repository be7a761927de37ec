package graft

import graft.functions.VecSum
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{functions => F}

/** VecSum (element-wise vector mean Aggregator) vs the posexplode →
  * groupBy(key, pos) → avg shape it replaced in the Similarity family:
  * value-identical, with bit-equality provable when the partial-merge
  * order is pinned to one partition. */
class VecSumSpec extends SparkSpec {

  private val vecMean = F.udaf(new VecSum, ExpressionEncoder[Array[Float]]())

  test("bit-identical to posexplode+avg on a single input partition") {
    // one input partition ⇒ both shapes fold the same values in the same
    // row order into one partial per key, so the IEEE sums (and the
    // final sum/count divide) are bit-identical — no rounding needed
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("label", "embedding").repartition(1)
    val ref = emb.select(F.col("label"), F.posexplode(F.col("embedding")))
      .groupBy("label", "pos")
      .agg(F.avg(F.col("col").cast("double")).as("m"))
    val got = emb.groupBy("label").agg(vecMean(F.col("embedding")).as("mv"))
      .select(F.col("label"), F.posexplode(F.col("mv")))
      .withColumnRenamed("col", "m")
    val j = ref.withColumnRenamed("m", "ref_m")
      .join(got, Seq("label", "pos"))
    assert(j.count() === ref.count(), "key sets differ")
    val diff = j.filter(F.col("ref_m") =!= F.col("m")).count()
    assert(diff === 0, s"$diff (label, pos) means differ bitwise")
  }

  test("matches posexplode+avg after 6-dp rounding under real partitioning") {
    // across partitions the merge order is scheduler-dependent for BOTH
    // shapes; the oracle contract is equality of the 6-dp-rounded means
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("label", "embedding")
    val ref = emb.select(F.col("label"), F.posexplode(F.col("embedding")))
      .groupBy("label", "pos")
      .agg(graft.ops.Num.rnd(F.avg(F.col("col").cast("double")), 6).as("m"))
    val got = emb.groupBy("label").agg(vecMean(F.col("embedding")).as("mv"))
      .select(F.col("label"), F.posexplode(F.col("mv")))
      .select(F.col("label"), F.col("pos"),
              graft.ops.Num.rnd(F.col("col"), 6).as("m"))
    assert(ref.exceptAll(got).count() === 0 && got.exceptAll(ref).count() === 0)
  }

  test("ragged and null arrays: per-dim counts, null rows skipped") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(1f, 2f)),
      (1L, Array(3f)),
      (2L, null.asInstanceOf[Array[Float]])
    ).toDF("id", "v")
    val out = df.agg(vecMean($"v").as("mv")).head().getSeq[Double](0)
    // dim 0 over rows {1, 3} → 2.0; dim 1 over the single row {2} → 2.0
    assert(out === Seq(2.0, 2.0))
  }
}
