package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mutable element-wise accumulator: per-dim double sums + per-dim row
  * counts. A case class so the product `ExpressionEncoder` serializes it
  * flat (two primitive arrays) at shuffle/spill — no kryo blobs. */
final case class VecSumBuf(var s: Array[Double], var n: Array[Long])

/** Element-wise vector mean as ONE typed Aggregator over the embedding
  * array — the centroid reduce of the similarity family (ivfTrain /
  * centroidBySource / labelEval and the iterated Lloyd loop).
  *
  * The previous shape, `posexplode(embedding)` → `groupBy(key, pos)` →
  * `avg`, multiplies every input row by dim (64×) BEFORE the exchange:
  * the shuffle carries n·64 (key, pos, value) rows. This Aggregator
  * keeps the reduce in vector space — the map side combines each
  * partition's rows into one (sums[dim], counts[dim]) buffer per key, so
  * the exchange carries ~keys·partitions buffers instead of n·64 rows
  * (the per-row constant a 100 TB embed stage pays; round-4/5 verdict
  * optional #7).
  *
  * Value semantics match the posexplode path exactly: each float element
  * is widened to double and summed (same widening the old
  * `cast("double")` did), and each dim's mean divides by the number of
  * rows CARRYING that dim (per-dim counts), which is `avg`'s per-(key,
  * pos) group count — identical for fixed-dim corpora and still correct
  * for ragged ones. Summation ORDER matches per partition (row order,
  * like the partial `avg`); merge order across partitions is
  * scheduler-dependent for BOTH shapes, which is why every consumer
  * rounds at 6 dp before the cross-engine compare (fp spread ~1e-14 vs
  * a 5e-7 boundary). A dim no row carries yields NaN (the posexplode
  * path emits no such row at all; encoders cannot carry per-element
  * nulls in a primitive array — callers treat NaN as "absent").
  *
  * Null ARRAYS are skipped (like explode dropping nothing and `avg`
  * skipping nulls); null ELEMENTS cannot occur (primitive float array
  * input — the embeddings schema is a dense float list).
  */
final class VecSum extends Aggregator[Array[Float], VecSumBuf, Array[Double]] {

  override def zero: VecSumBuf =
    VecSumBuf(Array.emptyDoubleArray, Array.emptyLongArray)

  private def grow(b: VecSumBuf, len: Int): Unit =
    if (b.s.length < len) {
      b.s = java.util.Arrays.copyOf(b.s, len)
      b.n = java.util.Arrays.copyOf(b.n, len)
    }

  override def reduce(b: VecSumBuf, a: Array[Float]): VecSumBuf = {
    if (a != null) {
      grow(b, a.length)
      var i = 0
      while (i < a.length) { b.s(i) += a(i); b.n(i) += 1; i += 1 }
    }
    b
  }

  override def merge(x: VecSumBuf, y: VecSumBuf): VecSumBuf = {
    grow(x, y.s.length)
    var i = 0
    while (i < y.s.length) { x.s(i) += y.s(i); x.n(i) += y.n(i); i += 1 }
    x
  }

  override def finish(b: VecSumBuf): Array[Double] =
    if (b.s.isEmpty) null
    else {
      val out = new Array[Double](b.s.length)
      var i = 0
      while (i < b.s.length) {
        out(i) = if (b.n(i) == 0) Double.NaN else b.s(i) / b.n(i)
        i += 1
      }
      out
    }

  override def bufferEncoder: Encoder[VecSumBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
}

/** [[VecSum]] over DOUBLE arrays — the residual-space variant: IVF-PQ
  * residuals are exact IEEE doubles (float embedding − 6-dp centroid),
  * and narrowing them back to float would break the cross-engine
  * bit-identity the oracles rest on. Identical buffer, merge, and
  * per-dim-count semantics. */
final class VecSumD extends Aggregator[Array[Double], VecSumBuf, Array[Double]] {

  override def zero: VecSumBuf =
    VecSumBuf(Array.emptyDoubleArray, Array.emptyLongArray)

  private def grow(b: VecSumBuf, len: Int): Unit =
    if (b.s.length < len) {
      b.s = java.util.Arrays.copyOf(b.s, len)
      b.n = java.util.Arrays.copyOf(b.n, len)
    }

  override def reduce(b: VecSumBuf, a: Array[Double]): VecSumBuf = {
    if (a != null) {
      grow(b, a.length)
      var i = 0
      while (i < a.length) { b.s(i) += a(i); b.n(i) += 1; i += 1 }
    }
    b
  }

  override def merge(x: VecSumBuf, y: VecSumBuf): VecSumBuf = {
    grow(x, y.s.length)
    var i = 0
    while (i < y.s.length) { x.s(i) += y.s(i); x.n(i) += y.n(i); i += 1 }
    x
  }

  override def finish(b: VecSumBuf): Array[Double] =
    if (b.s.isEmpty) null
    else {
      val out = new Array[Double](b.s.length)
      var i = 0
      while (i < b.s.length) {
        out(i) = if (b.n(i) == 0) Double.NaN else b.s(i) / b.n(i)
        i += 1
      }
      out
    }

  override def bufferEncoder: Encoder[VecSumBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
}
