package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Fused per-group top-k as a typed `Aggregator[IN, BUF, OUT]` — the
  * SURVEY §7 extension candidate made concrete.
  *
  * The window-function top-k (`row_number over (partition … order …)`)
  * shuffles EVERY row of a group to one reducer and sorts it; this
  * aggregator keeps a bounded k-element buffer, combines map-side
  * (partial aggregation), and ships only k rows per group per partition
  * across the wire — the right shape when k ≪ group size, which is the
  * 100 TB case (top-100 listings per state over billions of rows).
  *
  * IN = (sortKey, payload id); OUT = ids of the k largest sortKeys,
  * ties broken by smaller id (matches `orderBy(desc(key), asc(id))`).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), mutable.ArrayBuffer[(Double, Long)], Seq[Long]] {

  private def prune(b: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    if (b.length > k) {
      val sorted = b.sortBy { case (v, id) => (-v, id) }
      b.clear()
      b ++= sorted.take(k)
    }
    b
  }

  override def zero: mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  override def reduce(b: mutable.ArrayBuffer[(Double, Long)],
                      in: (Double, Long)): mutable.ArrayBuffer[(Double, Long)] = {
    b += in
    if (b.length > 4 * k) prune(b) else b // amortize sorting
  }

  override def merge(a: mutable.ArrayBuffer[(Double, Long)],
                     b: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] =
    prune(a ++= b)

  override def finish(b: mutable.ArrayBuffer[(Double, Long)]): Seq[Long] =
    b.sortBy { case (v, id) => (-v, id) }.take(k).map(_._2).toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[(Double, Long)]] =
    Encoders.kryo[mutable.ArrayBuffer[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
