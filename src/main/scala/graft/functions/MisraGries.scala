package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Misra–Gries frequent-items sketch as a typed `Aggregator` — the
  * bounded-memory heavy-hitters pass a 100 TB vocabulary scan needs:
  * an exact `groupBy(token).count` materializes every distinct token on
  * the reducers (unbounded at web scale), while this summary holds AT
  * MOST k counters per partition, combines map-side, and ships k rows
  * per partition across the wire.
  *
  * Guarantee (classic, survives merging): after summarizing a stream of
  * n items, every item with true frequency > n/(k+1) is present in the
  * buffer, and each retained count underestimates by at most n/(k+1).
  * Merging two summaries adds their error bounds, so the union of
  * partition summaries keeps the guarantee for the whole input. The
  * candidate set is therefore COMPLETE for any threshold > n/(k+1); an
  * exact confirm join (count only the candidates) then removes false
  * positives — which is what makes the end-to-end operator
  * deterministic and oracle-checkable despite the sketch in the middle.
  */
class MisraGries(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[String]] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long],
                      tok: String): mutable.Map[String, Long] = {
    b.get(tok) match {
      case Some(c) => b(tok) = c + 1
      case None if b.size < k => b(tok) = 1L
      case None =>
        // classic MG step: a miss on a full buffer decrements every
        // counter (the miss "cancels" one occurrence of each resident)
        val dead = mutable.ArrayBuffer.empty[String]
        b.keysIterator.foreach { t =>
          val c = b(t) - 1
          if (c <= 0) dead += t else b(t) = c
        }
        dead.foreach(b.remove)
    }
    b
  }

  override def merge(a: mutable.Map[String, Long],
                     b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (t, c) => a(t) = a.getOrElse(t, 0L) + c }
    if (a.size > k) {
      // standard merged-summary trim: subtract the (k+1)-th largest
      // count from everything, drop the non-positive — error bounds add
      val thresh = a.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.keysIterator.foreach { t =>
        val c = a(t) - thresh
        if (c <= 0) dead += t else a(t) = c
      }
      dead.foreach(a.remove)
    }
    a
  }

  /** Sorted for determinism; counts are deliberately NOT emitted — they
    * are sketch underestimates, and the consumer's exact confirm pass is
    * the source of truth. */
  override def finish(b: mutable.Map[String, Long]): Seq[String] =
    b.keysIterator.toSeq.sorted

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
