package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** `collect_set(id)` with a HARD buffer bound — the constant-space form
  * of a document-frequency cap. A plain
  * `collect_set(...)` + `filter(size <= cap)` materializes the FULL
  * posting list of a hot key in one aggregation buffer before the
  * filter discards it (a boilerplate shingle shared by 100M docs is an
  * ~800 MB single-reducer buffer at the 100 TB design point). This
  * aggregator's buffer never exceeds cap+1 elements: the moment a
  * (partial) set passes the cap it is pinned at cap+1 (a tombstone),
  * which map-side combine propagates — hot keys cost O(cap) everywhere
  * and surface as NULL for the caller to drop.
  *
  * Output: the SORTED distinct ids, or null (None) when more than `cap`
  * distinct ids were seen. cap is small (≤ a few hundred), so the O(cap)
  * containment scans are cheaper than hashing overhead at these sizes.
  */
class BoundedCollectSet(cap: Int)
    extends Aggregator[Long, Seq[Long], Option[Seq[Long]]] {

  // overflow tombstone: a buffer pinned at exactly cap+1 elements
  private def overflowed(b: Seq[Long]): Boolean = b.length > cap

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], id: Long): Seq[Long] =
    if (overflowed(b) || b.contains(id)) b else b :+ id

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    if (overflowed(a)) a
    else if (overflowed(b)) b
    else {
      var acc = a
      val it = b.iterator
      while (it.hasNext && !overflowed(acc)) {
        val id = it.next()
        if (!acc.contains(id)) acc = acc :+ id
      }
      acc
    }
  }

  override def finish(b: Seq[Long]): Option[Seq[Long]] =
    if (overflowed(b)) None else Some(b.sorted)

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Option[Seq[Long]]] = ExpressionEncoder()
}
