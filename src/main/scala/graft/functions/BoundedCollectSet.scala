package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Open-addressed long-hash buffer for [[BoundedCollectSet]]: a fixed
  * power-of-two table (linear probing, `Long.MinValue` = empty slot) plus
  * a distinct count. `Long.MinValue` itself cannot live in the table, so
  * its presence is tracked out-of-band in `hasMin` (counted in `n` like
  * any other id) — without this, a MinValue input would be written into a
  * slot that still reads as empty and silently corrupt the count.
  * `n = cap + 1` is the overflow tombstone. The table never fills
  * (capacity >= 2·(cap+1)), so probes always terminate. A case class so
  * the product `ExpressionEncoder` serializes it at shuffle/spill
  * boundaries; between per-row updates it lives as a plain JVM object
  * inside the `TypedImperativeAggregate` buffer, so inserts never touch
  * the encoder.
  */
case class BcsBuf(table: Array[Long], var n: Int, var hasMin: Boolean)

/** `collect_set(id)` with a HARD buffer bound — the constant-space form
  * of a document-frequency cap. A plain
  * `collect_set(...)` + `filter(size <= cap)` materializes the FULL
  * posting list of a hot key in one aggregation buffer before the
  * filter discards it (a boilerplate shingle shared by 100M docs is an
  * ~800 MB single-reducer buffer at the 100 TB design point). This
  * aggregator's buffer is a fixed O(cap) table: the moment more than
  * `cap` distinct ids are seen the count pins at cap+1 (a tombstone),
  * which map-side combine propagates — hot keys cost O(cap) space
  * everywhere and surface as NULL for the caller to drop.
  *
  * Output: the SORTED distinct ids, or null (None) when more than `cap`
  * distinct ids were seen. Round 3 used a flat `Seq[Long]` buffer whose
  * per-row `contains` scan was O(cap) — at one scan per (shingle, doc)
  * occurrence that constant dominated the dedup family bench; the
  * open-addressed probe is O(1) per row at identical semantics for the
  * full Long domain (including `Long.MinValue`, handled out-of-band).
  */
class BoundedCollectSet(cap: Int)
    extends Aggregator[Long, BcsBuf, Option[Seq[Long]]] {

  private val Empty = Long.MinValue
  // smallest power of two >= 2*(cap+1): load factor <= 0.5, probes short
  private val capacity = Integer.highestOneBit(math.max(4, 2 * (cap + 1) - 1)) * 2
  private val mask = capacity - 1

  private def slot(id: Long): Int = {
    val h = id * -7046029254386353131L // Fibonacci-style mix
    ((h ^ (h >>> 32)).toInt) & mask
  }

  /** Insert one id; flips to the overflow tombstone on the (cap+1)-th
    * distinct id instead of storing it. */
  private def add(b: BcsBuf, id: Long): Unit = {
    if (b.n > cap) return // overflowed: pinned
    if (id == Empty) {
      if (b.hasMin) return
      if (b.n == cap) b.n = cap + 1 // tombstone
      else { b.hasMin = true; b.n += 1 }
      return
    }
    var i = slot(id)
    while (b.table(i) != Empty) {
      if (b.table(i) == id) return
      i = (i + 1) & mask
    }
    if (b.n == cap) b.n = cap + 1 // tombstone; table untouched
    else { b.table(i) = id; b.n += 1 }
  }

  override def zero: BcsBuf = BcsBuf(Array.fill(capacity)(Empty), 0, false)

  override def reduce(b: BcsBuf, id: Long): BcsBuf = { add(b, id); b }

  override def merge(a: BcsBuf, b: BcsBuf): BcsBuf =
    if (a.n > cap) a
    else if (b.n > cap) b
    else {
      if (b.hasMin) add(a, Empty)
      var i = 0
      while (i < capacity && a.n <= cap) {
        val id = b.table(i)
        if (id != Empty) add(a, id)
        i += 1
      }
      a
    }

  override def finish(b: BcsBuf): Option[Seq[Long]] =
    if (b.n > cap) None
    else {
      val ids = b.table.filter(_ != Empty)
      Some((if (b.hasMin) Empty +: ids else ids).sorted.toSeq)
    }

  override def bufferEncoder: Encoder[BcsBuf] = ExpressionEncoder()

  override def outputEncoder: Encoder[Option[Seq[Long]]] = ExpressionEncoder()
}
