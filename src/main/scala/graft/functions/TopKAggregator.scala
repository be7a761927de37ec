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

/** [[TopKAggregator]] variant that keeps the sort keys: OUT = the
  * (sortKey, id) pairs of the k LARGEST sortKeys in rank order, ties to
  * the smaller id — exactly `row_number() over (partition by group
  * order by key desc, id asc) <= k`, as a bounded PARTIAL aggregate.
  *
  * This is the ranked-IVF-assignment reducer: the window form of the
  * n×cells scan exchanges-and-SORTS every (vec, cell, csim) row — at
  * 150 k vectors × the 4096-cell clamp that is a 600 M-row sort whose
  * per-partition runs outgrow execution memory and spill multi-pass
  * (measured: 2× data → 9× task CPU, 19 GB spill, round-14 BASELINE).
  * The aggregate keeps k pairs per vector per partition, combines
  * map-side, and ships n·k rows — O(n·cells) compare work, zero sort,
  * spill-free at any corpus scale; growth past the clamp is linear in
  * n, which is the whole point of clamping the cell count.
  *
  * SESSION KNOB: object aggregation falls back to SORT-based past
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` distinct
  * keys per partition (default 128 — sized for huge opaque sketch
  * buffers, not this ≤k-tuple one). With the default, the ranked-IVF
  * partial agg silently re-pays the window's sort (measured: sf6 assign
  * 97 s window ≈ 76 s sort-fallback agg vs hash agg — round-14
  * BASELINE); Bench/Verify/SparkSpec sessions raise it to 4 M. Results
  * are IDENTICAL either way — the knob is purely the hash-vs-sort
  * execution strategy.
  *
  * Float discipline: the SORT KEY is normalized `v + 0.0` so a rounded
  * −0.0 orders identically to Spark SQL's window sort (the
  * NormalizeFloatingNumbers rule treats −0.0 = +0.0 in sort keys; raw
  * `Ordering[Double]` would put −0.0 first and could flip a tie) — but
  * the STORED value stays raw, exactly as the window projected it, so
  * a −0.0 csim still reaches downstream rounding untouched. */
class TopKPairsAggregator(k: Int)
    extends Aggregator[(Double, Long), mutable.ArrayBuffer[(Double, Long)],
                       Seq[(Double, Long)]] {

  // sort-key view: (key desc, id asc) with −0.0 ≡ +0.0 on the key.
  // NaN class first: Spark SQL's `ORDER BY key DESC` ranks NaN above
  // +Infinity (NaN is greatest in SQL float ordering, and all NaNs
  // compare equal — ties fall to id asc), while a naive negated Double
  // key would send NaN LAST under Scala's TotalOrdering (−NaN = NaN =
  // greatest ascending). A zero-norm embedding yields csim = 0/0 = NaN,
  // so the class must reproduce the window's NaN placement, not just
  // the finite one (ADVICE r14).
  private def rankKey(p: (Double, Long)): (Int, Double, Long) =
    if (p._1.isNaN) (0, 0.0, p._2) else (1, -(p._1 + 0.0), p._2)

  private def prune(b: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    if (b.length > k) {
      val sorted = b.sortBy(rankKey)
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
    if (b.length > 4 * k) prune(b) else b
  }

  override def merge(a: mutable.ArrayBuffer[(Double, Long)],
                     b: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] =
    prune(a ++= b)

  override def finish(b: mutable.ArrayBuffer[(Double, Long)]): Seq[(Double, Long)] =
    b.sortBy(rankKey).take(k).toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[(Double, Long)]] =
    Encoders.kryo[mutable.ArrayBuffer[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
