package graft

import graft.functions.{BcsBuf, BoundedCollectSet}
import org.apache.spark.sql.functions._

/** Unit semantics of the bounded posting-list aggregator: distinct,
  * sorted output, hard overflow at cap (None), tombstone propagation
  * through merge, and an end-to-end groupBy that crosses a real shuffle
  * (so the BcsBuf product encoder round-trips). */
class BoundedCollectSetSpec extends SparkSpec {

  test("reduce collects distinct ids; finish sorts") {
    val agg = new BoundedCollectSet(8)
    val b = Seq(5L, 3L, 5L, 9L, 3L, 0L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b) === Some(Seq(0L, 3L, 5L, 9L)))
  }

  test("overflow pins at cap+1 and finishes as None") {
    val agg = new BoundedCollectSet(4)
    val b = (1L to 10L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b).isEmpty)
    // further inserts stay pinned
    assert(agg.finish(agg.reduce(b, 99L)).isEmpty)
  }

  test("exactly cap distinct ids is NOT overflow") {
    val agg = new BoundedCollectSet(4)
    val b = Seq(4L, 2L, 8L, 6L, 4L, 2L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b) === Some(Seq(2L, 4L, 6L, 8L)))
  }

  test("merge unions partials and propagates the tombstone") {
    val agg = new BoundedCollectSet(4)
    def buf(ids: Long*): BcsBuf = ids.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(buf(1, 2), buf(2, 3))) === Some(Seq(1L, 2L, 3L)))
    // union exceeds cap -> overflow even though each side fits
    assert(agg.finish(agg.merge(buf(1, 2, 3), buf(4, 5, 6))).isEmpty)
    // overflowed side wins regardless of order
    val over = buf(1L to 9L: _*)
    assert(agg.finish(agg.merge(over, buf(1))).isEmpty)
    assert(agg.finish(agg.merge(buf(1), over)).isEmpty)
  }

  test("Long.MinValue (the empty-slot sentinel) is collected, deduped and counted") {
    val agg = new BoundedCollectSet(4)
    val b = Seq(Long.MinValue, 5L, Long.MinValue, 3L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b) === Some(Seq(Long.MinValue, 3L, 5L)))
    // MinValue counts toward the cap like any other id
    val over = Seq(Long.MinValue, 1L, 2L, 3L, 4L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(over).isEmpty)
    // and survives merge from either side
    val l = agg.reduce(agg.zero, Long.MinValue)
    val r = agg.reduce(agg.zero, 9L)
    assert(agg.finish(agg.merge(l, r)) === Some(Seq(Long.MinValue, 9L)))
    assert(agg.finish(agg.merge(r, l)) === Some(Seq(Long.MinValue, 9L)))
  }

  test("groupBy across a shuffle: cap keeps rare keys, drops hot ones") {
    val spk = spark
    import spk.implicits._
    val df = (0 until 50).map(i => ("hot", i.toLong)) ++
      Seq(("rare", 7L), ("rare", 3L), ("rare", 7L))
    val bounded = udaf(new BoundedCollectSet(10),
                       org.apache.spark.sql.Encoders.scalaLong)
    val out = df.toDF("k", "id").repartition(8)
      .groupBy("k").agg(bounded($"id").as("ids"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out("hot").isEmpty, "hot key must overflow to null")
    assert(out("rare") === Some(Seq(3L, 7L)))
  }
}
