package graft

import org.apache.spark.sql.functions._

/** GraftSql.stripOrigin (round 19): `Dataset.localCheckpoint` carries
  * the pre-checkpoint plan's constraint set into the new LogicalRDD
  * leaf, and in an unbounded-round self-join loop (CC pointer jumping,
  * cluster propagation) the carried sets COMPOUND until the driver's
  * constraint propagation dominates the round wall (BASELINE round 19:
  * 768 k CC tail rounds doubling 1.5 → 44 s with flat task metrics).
  * The fix rewraps the checkpoint as a bare LogicalRDD. This spec pins
  * the mechanics the fix depends on:
  *   1. data and schema are untouched by the rewrap,
  *   2. the carried constraints are actually DROPPED (the load-bearing
  *      half — if a Spark upgrade stops the drop, the CC wall comes
  *      back with no functional failure to flag it),
  *   3. non-checkpoint plans pass through unchanged,
  *   4. a compounding loop keeps its constraint set flat when stripped.
  * Label-level loop correctness is separately oracle-pinned
  * (graph_components / dedup_clusters hash-match DuckDB's recursive
  * closure). */
class StripOriginSpec extends SparkSpec {
  import org.apache.spark.sql.GraftSql

  private def mk() = {
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
  }

  test("stripOrigin preserves rows, schema and partitioning of a checkpoint") {
    val ckpt = mk().filter(col("v") > 5L).localCheckpoint()
    val stripped = GraftSql.stripOrigin(ckpt)
    assert(stripped.schema == ckpt.schema)
    assert(stripped.collect().toSet == ckpt.collect().toSet)
    assert(stripped.rdd.getNumPartitions == ckpt.rdd.getNumPartitions)
  }

  test("stripOrigin drops the checkpoint-carried constraint set") {
    // the filter predicate becomes an origin constraint on the
    // checkpoint leaf; after the rewrap the leaf must carry none
    val ckpt = mk().filter(col("v") > 5L).localCheckpoint()
    val carried = ckpt.queryExecution.analyzed.constraints
    assert(carried.nonEmpty,
      "expected localCheckpoint to carry origin constraints — if Spark " +
      "stopped carrying them, stripOrigin is obsolete (and harmless)")
    val stripped = GraftSql.stripOrigin(ckpt)
    assert(stripped.queryExecution.analyzed.constraints.isEmpty,
      "stripOrigin must drop the carried constraint set — the CC-loop " +
      "round wall compounds on it (BASELINE round 19)")
  }

  test("stripOrigin is a passthrough on non-checkpoint plans") {
    val plain = mk().filter(col("v") > 5L)
    assert(GraftSql.stripOrigin(plain) eq plain)
  }

  test("a self-join loop keeps a flat constraint set when stripped") {
    // the CC loop shape in miniature: each round self-joins the prior
    // round's checkpoint; unstripped, the carried set grows with round
    // depth — stripped, every round's leaf starts clean
    var cur = mk().filter(col("v") > 5L).localCheckpoint()
    var sizes = List.empty[Int]
    for (_ <- 1 to 4) {
      val self = cur.select(col("id").as("id2"), col("v").as("v2"))
      val next = cur.join(self, col("id") === col("id2"))
        .select(col("id"), least(col("v"), col("v2")).as("v"))
        .filter(col("v") > 5L)
      cur = GraftSql.stripOrigin(next.localCheckpoint())
      sizes ::= cur.queryExecution.analyzed.constraints.size
    }
    assert(sizes.forall(_ == 0),
      s"stripped loop rounds must carry zero constraints, got $sizes")
    assert(cur.collect().length == 3)
  }
}
