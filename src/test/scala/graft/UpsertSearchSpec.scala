package graft

import org.apache.spark.sql.functions._

/** Upsert-lifecycle serving (Similarity.ivfUpsertSearch): delete +
  * arrival over a frozen base-trained quantizer must behave as a
  * from-scratch rebuild over the live membership (the oracle proves
  * that hash-exactly); this spec pins the structural guarantees the
  * rebuild equality implies — no deleted id anywhere in any result,
  * arrivals actually served — and ties the probe universe to the live
  * rule. */
class UpsertSearchSpec extends SparkSpec {

  private lazy val rows =
    ext.Similarity.queries("sim_ivf_upsert_search")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))

  private lazy val split: Long =
    Tables.embeddings(spark, sf0001).count() / 2

  private def deleted(id: Long): Boolean = id < split && id % 10 == 0

  test("no deleted id appears on either side of any result") {
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, _, _) =>
      assert(!deleted(a), s"deleted probe $a served")
      assert(!deleted(b), s"deleted member $b returned as a neighbor")
    }
  }

  test("arrivals are served into the index (some neighbor >= split)") {
    // the arrival batch joined the live index without retraining — if
    // no arrival ever surfaced as a neighbor the add half would be
    // vacuous at this fixture scale (arrivals are half the live set)
    assert(rows.exists { case (_, b, _, _) => b >= split },
      s"no neighbor from the arrival batch (vec_id >= $split) — " +
        "the upsert's add half never reached serving")
  }

  test("probe universe is the fixed eval sample ∩ live") {
    val probeIds = rows.map(_._1).toSet
    probeIds.foreach { a =>
      assert(a < 100L, s"probe $a outside the fixed eval sample")
    }
    // per-probe top-3: at most 3 rows per probe, ranks 1..3 compact
    rows.groupBy(_._1).foreach { case (a, rs) =>
      val ranks = rs.map(_._4).sorted.toList
      assert(ranks === (1 to ranks.size).toList,
        s"probe $a ranks not compact: $ranks")
      assert(ranks.size <= 3)
    }
  }
}
