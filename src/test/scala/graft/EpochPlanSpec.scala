package graft

import org.apache.spark.sql.functions._

/** Pins corpus_epoch_plan: every cell matches a driver recompute from
  * raw per-source token counts, the capped epochs reproduce
  * corpus_mixture_plan's rate (least(1e6, epochs_micro) ≡ rate_micro —
  * the plan pair can never disagree on the budget arithmetic), the
  * pass/tail split reassembles the share exactly, and the > 4-epoch
  * repeat flag actually fires on the small corpus (where per-source
  * tokens sit far below the equal share). */
class EpochPlanSpec extends SparkSpec {

  test("epoch plan ≡ driver recompute; capped epochs ≡ mixture rate") {
    val perSrc = Tables.documents(spark, sf0001)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().groupBy(_.getString(0))
      .map { case (s, rows) => s -> ((rows.length.toLong, rows.map(_.getLong(1)).sum)) }
    val nSrc = perSrc.size.toLong
    val share = 10000L / nSrc
    val expect = perSrc.map { case (s, (nd, nt)) =>
      s -> ((nd, nt, share, share * 1000000L / nt, share / nt, share % nt,
             if (share * 1000000L / nt > 4000000L) 1 else 0))
    }

    val got = ext.TextOps.epochPlan(spark, sf0001).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getInt(7)))
    }.toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (s, e) => assert(got(s) === e, s"source $s diverged") }

    // pass/tail reassembly: full_passes * n_tokens + tail == share
    got.foreach { case (s, (_, nt, sh, _, fp, tail, _)) =>
      assert(fp * nt + tail === sh, s"source $s share does not reassemble")
    }

    // lockstep with the capped mixture plan: least(1e6, epochs) == rate
    val rates = ext.TextOps.mixturePlan(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    got.foreach { case (s, t) =>
      assert(math.min(1000000L, t._4) === rates(s),
        s"source $s: capped epochs != mixture rate")
    }

    // (the natural corpus never needs repetition — every source's
    // tokens exceed its share; the uncapped arithmetic, both flag
    // outcomes, and the > 1-epoch regime are driven on the crafted
    // fixture below)
  }

  test("over_repeat fires on a crafted tiny-source corpus (DriftSpec precedent)") {
    // the natural corpus repeats only ~2x (under the 4-epoch flag), so
    // the flag is driven on a fixture: one 10-token source against one
    // big source — share 5000 over 10 tokens = 500 epochs
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-epoch").toString
    val docs =
      (1 to 2).map(i => (i.toLong, "tiny", s"a b c d e")) ++
      (3 to 40).map(i => (i.toLong, "big",
        (1 to 200).map(j => s"tok$j").mkString(" ")))
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = ext.TextOps.epochPlan(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(4), r.getInt(7)))).toMap
    assert(got("tiny")._1 === 5000L * 1000000L / 10L)
    assert(got("tiny")._2 === 1, "tiny source must flag over_repeat")
    assert(got("big")._2 === 0, "big source must not flag")
  }
}
