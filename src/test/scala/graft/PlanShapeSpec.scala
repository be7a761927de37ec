package graft

/** Physical-plan shape assertions for the 100 TB invariants — the plan
  * itself is the contract, not just the result (BASELINE.md "plan-quality
  * invariants", SURVEY §7.3 standing rules). */
class PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("parquet scans carry pushed filters and pruned schemas") {
    val p = planOf("src_parquet_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,45.0)]"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"), p)
  }

  test("dimension joins broadcast; fact side never moves") {
    for (q <- Seq("flagship", "join_broadcast_left", "join_match_rate")) {
      val p = planOf(q)
      assert(p.contains("BroadcastHashJoin"), s"$q plan:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q should not sort-merge:\n$p")
    }
  }

  test("semi/anti joins carry no broadcast hint on the unbounded fact side") {
    // orders is a fact table: a forced broadcast OOMs the driver at 100x.
    // The logical plan must be hint-free; AQE picks BHJ vs SMJ from stats.
    for (q <- Seq("semi_join", "anti_join")) {
      val analyzed = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.analyzed.toString
      assert(!analyzed.contains("ResolvedHint"),
             s"$q hints a broadcast of an unbounded side:\n$analyzed")
    }
  }

  test("band join executes as an equi-join on the bucket, never a nested loop") {
    val p = planOf("join_band_bucket")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
           s"band predicate fell back to a quadratic join:\n$p")
  }

  test("PII redaction is a pure zero-exchange projection") {
    val p = planOf("text_pii_redact")
    assert(!p.contains("Exchange"),
      s"a per-row rewrite must not shuffle:\n$p")
  }

  test("rolling stats shuffle once on event_type; band test stays in-plan") {
    val p = planOf("time_rolling_stats")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"rolling window should cost exactly one exchange:\n$p")
  }

  test("boilerplate strip broadcasts the group table; corpus never shuffles " +
       "for the join") {
    val p = planOf("text_boilerplate_strip")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"template-family join shuffled the corpus:\n$p")
  }

  test("global top-k lowers to TakeOrderedAndProject (no full sort)") {
    val p = planOf("sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("aggregations are partial+final HashAggregate pairs") {
    val p = planOf("q1_agg")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("partial_sum"), p)
  }

  test("contamination probes the eval set via broadcast, never a shuffle join") {
    // the queries() entry memoizes via localCheckpoint (plan = RDD scan);
    // assert on the underlying builder's plan instead
    val p = ext.TextOps.contaminationOf(spark, sf0001, "src0")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"eval membership probe shuffled:\n$p")
  }

  test("zorder key is computed in-plan with zero exchanges") {
    val p = planOf("scalar_zorder")
    assert(!p.contains("Exchange"), s"bit interleave should not shuffle:\n$p")
    assert(p.contains("*(1)"), s"projection left whole-stage codegen:\n$p")
  }

  test("sequence packing shuffles once, by the source shard key") {
    val p = planOf("text_pack")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1, p)
  }

  test("quality-model scorer is one shuffle, no vocabulary join") {
    val p = planOf("text_quality_model")
    assert(!p.contains("Join"), s"scorer must hash in-plan, not join a vocab:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
           s"expected exactly the groupBy(doc_id) exchange:\n$p")
    assert(p.contains("partial_"), s"map-side combine missing:\n$p")
  }

  test("funnel stage scans push the event_type filter to parquet") {
    val p = planOf("time_funnel")
    assert(p.contains("EqualTo(event_type,view)") &&
           p.contains("EqualTo(event_type,purchase)"),
           s"stage filters did not reach the scans:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bloom probe sits on the fact scan, dimension broadcasts") {
    val p = planOf("join_bloom_prune")
    assert(p.contains("bloom_might_contain"),
           s"explicit bloom probe missing from plan:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
           s"filtered dimension should broadcast:\n$p")
  }

  test("bm25 top-k avoids a global sort") {
    val p = planOf("text_bm25")
    assert(p.contains("TakeOrderedAndProject"),
           s"top-k fell back to a global sort:\n$p")
  }

  test("asof join is one windowed pass, never a range cross-product") {
    // the union+window rewrite is the whole point of the asof operator:
    // ONE shuffle on user_id, a single Window, and no join node at all.
    // If the rewrite ever drifts back to a join form it goes quadratic
    // per user at scale.
    val p = planOf("time_asof_join")
    assert(p.contains("Window"), s"asof lost its window form:\n$p")
    assert(!p.contains("Join") && !p.contains("CartesianProduct") &&
           !p.contains("NestedLoop"),
           s"asof re-introduced a join:\n$p")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).length >= 1, p)
  }

  test("ohlc reuses one (type, hour) exchange across both window passes and the agg") {
    // two row_number windows + the bar aggregation all key on
    // (event_type, hour): Catalyst must plan ONE shuffle, not three —
    // at 100 TB a second full-data exchange would double the cost
    val p = planOf("time_ohlc")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
           s"ohlc re-shuffled between window and agg:\n$p")
  }

  test("interval join shuffles on the equi-key, never a nested loop") {
    val p = planOf("time_interval_join")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
           s"interval join lost its equi-key:\n$p")
  }

  test("skipgram pair join rides the doc_id equi-key with the range as residual") {
    // the only tolerated nested-loop is the 1-row total-count broadcast;
    // the position-pair join itself must be a hash/merge join on doc_id
    // or the stage goes |tokens|² at scale
    val p = planOf("text_skipgram_pmi")
    assert(!p.contains("CartesianProduct"), s"skipgram cartesian:\n$p")
    assert(p.contains("Join condition: ((pos") ||
           p.contains("(pos"), s"range residual missing:\n$p")
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(nlj <= 1, s"skipgram has $nlj nested-loop joins (1-row t only):\n$p")
  }

  test("hist near-dup candidates come from the band equi-join, ArrayL1 in-plan") {
    val p = planOf("mm_hist_near_dup")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
           s"near-dup went quadratic:\n$p")
    assert(p.contains("array_l1"), s"ArrayL1 fell out of the plan:\n$p")
  }

  test("fuzzy dedup and referential audit never go quadratic") {
    for (q <- Seq("dedup_fuzzy", "audit_referential")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
             s"$q plan went quadratic:\n$p")
    }
  }

  test("bloom screen: split filters reach parquet, bit array broadcasts") {
    val p = planOf("dedup_bloom_screen")
    // n/2 split (50 at sf0.001) is pushed into both scans
    assert(p.contains("GreaterThanOrEqual(doc_id,"), p)
    assert(p.contains("LessThan(doc_id,"), p)
    // the ≤4096-row distinct bit frame joins by broadcast, never a shuffle
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ngram novelty: hashed-key shuffles only, no pair expansion") {
    val p = planOf("text_ngram_novelty")
    assert(p.contains("poly_hash_mod"), p)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"novelty must stay linear:\n$p")
  }

  test("ranked-IVF scan aggregates bounded top-k, never window-sorts") {
    // the round-14 invariant: the n×cells ranking must be the
    // TopKPairsAggregator partial aggregate (ObjectHashAggregate), not a
    // row_number window over all candidate rows (which exchange-and-sorts
    // n×cells and spills past the cell clamp — BASELINE r14). The
    // memoized ranked frames hide behind localCheckpoint scans, so pin
    // the one query that builds its ranked scan inline: upsert search.
    // Exactly two windows survive, both k-bounded by WindowGroupLimit:
    // the per-cell bucket cap (1024) and the per-probe top-3 re-rank —
    // a third would mean an n×cells ranking regressed to a window.
    val p = planOf("sim_ivf_upsert_search")
    assert(p.contains("ObjectHashAggregate"),
      s"upsert ranking lost the bounded top-k aggregate:\n$p")
    val windows = "Window \\[".r.findAllIn(p).size
    assert(windows <= 2,
      s"beyond the cap + rerank windows in the upsert plan ($windows):\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"surviving windows are not group-limit bounded:\n$p")
  }

  test("no query collects unbounded data to the driver") {
    // the one deliberate collect (semi_isin parity demo) is bounded by the
    // 25-row nation table; every other query builds a single lazy plan.
    // Spot-check the scale-sensitive paths stay fully lazy:
    // dedup_ngram_jaccard / minhash / clusters are deliberately eager now:
    // they localCheckpoint a shared candidate-pair frame (distributed
    // materialization to executor cache, not driver collection).
    // dedup_simhash joined the eager memo families in round 20 (the
    // "simhashfp" fingerprint frame dedup_simhash_pairs band-joins) and
    // was swapped here for the still-lazy dedup_exact.
    for (q <- Seq("dedup_exact", "sim_brute_topk", "window_topk_agg",
                  "q5_region_volume", "skew_salted_agg")) {
      // building the DataFrame must not trigger a Spark job
      val tracker = new org.apache.spark.scheduler.SparkListener {
        @volatile var jobs = List.empty[String]
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs ::= j.stageInfos.headOption.map(_.name).getOrElse("?")
      }
      spark.sparkContext.addSparkListener(tracker)
      try {
        SparkEntry.queries(q)(spark, sf0001) // plan only, no action
        Thread.sleep(200) // let any stray job-start events drain
        // parquet footer/schema-inference jobs are bounded metadata reads,
        // not data collection — everything else is a laziness violation
        val dataJobs = tracker.jobs.filterNot(_.startsWith("parquet at"))
        assert(dataJobs.isEmpty, s"$q ran data jobs during plan construction: $dataJobs")
      } finally spark.sparkContext.removeSparkListener(tracker)
    }
  }
}
