package graft

import org.apache.spark.sql.DataFrame

/** Physical/logical plan-shape gates for the most expensive declared
  * queries (VERDICT r1 #9): pushdown, pruning, join strategy and hint
  * regressions fail here instead of only surfacing in the bench. */
class PlanSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"
  def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  private def executed(df: DataFrame) = df.queryExecution.executedPlan.toString
  private def analyzed(df: DataFrame) = df.queryExecution.analyzed.toString

  test("filter_eq_type pushes its predicate into the parquet scan") {
    val plan = executed(q("filter_eq_type"))
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(event_type,purchase)"),
      s"expected pushed EqualTo filter:\n$plan")
  }

  test("filter_field_present prunes to exactly (event_id, props) and sorts once") {
    val df = q("filter_field_present")
    val plan = executed(df)
    val readSchema = "ReadSchema: struct<event_id:bigint,props:string>"
    assert(plan.contains(readSchema), s"expected pruned scan $readSchema in:\n$plan")
    // one range shuffle for the total order, no stray hash shuffles
    assert(plan.contains("rangepartitioning"), s"missing sort exchange:\n$plan")
    assert(!plan.contains("hashpartitioning"), s"unexpected extra shuffle:\n$plan")
  }

  test("join_latest_dim carries no broadcast hint (AQE must choose)") {
    val df = q("join_latest_dim")
    assert(!analyzed(df).contains("ResolvedHint"),
      "the latest-per-key dim is unbounded; a forced broadcast hint OOMs at scale")
    val plan = executed(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"latest-dim join must stay an equi-join:\n$plan")
  }

  test("dedup candidate joins are equi-joins, never all-pairs") {
    for (name <- Seq("dedup_ngram_jaccard", "dedup_near_minhash", "dedup_simhash",
                     "dedup_containment")) {
      val plan = executed(q(name))
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$name grew an all-pairs join:\n$plan")
    }
  }

  test("dedup_embedding_cosine broadcasts only the bounded block-pair table") {
    val plan = executed(q("dedup_embedding_cosine"))
    assert(!plan.contains("CartesianProduct"), s"cartesian in block join:\n$plan")
    // exactly one nested-loop: the 36-row (bi<=bj) block-pair fanout; the
    // corpus sides must meet in equi-joins
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(nlj == 1, s"expected exactly the block-pair fanout NLJ, got $nlj:\n$plan")
  }

  test("join_broadcast_dim keeps its (genuinely small) broadcast dim") {
    assert(analyzed(q("join_broadcast_dim")).contains("ResolvedHint"),
      "supplier dim is bounded-small and should stay hint-broadcast")
  }

  test("sample_hash_split stays map-side: only the output sort shuffles") {
    val plan = executed(q("sample_hash_split"))
    assert(plan.contains("rangepartitioning"), s"missing sort exchange:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"hash split must not shuffle — assignment is per-row arithmetic:\n$plan")
  }

  test("join_timeseries_align_multi is one aggregation pass: no join, one hash shuffle") {
    val plan = executed(q("join_timeseries_align_multi"))
    assert(!plan.contains("Join"),
      s"multi-metric alignment must be conditional aggregation, not an N-way self-join:\n$plan")
    val hashEx = "hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected exactly the one groupBy(hour) shuffle, got $hashEx:\n$plan")
  }

  test("join_range_tier broadcasts the tier table and never shuffles the fact side") {
    val plan = executed(q("join_range_tier"))
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(nlj == 1, s"range join should be one broadcast NLJ over the 3-row tier table:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"the fact side must stream through the range join unshuffled:\n$plan")
  }

  test("join_interval_bucket stays an equi-join: banding defeats the interval cross join") {
    val plan = executed(q("join_interval_bucket"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"banded interval join must co-locate via (user, bucket) equi-join:\n$plan")
  }

  test("pivot with explicit values stays a join-free two-stage aggregation") {
    val plan = executed(q("agg_pivot_type_hour"))
    assert(!plan.contains("Join"), s"pivot must not become a self-join:\n$plan")
    // Spark pivots via pre-agg on (group, pivot) then pivotfirst on group:
    // exactly two key shuffles, both partial-aggregated. (The one-shuffle
    // form of the same output is join_timeseries_align_multi.)
    val hashEx = "hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 2, s"expected pivot's two agg shuffles, got $hashEx:\n$plan")
  }

  test("sort_by_time range-sorts on native (ts, event_id), not the rendered string") {
    val plan = executed(q("sort_by_time"))
    // the range exchange must compare int64 ts, with date_format applied
    // ABOVE the sort — a 26-char string comparator in the range partitioner
    // is the wrong plan to carry to a cluster (VERDICT r3 #2)
    val range = "rangepartitioning\\(([^)]*)".r.findFirstMatchIn(plan).map(_.group(1))
    assert(range.exists(keys => keys.contains("ts") && !keys.contains("date_format")),
      s"expected native sort keys in range exchange:\n$plan")
    assert(plan.contains("TakeOrderedAndProject") || plan.contains("Sort"),
      s"missing sort:\n$plan")
  }

  test("limit_head is TakeOrderedAndProject on native keys (no global sort)") {
    val plan = executed(q("limit_head"))
    assert(plan.contains("TakeOrderedAndProject"),
      s"orderBy+limit(1) should collapse to TakeOrderedAndProject:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"limit(1) must not materialize a global range sort:\n$plan")
  }

  test("agg_quantiles_banded probes target bands via broadcast, never all-pairs") {
    val plan = executed(q("agg_quantiles_banded"))
    assert(!plan.contains("CartesianProduct"), s"cartesian in band probe:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"the tiny target-band table must broadcast onto the events:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"probing must not shuffle the fact side into a join:\n$plan")
  }

  test("dedup_incremental joins are all equi-joins (store probe, never all-pairs)") {
    val plan = executed(q("dedup_incremental"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"incremental dedup grew an all-pairs join:\n$plan")
  }

  test("events_funnel_stages is one user-key shuffle: stacked windows, no self-join") {
    val plan = executed(q("events_funnel_stages"))
    assert(!plan.contains("Join"),
      s"funnel must be stacked windows over one partitioning, not a self-join:\n$plan")
    val hashEx = "hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected exactly one user_id shuffle, got $hashEx:\n$plan")
  }

  test("multimodal_blockhash candidates come from the chunk equi-join, never all-pairs") {
    val plan = executed(q("multimodal_blockhash"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"blockhash grew an all-pairs join:\n$plan")
  }

  test("corpus_prep_pipeline and multiprobe search never go all-pairs") {
    for (name <- Seq("corpus_prep_pipeline", "sim_search_lsh_multiprobe")) {
      val plan = executed(q(name))
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$name grew an all-pairs join:\n$plan")
    }
  }

  test("text_decontaminate broadcasts the benchmark gram set") {
    val plan = executed(q("text_decontaminate"))
    // the benchmark side is the small one by construction — the train
    // corpus must stream through a broadcast probe, not shuffle on gram
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark grams should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"decontamination grew an all-pairs join:\n$plan")
  }

  test("snapshot_diff reconciles via one full-outer equi-join, no all-pairs") {
    val plan = executed(q("snapshot_diff"))
    assert(plan.contains("FullOuter"), s"expected a full-outer join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"snapshot reconcile grew an all-pairs join:\n$plan")
  }

  test("window_percent_rank shares one window shuffle for both rank functions") {
    val plan = executed(q("window_percent_rank"))
    val hashEx = "hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1,
      s"pct_rank and cume_dist share a spec — expected one class-key shuffle, got $hashEx:\n$plan")
  }

  test("text_repetition_ratio is two partial-agg shuffles, no joins") {
    val plan = executed(q("text_repetition_ratio"))
    assert(!plan.contains("Join"), s"repetition ratio must not self-join:\n$plan")
    val hashEx = "hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 2,
      s"expected (doc,bigram) then doc shuffles, got $hashEx:\n$plan")
  }

  test("window_minmax_scale computes both extrema in one Window node") {
    val plan = executed(q("window_minmax_scale"))
    val windows = "Window ".r.findAllIn(plan).length
    assert(windows == 1,
      s"min and max share one unordered spec — expected 1 Window node, got $windows:\n$plan")
    val hashEx = "hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected only the class-key window shuffle, got $hashEx:\n$plan")
  }

  test("clean_winsorize clips via a broadcast of the tiny per-class bounds") {
    val plan = executed(q("clean_winsorize"))
    assert(plan.contains("BroadcastHashJoin"),
      s"the bounds join-back must broadcast (fact side stays unshuffled):\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"winsorize must not shuffle the fact table for the bounds join:\n$plan")
  }

  test("join_bloom_prefilter checks the bitmap in a map-side Filter below the join") {
    val plan = executed(q("join_bloom_prefilter"))
    // the 8 KB word table rides as an array literal probed with element_at;
    // it must sit in a Filter on the fact scan, not above the join
    val filterIdx = plan.indexOf("element_at")
    val joinIdx = plan.indexOf("Join")
    assert(filterIdx >= 0, s"bloom bitmap check missing from plan:\n$plan")
    assert(joinIdx >= 0 && joinIdx < filterIdx,
      s"bloom filter must evaluate below (after, in plan print order) the join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"bloom join went all-pairs:\n$plan")
  }

  test("emb_quantize_int8 shares one vec_id shuffle between window and final agg") {
    val plan = executed(q("emb_quantize_int8"))
    val hashEx = "hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1,
      s"window max and groupBy share the vec_id partitioning — expected 1, got $hashEx:\n$plan")
  }

  test("join_star_rollup streams the fact side through three broadcast hops") {
    val plan = executed(q("join_star_rollup"))
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(bhj == 3, s"expected customer/nation/region broadcast hops, got $bhj:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the fact side must not shuffle before the rollup:\n$plan")
    val hashEx = "hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected only the rollup agg shuffle, got $hashEx:\n$plan")
  }

  test("stat_seasonal_residual broadcasts the calendar baseline back") {
    val plan = executed(q("stat_seasonal_residual"))
    assert(plan.contains("BroadcastHashJoin"),
      s"the ≤classes×168-row baseline must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the hourly frame must not re-shuffle for the baseline join:\n$plan")
  }

  test("emb_pq_codes broadcasts the codebook, never all-pairs") {
    val plan = executed(q("emb_pq_codes"))
    assert(plan.contains("BroadcastHashJoin"),
      s"the nCents·dim codebook must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"PQ assignment went all-pairs:\n$plan")
  }

  test("sim_search_pq_adc scores via the broadcast distance tables, never all-pairs") {
    val plan = executed(q("sim_search_pq_adc"))
    assert(plan.contains("BroadcastHashJoin"),
      s"the nQueries×nSub×nCents distance tables must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"ADC scoring went all-pairs:\n$plan")
  }

  test("events_path_topk: one user window + one path agg, rank on the bounded |types|^3 frame") {
    val plan = executed(q("events_path_topk"))
    val hashEx = "hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 2,
      s"expected the user-window and path-agg shuffles only, got $hashEx:\n$plan")
    assert(!plan.contains("Join"), s"path mining must not self-join:\n$plan")
  }

  test("layout_zorder_skipping broadcasts only the 1-row bounds agg") {
    val plan = executed(q("layout_zorder_skipping"))
    // one bounds crossJoin per union branch (each layout re-derives base)
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(nlj == 2,
      s"expected the 1-row bounds broadcast crossJoin in each branch, got $nlj:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"bounds join went cartesian:\n$plan")
  }
}
