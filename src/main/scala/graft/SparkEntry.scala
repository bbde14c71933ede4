package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._
import graft.Tables._
import graft.Det._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is a declared operator from SURVEY.md §2,
  * implemented as a pure DataFrame plan in graft.ops.* / graft.ext.*;
  * [[oracleSql]] carries the DuckDB-equivalent SQL the driver hash-compares
  * against on /root/testdata/sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: revenue per nation —
    * fact ⋈ broadcast(dim) ⋈ broadcast(dim) with exact-decimal revenue sum. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    lineitem(spark, d)
      .join(broadcast(supplier(spark, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(spark, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // §2.1 scans
    "scan_parquet"      -> ((s, d) => Scans.scanParquet(lineitem(s, d))),
    "scan_csv_typed"    -> ((s, d) => Scalars.scanCsvTyped(events(s, d))),
    "scan_jsonl_typed"  -> ((s, d) => Scalars.scanJsonlTyped(events(s, d))),
    // §2.2 scalar expressions
    "project_columns"       -> ((s, d) => Scalars.projectColumns(customer(s, d))),
    "unit_convert_f_to_c"   -> ((s, d) => Scalars.unitConvertFtoC(events(s, d))),
    "round_metrics"         -> ((s, d) => Scalars.roundMetrics(lineitem(s, d))),
    "parse_timestamp"       -> ((s, d) => Scalars.parseTimestamp(events(s, d))),
    "tz_utc_to_pacific"     -> ((s, d) => Scalars.tzUtcToPacific(events(s, d))),
    "format_timestamp"      -> ((s, d) => Scalars.formatTimestamp(events(s, d))),
    "epoch_to_timestamp"    -> ((s, d) => Scalars.epochToTimestamp(events(s, d))),
    "strip_tz_suffix"       -> ((s, d) => Scalars.stripTzSuffix(events(s, d))),
    "split_csv_text"        -> ((s, d) => Scalars.splitCsvText(lineitem(s, d))),
    "json_extract_fields"   -> ((s, d) => Scalars.jsonExtractFields(events(s, d))),
    "null_coalesce_defaults"-> ((s, d) => Scalars.nullCoalesceDefaults(events(s, d))),
    "try_cast_numeric"      -> ((s, d) => Scalars.tryCastNumeric(events(s, d))),
    "conditional_route_tag" -> ((s, d) => Scalars.conditionalRouteTag(events(s, d))),
    "string_concat_label"   -> ((s, d) => Scalars.stringConcatLabel(events(s, d))),
    // §2.3 filters
    "filter_eq_type"        -> ((s, d) => Filters.filterEqType(events(s, d))),
    "filter_by_node"        -> ((s, d) => Filters.filterByNode(events(s, d))),
    "filter_field_present"  -> ((s, d) => Filters.filterFieldPresent(events(s, d))),
    "drop_null_rows"        -> ((s, d) => Filters.dropNullRows(events(s, d))),
    "filter_time_threshold" -> ((s, d) => Filters.filterTimeThreshold(events(s, d))),
    "filter_range_clip"     -> ((s, d) => Filters.filterRangeClip(events(s, d))),
    // §2.4 joins
    "join_broadcast_dim"    -> ((s, d) => Joins.joinBroadcastDim(lineitem(s, d), supplier(s, d))),
    "join_latest_dim"       -> ((s, d) => Joins.joinLatestDim(events(s, d))),
    "join_timeseries_align" -> ((s, d) => Joins.joinTimeseriesAlign(events(s, d))),
    "join_timeseries_align_multi" -> ((s, d) => Joins.joinTimeseriesAlignMulti(events(s, d))),
    "join_asof_nearest"     -> ((s, d) => Joins.joinAsofNearest(events(s, d))),
    "join_asof_tolerance"   -> ((s, d) => Joins.joinAsofTolerance(events(s, d))),
    "join_asof_forward"     -> ((s, d) => Joins.joinAsofForward(events(s, d))),
    "join_range_tier"       -> ((s, d) => Joins.joinRangeTier(events(s, d))),
    "join_interval_bucket"  -> ((s, d) => Joins.joinIntervalBucket(events(s, d))),
    "ts_fill_gaps"          -> ((s, d) => Joins.tsFillGaps(events(s, d))),
    "ts_resample_linear"    -> ((s, d) => Joins.tsResampleLinear(events(s, d))),
    // salted form of J1: bit-identical output, skew spread over (key, salt)
    "join_salted_skew"      -> ((s, d) =>
      ops.Skew.saltedJoin(lineitem(s, d),
          supplier(s, d).select(col("s_suppkey").as("l_suppkey"), col("s_name")), "l_suppkey")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"), col("s_name"))
        .orderBy("l_orderkey", "l_linenumber", "l_suppkey")),
    "join_semi_active_nodes"  -> ((s, d) => Joins.joinSemiActiveNodes(customer(s, d), orders(s, d))),
    "join_anti_unknown_nodes" -> ((s, d) => Joins.joinAntiUnknownNodes(customer(s, d), orders(s, d))),
    "snapshot_diff"         -> ((s, d) => Joins.snapshotDiff(events(s, d))),
    "join_bloom_prefilter"  -> ((s, d) => Joins.joinBloomPrefilter(orders(s, d), customer(s, d))),
    "join_star_rollup"      -> ((s, d) =>
      Joins.joinStarRollup(orders(s, d), customer(s, d), nation(s, d), region(s, d))),
    // classic warehouse suite (TPC-H shapes) over the same fixtures
    "tpch_pricing_summary"  -> ((s, d) => Tpch.tpchPricingSummary(lineitem(s, d))),
    "tpch_shipping_priority"-> ((s, d) =>
      Tpch.tpchShippingPriority(lineitem(s, d), orders(s, d), customer(s, d))),
    "tpch_local_supplier_volume" -> ((s, d) =>
      Tpch.tpchLocalSupplierVolume(lineitem(s, d), orders(s, d), customer(s, d),
        supplier(s, d), nation(s, d), region(s, d))),
    "tpch_revenue_forecast" -> ((s, d) => Tpch.tpchRevenueForecast(lineitem(s, d))),
    "tpch_promo_revenue"    -> ((s, d) => Tpch.tpchPromoRevenue(lineitem(s, d), part(s, d))),
    "tpch_late_shipment_priority" -> ((s, d) =>
      Tpch.tpchLateShipmentPriority(orders(s, d), lineitem(s, d))),
    "tpch_returned_revenue" -> ((s, d) =>
      Tpch.tpchReturnedRevenue(lineitem(s, d), orders(s, d), customer(s, d))),
    "tpch_nation_trade_volume" -> ((s, d) =>
      Tpch.tpchNationTradeVolume(lineitem(s, d), orders(s, d), customer(s, d),
        supplier(s, d), nation(s, d))),
    "tpch_market_share"     -> ((s, d) =>
      Tpch.tpchMarketShare(lineitem(s, d), orders(s, d), customer(s, d),
        supplier(s, d), part(s, d), nation(s, d), region(s, d))),
    "tpch_customer_distribution" -> ((s, d) =>
      Tpch.tpchCustomerDistribution(customer(s, d), orders(s, d))),
    "tpch_top_supplier"     -> ((s, d) =>
      Tpch.tpchTopSupplier(lineitem(s, d), supplier(s, d))),
    "tpch_small_qty_revenue"-> ((s, d) =>
      Tpch.tpchSmallQtyRevenue(lineitem(s, d), part(s, d))),
    "tpch_big_order_customers" -> ((s, d) =>
      Tpch.tpchBigOrderCustomers(lineitem(s, d), orders(s, d), customer(s, d))),
    "tpch_bracket_revenue"  -> ((s, d) =>
      Tpch.tpchBracketRevenue(lineitem(s, d), part(s, d))),
    "tpch_idle_customer_balance" -> ((s, d) =>
      Tpch.tpchIdleCustomerBalance(customer(s, d), orders(s, d), nation(s, d))),
    "tpch_part_value_concentration" -> ((s, d) =>
      Tpch.tpchPartValueConcentration(lineitem(s, d))),
    "tpch_min_cost_supplier" -> ((s, d) =>
      Tpch.tpchMinCostSupplier(lineitem(s, d), part(s, d), supplier(s, d),
        nation(s, d), region(s, d))),
    "tpch_product_profit"   -> ((s, d) =>
      Tpch.tpchProductProfit(lineitem(s, d), part(s, d), supplier(s, d),
        orders(s, d), nation(s, d))),
    "tpch_ship_latency_priority" -> ((s, d) =>
      Tpch.tpchShipLatencyPriority(lineitem(s, d), orders(s, d))),
    "tpch_supplier_part_counts" -> ((s, d) =>
      Tpch.tpchSupplierPartCounts(lineitem(s, d), part(s, d), supplier(s, d))),
    "tpch_dominant_part_supplier" -> ((s, d) =>
      Tpch.tpchDominantPartSupplier(lineitem(s, d), part(s, d), supplier(s, d),
        nation(s, d), region(s, d))),
    "tpch_waiting_suppliers" -> ((s, d) =>
      Tpch.tpchWaitingSuppliers(lineitem(s, d), orders(s, d), supplier(s, d),
        nation(s, d))),
    "agg_distinct_intersect_kmv" -> ((s, d) => Aggs.aggDistinctIntersectKmv(events(s, d))),
    "agg_distinct_union_kmv" -> ((s, d) => Aggs.aggDistinctUnionKmv(events(s, d))),
    "stat_chi_square"       -> ((s, d) => Aggs.statChiSquare(events(s, d))),
    "stat_gini_revenue"     -> ((s, d) => Aggs.statGiniRevenue(orders(s, d))),
    "ts_interval_union"     -> ((s, d) => Joins.tsIntervalUnion(events(s, d))),
    "graph_triangles"       -> ((s, d) => ext.Sessions.graphTriangles(events(s, d))),
    "graph_link_jaccard"    -> ((s, d) => ext.Sessions.graphLinkJaccard(events(s, d))),
    "stat_ks_drift"         -> ((s, d) => Aggs.statKsDrift(events(s, d))),
    "stat_mann_kendall"     -> ((s, d) => Aggs.statMannKendall(events(s, d))),
    "agg_rolling_distinct"  -> ((s, d) => Aggs.aggRollingDistinct(events(s, d))),
    "union_schema_evolve"   -> ((s, d) => SetSort.unionSchemaEvolve(events(s, d))),
    "window_position_profile" -> ((s, d) =>
      Windows.windowPositionProfile(events(s, d))),
    "text_rules_filter"     -> ((s, d) => ext.Text.textRulesFilter(documents(s, d))),
    "agg_distinct_kmv_native" -> ((s, d) => Aggs.aggDistinctKmvNative(events(s, d))),
    "stat_tukey_outliers"   -> ((s, d) => Aggs.statTukeyOutliers(events(s, d))),
    "text_hashed_features"  -> ((s, d) => ext.Text.textHashedFeatures(documents(s, d))),
    "text_readability"      -> ((s, d) => ext.Text.textReadability(documents(s, d))),
    "corpus_temperature_mix" -> ((s, d) =>
      ext.CorpusPrep.corpusTemperatureMix(documents(s, d))),
    "events_attribution_linear" -> ((s, d) =>
      ext.Sessions.eventsAttributionLinear(events(s, d))),
    "multimodal_keyframe_select" -> ((s, d) =>
      ext.Multimodal.multimodalKeyframeSelect(documents(s, d))),
    "agg_distinct_diff_kmv" -> ((s, d) => Aggs.aggDistinctDiffKmv(events(s, d))),
    "stat_theil_sen"        -> ((s, d) => Aggs.statTheilSen(events(s, d))),
    "stat_holt_forecast"    -> ((s, d) => Aggs.statHoltForecast(events(s, d))),
    "join_interval_overlap" -> ((s, d) =>
      ext.Sessions.joinIntervalOverlap(events(s, d))),
    "ml_lag_features"       -> ((s, d) => Windows.mlLagFeatures(events(s, d))),
    "stat_changepoint_cusum" -> ((s, d) => Aggs.statChangepointCusum(events(s, d))),
    "stat_trimmed_mean"     -> ((s, d) => Aggs.statTrimmedMean(events(s, d))),
    "stat_moments_per_type" -> ((s, d) => Aggs.statMomentsPerType(events(s, d))),
    "stat_runs_test"        -> ((s, d) => Aggs.statRunsTest(events(s, d))),
    "stat_brown_forsythe"   -> ((s, d) => Aggs.statBrownForsythe(events(s, d))),
    "stat_anova_f"          -> ((s, d) => Aggs.statAnovaF(events(s, d))),
    "stat_holt_winters"     -> ((s, d) => Aggs.statHoltWinters(events(s, d))),
    "agg_quantiles_sketch"  -> ((s, d) => Aggs.aggQuantilesSketch(events(s, d))),
    "stat_welch_t"          -> ((s, d) => Aggs.statWelchT(events(s, d))),
    "stat_cramers_v"        -> ((s, d) => Aggs.statCramersV(events(s, d))),
    "stat_poisson_dispersion" -> ((s, d) => Aggs.statPoissonDispersion(events(s, d))),
    "dedup_cross_source"    -> ((s, d) => ext.Dedup.dedupCrossSource(documents(s, d))),
    "graph_degree_assortativity" -> ((s, d) =>
      ext.Sessions.graphDegreeAssortativity(events(s, d))),
    "window_rolling_median" -> ((s, d) => Windows.windowRollingMedian(events(s, d))),
    "window_peak_detect"    -> ((s, d) => Windows.windowPeakDetect(events(s, d))),
    "corpus_quality_report" -> ((s, d) => ext.CorpusPrep.corpusQualityReport(documents(s, d))),
    "corpus_length_histogram" -> ((s, d) => ext.CorpusPrep.corpusLengthHistogram(documents(s, d))),
    "window_hampel"         -> ((s, d) => Windows.windowHampel(events(s, d))),
    "window_drawdown"       -> ((s, d) => Windows.windowDrawdown(events(s, d))),
    "events_regularity_score" -> ((s, d) => ext.Sessions.eventsRegularityScore(events(s, d))),
    "events_interarrival_histogram" -> ((s, d) => ext.Sessions.eventsInterarrivalHistogram(events(s, d))),
    "events_pareto_deciles" -> ((s, d) => ext.Sessions.eventsParetoDeciles(events(s, d))),
    "graph_kcore"           -> ((s, d) => ext.Sessions.graphKcore(events(s, d))),
    "sample_topk_hash"      -> ((s, d) => ext.Sampling.sampleTopkHash(documents(s, d))),
    "text_ngram_novelty"    -> ((s, d) => ext.Text.textNgramNovelty(documents(s, d))),
    "events_burst_users"    -> ((s, d) => ext.Sessions.eventsBurstUsers(events(s, d))),
    "dedup_normalized"      -> ((s, d) => ext.Dedup.dedupNormalized(documents(s, d))),
    "stat_benford"          -> ((s, d) => Aggs.statBenford(lineitem(s, d))),
    "snapshot_upsert"       -> ((s, d) => Joins.snapshotUpsert(events(s, d))),
    "ts_downsample_ltob"    -> ((s, d) => Joins.tsDownsampleLtob(events(s, d))),
    "ts_downsample_lttb"    -> ((s, d) => Joins.tsDownsampleLttb(events(s, d))),
    "ts_kalman_filter"      -> ((s, d) => Joins.tsKalmanFilter(events(s, d))),
    "emb_binarize_sign"     -> ((s, d) => ext.Similarity.embBinarizeSign(embeddings(s, d))),
    "sim_search_hamming_topk" -> ((s, d) =>
      ext.Similarity.simSearchHammingTopk(embeddings(s, d))),
    "multimodal_audio_fingerprint" -> ((s, d) =>
      ext.Multimodal.multimodalAudioFingerprint(documents(s, d))),
    "layout_zorder_skipping"-> ((s, d) => sources.Layout.zorderSkipping(events(s, d))),
    // §2.5 aggregations
    "agg_last_seen_per_node"-> ((s, d) => Aggs.aggLastSeenPerNode(events(s, d))),
    "agg_metrics_summary"   -> ((s, d) => Aggs.aggMetricsSummary(events(s, d))),
    "agg_count_by_type"     -> ((s, d) => Aggs.aggCountByType(events(s, d))),
    "agg_distinct_nodes"    -> ((s, d) => Aggs.aggDistinctNodes(events(s, d))),
    "agg_distinct_approx"   -> ((s, d) => Aggs.aggDistinctNodesApprox(events(s, d))),
    "agg_distinct_kmv"      -> ((s, d) => Aggs.aggDistinctKmv(events(s, d))),
    "agg_distinct_hll_portable" -> ((s, d) => Aggs.aggDistinctHllPortable(events(s, d))),
    "agg_salted_skew"       -> ((s, d) =>
      ops.Skew.saltedGroupSum(events(s, d), "event_type", "value").orderBy("event_type")),
    "agg_quantiles"         -> ((s, d) => Aggs.aggQuantiles(events(s, d))),
    "agg_pivot_type_hour"   -> ((s, d) => Aggs.aggPivotTypeHour(events(s, d))),
    "agg_unpivot_roundtrip" -> ((s, d) => Aggs.aggUnpivotRoundtrip(events(s, d))),
    "events_dau_mau"        -> ((s, d) => Aggs.eventsDauMau(events(s, d))),
    // one-day slice: over the full month every user has done everything
    // (one degenerate cohort); "yesterday's cohorts" is the real query
    "events_behavior_cohorts" -> ((s, d) => Aggs.eventsBehaviorCohorts(
      events(s, d).filter(col("ts") < lit("2024-01-02 00:00:00").cast("timestamp")))),
    "agg_cube_type_day"     -> ((s, d) => Aggs.aggCubeTypeDay(events(s, d))),
    "agg_grouping_sets"     -> ((s, d) => Aggs.aggGroupingSets(events(s, d))),
    "agg_quantiles_sampled" -> ((s, d) => Aggs.aggQuantilesSampled(events(s, d))),
    "agg_quantiles_banded"  -> ((s, d) => Aggs.aggQuantilesBanded(events(s, d))),
    "agg_quantiles_interp"  -> ((s, d) => Aggs.aggQuantilesInterp(events(s, d))),
    "agg_value_histogram"   -> ((s, d) => Aggs.aggValueHistogram(events(s, d))),
    "agg_mode_per_key"      -> ((s, d) => Aggs.aggModePerKey(events(s, d))),
    "agg_weighted_avg"      -> ((s, d) => Aggs.aggWeightedAvg(lineitem(s, d))),
    "agg_count_min"         -> ((s, d) => Aggs.aggCountMin(events(s, d))),
    "profile_columns"       -> ((s, d) => Aggs.profileColumns(events(s, d))),
    "stat_seasonality"      -> ((s, d) => Aggs.statSeasonality(events(s, d))),
    "stat_seasonal_residual"-> ((s, d) => Aggs.statSeasonalResidual(events(s, d))),
    "stat_ewma_hourly"      -> ((s, d) => Aggs.statEwmaHourly(events(s, d))),
    "agg_ohlc_hourly"       -> ((s, d) => Aggs.aggOhlcHourly(events(s, d))),
    "agg_simpson_diversity" -> ((s, d) => Aggs.aggSimpsonDiversity(events(s, d))),
    "agg_bitmap_distinct"   -> ((s, d) => Aggs.aggBitmapDistinct(events(s, d))),
    "stat_rolling_corr"     -> ((s, d) => Aggs.statRollingCorr(events(s, d))),
    "stat_corr_hourly"      -> ((s, d) => Aggs.statCorrHourlyCounts(events(s, d))),
    "stat_autocorr_lag"     -> ((s, d) => Aggs.statAutocorrLag(events(s, d))),
    "window_cusum"          -> ((s, d) => Windows.windowCusum(events(s, d))),
    "agg_time_weighted_avg" -> ((s, d) => Aggs.aggTimeWeightedAvg(events(s, d))),
    "profile_key_skew"      -> ((s, d) => Aggs.profileKeySkew(events(s, d))),
    "profile_join_cardinality" -> ((s, d) => Aggs.profileJoinCardinality(orders(s, d), customer(s, d))),
    "profile_expectations"  -> ((s, d) => Aggs.profileExpectations(events(s, d))),
    "window_minmax_scale"   -> ((s, d) => Windows.windowMinmaxScale(events(s, d))),
    "clean_winsorize"       -> ((s, d) => batch.Clean.cleanWinsorize(events(s, d))),
    "stat_regression_hourly"-> ((s, d) => Aggs.statRegressionHourly(events(s, d))),
    "agg_time_bucket"       -> ((s, d) => Aggs.aggTimeBucket(events(s, d))),
    "agg_rollup_node_day"   -> ((s, d) => Aggs.aggRollupNodeDay(events(s, d))),
    "agg_partial_final"     -> ((s, d) => Aggs.aggPartialFinal(events(s, d))),
    // §2.6 windows
    "window_latest_per_key" -> ((s, d) => Windows.windowLatestPerKey(events(s, d))),
    "window_gap_to_prev"    -> ((s, d) => Windows.windowGapToPrev(events(s, d))),
    "window_moving_avg"     -> ((s, d) => Windows.windowMovingAvg(events(s, d))),
    "window_rank_hottest"   -> ((s, d) => Windows.windowRankHottest(events(s, d))),
    "window_ntile_quartile" -> ((s, d) => Windows.windowNtileQuartile(events(s, d))),
    "window_topk_hourly"    -> ((s, d) => Windows.windowTopkHourly(events(s, d))),
    "window_zscore_hours"   -> ((s, d) => Windows.windowZscoreHours(events(s, d))),
    "window_percent_rank"   -> ((s, d) => Windows.windowPercentRank(events(s, d))),
    "window_mad_hours"      -> ((s, d) => Windows.windowMadHours(events(s, d))),
    "window_pct_change"     -> ((s, d) => Windows.windowPctChange(events(s, d))),
    "window_streaks"        -> ((s, d) => Windows.windowStreaks(events(s, d))),
    "window_rolling_zscore" -> ((s, d) => Windows.windowRollingZscore(events(s, d))),
    // §2.7 sort/limit/topk
    "sort_by_time"          -> ((s, d) => SetSort.sortByTime(events(s, d))),
    "limit_head"            -> ((s, d) => SetSort.limitHead(events(s, d))),
    "topk_recent_per_node"  -> ((s, d) => SetSort.topkRecentPerNode(events(s, d))),
    // §2.8 set ops
    "union_multi_file"      -> ((s, d) => SetSort.unionMultiFile(events(s, d))),
    "except_missing_nodes"  -> ((s, d) => SetSort.exceptMissingNodes(events(s, d))),
    "intersect_common_times"-> ((s, d) => SetSort.intersectCommonTimes(events(s, d))),
    "except_all_hours"      -> ((s, d) => SetSort.exceptAllClickErrorHours(events(s, d))),
    "intersect_all_hours"   -> ((s, d) => SetSort.intersectAllClickPurchaseHours(events(s, d))),
    // §2.10 extensions: dedup
    "dedup_exact"           -> ((s, d) => ext.Dedup.dedupExact(documents(s, d))),
    "dedup_ngram_jaccard"   -> ((s, d) => ext.Dedup.dedupNgramJaccard(documents(s, d))),
    "dedup_containment"     -> ((s, d) => ext.Dedup.dedupContainment(documents(s, d))),
    "dedup_near_minhash"    -> ((s, d) => ext.Dedup.dedupNearMinhash(documents(s, d))),
    "dedup_simhash"         -> ((s, d) => ext.Dedup.dedupSimhash(documents(s, d))),
    "dedup_embedding_cosine"-> ((s, d) => ext.Similarity.dedupEmbeddingCosine(embeddings(s, d))),
    "dedup_clusters"        -> ((s, d) => ext.Dedup.dedupClusters(documents(s, d))),
    "dedup_incremental"     -> ((s, d) => ext.Dedup.dedupIncremental(documents(s, d))),
    "dedup_graph_degrees"   -> ((s, d) => ext.Dedup.dedupGraphDegrees(documents(s, d))),
    // §2.10 extensions: similarity search
    "sim_search_cosine_topk"-> ((s, d) => ext.Similarity.simSearchCosineTopk(embeddings(s, d))),
    "sim_search_lsh_bucketed" -> ((s, d) => ext.Similarity.simSearchLshBucketed(embeddings(s, d))),
    "sim_search_lsh_multiprobe" -> ((s, d) => ext.Similarity.simSearchLshMultiprobe(embeddings(s, d))),
    "sim_search_ivf"        -> ((s, d) => ext.Similarity.simSearchIvf(embeddings(s, d))),
    "sim_knn_join"          -> ((s, d) => ext.Similarity.simKnnJoin(embeddings(s, d))),
    "sim_knn_join_lsh"      -> ((s, d) => ext.Similarity.simKnnJoinLsh(embeddings(s, d))),
    "dedup_semantic_clusters" -> ((s, d) => ext.Similarity.dedupSemanticClusters(embeddings(s, d))),
    "corpus_mix_report"     -> ((s, d) => ext.CorpusPrep.corpusMixReport(documents(s, d))),
    "agg_embedding_centroid"-> ((s, d) => ext.Similarity.aggEmbeddingCentroid(embeddings(s, d))),
    "emb_norm_stats"        -> ((s, d) => ext.Similarity.embNormStats(embeddings(s, d))),
    "emb_centroid_drift"    -> ((s, d) => ext.Similarity.embCentroidDrift(embeddings(s, d))),
    "emb_quantize_int8"     -> ((s, d) => ext.Similarity.embQuantizeInt8(embeddings(s, d))),
    "emb_pq_codes"          -> ((s, d) => ext.Similarity.embPqCodes(embeddings(s, d))),
    "sim_search_pq_adc"     -> ((s, d) => ext.Similarity.simSearchPqAdc(embeddings(s, d))),
    "join_fuzzy_blocked"    -> ((s, d) => Joins.joinFuzzyBlocked(part(s, d))),
    "corpus_shuffle_order"  -> ((s, d) => ext.Sampling.corpusShuffleOrder(documents(s, d))),
    // §2.10 extensions: text analysis
    "text_tokenize_stats"   -> ((s, d) => ext.Text.textTokenizeStats(documents(s, d))),
    "text_filter_lang"      -> ((s, d) => ext.Text.textFilterLang(documents(s, d))),
    "text_langid"           -> ((s, d) => ext.Text.textLangid(documents(s, d))),
    "text_quality_score"    -> ((s, d) => ext.Text.textQualityScore(documents(s, d))),
    "text_token_count"      -> ((s, d) => ext.Text.textTokenCount(documents(s, d))),
    "text_fingerprint"      -> ((s, d) => ext.Text.textFingerprint(documents(s, d))),
    "text_pii_scrub"        -> ((s, d) => ext.Text.textPiiScrub(documents(s, d))),
    "text_token_positions"  -> ((s, d) => ext.Text.textTokenPositions(documents(s, d))),
    "text_chunk_windows"    -> ((s, d) => ext.Text.textChunkWindows(documents(s, d))),
    "text_ngram_counts"     -> ((s, d) => ext.Text.textNgramCounts(documents(s, d))),
    "text_repetition_ratio" -> ((s, d) => ext.Text.textRepetitionRatio(documents(s, d))),
    "text_decontaminate"    -> ((s, d) => ext.Text.textDecontaminate(documents(s, d))),
    "text_tfidf_topk"       -> ((s, d) => ext.Text.textTfidfTopk(documents(s, d))),
    "text_passage_dedup"    -> ((s, d) => ext.Text.textPassageDedup(documents(s, d))),
    "text_token_lift"       -> ((s, d) => ext.Text.textTokenLift(documents(s, d))),
    // §2.10 extensions: sampling/splits (training-pipeline family, r2)
    "sample_hash_split"     -> ((s, d) => ext.Sampling.sampleHashSplit(documents(s, d))),
    "sample_per_group"      -> ((s, d) => ext.Sampling.samplePerGroup(documents(s, d))),
    "sample_upweight"       -> ((s, d) => ext.Sampling.sampleUpweight(documents(s, d))),
    // §2.10 extensions: sessions + multimodal plumbing
    "events_sessionize"     -> ((s, d) => ext.Sessions.eventsSessionize(events(s, d))),
    "events_funnel_stages"  -> ((s, d) => ext.Sessions.eventsFunnelStages(events(s, d))),
    "events_retention_cohort" -> ((s, d) => ext.Sessions.eventsRetentionCohort(events(s, d))),
    "scd2_intervals"        -> ((s, d) => ext.Sessions.scd2Intervals(events(s, d))),
    "join_pointintime_scd2" -> ((s, d) => ext.Sessions.joinPointInTime(events(s, d))),
    "events_window_funnel"  -> ((s, d) => ext.Sessions.eventsWindowFunnel(events(s, d))),
    "events_rfm_scores"     -> ((s, d) => ext.Sessions.eventsRfmScores(events(s, d))),
    "events_transition_matrix" -> ((s, d) => ext.Sessions.eventsTransitionMatrix(events(s, d))),
    "events_path_topk"      -> ((s, d) => ext.Sessions.eventsPathTopk(events(s, d))),
    "events_session_stats"  -> ((s, d) => ext.Sessions.eventsSessionStats(events(s, d))),
    "graph_pagerank_types"  -> ((s, d) => ext.Sessions.graphPagerankTypes(events(s, d))),
    "multimodal_extract_meta" -> ((s, d) => ext.Multimodal.multimodalExtractMeta(documents(s, d))),
    "multimodal_fake_features" -> ((s, d) => ext.Multimodal.multimodalFakeFeatures(documents(s, d))),
    "multimodal_frame_energies" -> ((s, d) => ext.Multimodal.multimodalFrameEnergies(documents(s, d))),
    "multimodal_blockhash"  -> ((s, d) => ext.Multimodal.multimodalBlockhash(documents(s, d))),
    "multimodal_vad_segments" -> ((s, d) => ext.Multimodal.multimodalVadSegments(documents(s, d))),
    "dedup_minhash_est"     -> ((s, d) => ext.Dedup.dedupMinhashEst(documents(s, d))),
    "sample_rate_per_stratum" -> ((s, d) => ext.Sampling.sampleRatePerStratum(documents(s, d))),
    "text_vocab_coverage"   -> ((s, d) => ext.Text.textVocabCoverage(documents(s, d))),
    // §3.3 composite: the cleandata.py parity chain end-to-end
    "clean_pipeline"        -> ((s, d) => batch.Clean.cleanPipeline(events(s, d))),
    // composite flagship of the LLM-pipeline family (r2)
    "corpus_prep_pipeline"  -> ((s, d) => ext.CorpusPrep.corpusPrepPipeline(documents(s, d))),
    "corpus_pack_sequences" -> ((s, d) => ext.CorpusPrep.corpusPackSequences(documents(s, d))),
    "corpus_budget_select"  -> ((s, d) => ext.CorpusPrep.corpusBudgetSelect(documents(s, d))),
    "corpus_refresh_pipeline" -> ((s, d) => ext.CorpusPrep.corpusRefreshPipeline(documents(s, d))),
  )

  // DuckDB spellings of the Det helpers (see Det.scala):
  private val DAVG = "CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value)"
  // conditional davg: Det.davg(when(event_type = t, value))
  private def CDAVG(t: String) =
    s"CAST(SUM(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) / COUNT(CASE WHEN event_type = '$t' THEN value END) AS ${t}_avg"
  private val TS6 = "'%Y-%m-%d %H:%M:%S.%f'"
  private val TS0 = "'%Y-%m-%d %H:%M:%S'"
  // D2D: Det.decToDouble's DuckDB spelling — exact-integer HUGEINT/DECIMAL
  // → double past 2^53 via the base-2^53 split (DuckDB's bare int128→double
  // CAST is not correctly rounded above 2^53; both split casts ARE exact,
  // so one multiply + one add land the identical IEEE double in any
  // engine). Sign-CASE pins one decomposition under either integral-divide
  // convention (truncating or flooring `//`). `x` must be a column/alias
  // reference, not an aggregate expression (it is repeated six times).
  // The full LSH near-dup oracle (shingle -> md5-u64 -> 32 affine
  // permutations -> 8x4 band keys -> candidate equi-join -> exact-Jaccard
  // verify) - shared verbatim by dedup_near_minhash and, as a subquery,
  // by the dedup_cross_source rollup.
  private val NEAR_MINHASH_SQL =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents), sh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t)-1)]) s FROM toks WHERE len(t) >= 3), ex AS (SELECT doc_id, ('0x' || substr(md5(unnest(s)), 1, 16))::UBIGINT::HUGEINT AS u FROM sh), seeds AS (SELECT seed, ((2*seed + 1) * CAST('11400714819323198485' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT) AS a, (seed * CAST('14029467366897019727' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT) AS b FROM range(32) r(seed)), minsig AS (SELECT doc_id, seed, min(((u % 4294967296) * a + (((u // 4294967296) * a) % 4294967296) * 4294967296 + b) % CAST('18446744073709551616' AS HUGEINT)) AS mv FROM ex CROSS JOIN seeds GROUP BY doc_id, seed), bands AS (SELECT doc_id, seed // 4 AS band, string_agg(CAST(mv AS VARCHAR), ',' ORDER BY seed) AS key FROM minsig GROUP BY doc_id, seed // 4), cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id), ver AS (SELECT c.doc_a, c.doc_b, CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jaccard FROM cand c JOIN sh sa ON c.doc_a = sa.doc_id JOIN sh sb ON c.doc_b = sb.doc_id) SELECT doc_a, doc_b, jaccard FROM ver WHERE jaccard >= 0.3 ORDER BY doc_a, doc_b"""

  private def D2D(x: String) =
    s"CASE WHEN ($x) < 0 THEN -(CAST(abs($x) // 9007199254740992 AS DOUBLE) * 9007199254740992.0 + CAST(abs($x) % 9007199254740992 AS DOUBLE)) ELSE (CAST(($x) // 9007199254740992 AS DOUBLE) * 9007199254740992.0 + CAST(($x) % 9007199254740992 AS DOUBLE)) END"

  def oracleSql: Map[String, String] = Map(
    "scan_parquet" ->
      s"""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, strftime(l_shipdate, $TS0) AS ship_ts FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, ship_ts""",
    "scan_csv_typed" ->
      "SELECT event_id, user_id, event_type, value FROM events ORDER BY event_id",
    // typed JSON round-trip is value-exact -> same plain-projection oracle
    "scan_jsonl_typed" ->
      "SELECT event_id, user_id, event_type, value FROM events ORDER BY event_id",
    "project_columns" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey",
    "unit_convert_f_to_c" ->
      "SELECT event_id, value AS temp_f, (value - 32) * 5 / 9 AS temp_c FROM events ORDER BY event_id",
    "round_metrics" ->
      "SELECT l_orderkey, l_linenumber, round(l_quantity, 3) AS quantity_r, round(l_extendedprice, 3) AS price_r, floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS revenue_r FROM lineitem ORDER BY l_orderkey, l_linenumber, quantity_r, price_r, revenue_r",
    "parse_timestamp" ->
      s"""SELECT event_id, strftime(TRY_CAST(strftime(ts, $TS0) AS TIMESTAMP), $TS0) AS parsed, strftime(TRY_CAST(event_type AS TIMESTAMP), $TS0) AS parsed_bad FROM events ORDER BY event_id""",
    "tz_utc_to_pacific" ->
      s"""SELECT event_id, strftime(ts, $TS0) AS utc_time, strftime(timezone('America/Los_Angeles', timezone('UTC', ts)), $TS0) AS pacific_time FROM events ORDER BY event_id""",
    "format_timestamp" ->
      s"""SELECT event_id, strftime(ts, $TS0) AS formatted FROM events ORDER BY event_id""",
    "epoch_to_timestamp" ->
      s"""SELECT event_id, epoch_us(ts) AS epoch_us, strftime(make_timestamp((epoch_us(ts) // 1000000) * 1000000), $TS0) AS from_epoch FROM events ORDER BY event_id""",
    "strip_tz_suffix" ->
      s"""SELECT event_id, strftime(ts, $TS0) || ' Pacific Standard Time' AS raw, strftime(TRY_CAST(replace(strftime(ts, $TS0) || ' Pacific Standard Time', ' Pacific Standard Time', '') AS TIMESTAMP), $TS0) AS parsed FROM events ORDER BY event_id""",
    "split_csv_text" ->
      "SELECT l_orderkey, l_linenumber, l_quantity AS f_quantity, l_extendedprice AS f_price, l_discount AS f_discount FROM lineitem ORDER BY l_orderkey, l_linenumber, f_quantity, f_price, f_discount",
    "json_extract_fields" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, json_extract_string(props, '$.missing_field') AS missing_field FROM events ORDER BY event_id",
    "null_coalesce_defaults" ->
      "SELECT event_id, COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS k_or_default, COALESCE(json_extract_string(props, '$.missing_field'), 'unknown') AS missing_or_default FROM events ORDER BY event_id",
    "try_cast_numeric" ->
      "SELECT event_id, TRY_CAST(event_type AS DOUBLE) AS bad_cast, TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS good_cast FROM events ORDER BY event_id",
    "conditional_route_tag" ->
      "SELECT event_id, event_type, CASE WHEN event_type IN ('purchase','signup') THEN 'transactional' WHEN event_type = 'error' THEN 'ops' ELSE 'engagement' END AS route FROM events ORDER BY event_id",
    "string_concat_label" ->
      "SELECT event_id, 'node ' || CAST(user_id AS VARCHAR) || ' sent ' || event_type AS label FROM events ORDER BY event_id",
    "filter_eq_type" ->
      "SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase' ORDER BY event_id",
    "filter_by_node" ->
      "SELECT event_id, user_id, event_type, value FROM events WHERE user_id = 42 ORDER BY event_id",
    "filter_field_present" ->
      "SELECT event_id, props FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL ORDER BY event_id",
    "drop_null_rows" ->
      "SELECT event_id, (CASE WHEN value < 100 THEN NULL ELSE value END) AS maybe_value FROM events WHERE (CASE WHEN value < 100 THEN NULL ELSE value END) IS NOT NULL ORDER BY event_id",
    "filter_time_threshold" ->
      s"""SELECT event_id, strftime(ts, $TS6) AS ts_s FROM events WHERE ts < (SELECT max(ts) FROM events) - INTERVAL 100 MINUTE ORDER BY event_id""",
    "filter_range_clip" ->
      "SELECT event_id, user_id, value FROM events WHERE value BETWEEN 0 AND 15 ORDER BY event_id",
    "join_broadcast_dim" ->
      "SELECT l_orderkey, l_linenumber, l_suppkey, s_name FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey ORDER BY l_orderkey, l_linenumber, l_suppkey",
    "join_latest_dim" ->
      s"""WITH dim AS (SELECT user_id, event_type AS latest_type, ts AS latest_ts FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events) WHERE rn = 1) SELECT e.event_id, e.user_id, d.latest_type, strftime(d.latest_ts, $TS6) AS latest_ts_s FROM events e LEFT JOIN dim d ON e.user_id = d.user_id ORDER BY e.event_id""",
    "join_timeseries_align" ->
      s"""WITH c AS (SELECT date_trunc('hour', ts) AS hour, $DAVG AS click_avg FROM events WHERE event_type = 'click' GROUP BY 1), p AS (SELECT date_trunc('hour', ts) AS hour, $DAVG AS purchase_avg FROM events WHERE event_type = 'purchase' GROUP BY 1) SELECT strftime(c.hour, $TS0) AS hour_s, c.click_avg, p.purchase_avg FROM c JOIN p ON c.hour = p.hour ORDER BY hour_s""",
    "join_timeseries_align_multi" ->
      s"""SELECT strftime(date_trunc('hour', ts), $TS0) AS hour_s, ${Seq("click", "purchase", "view", "signup", "error").map(CDAVG).mkString(", ")}, count(*) AS n_events FROM events GROUP BY date_trunc('hour', ts) ORDER BY hour_s""",
    "join_asof_nearest" ->
      s"""SELECT p.event_id, p.user_id, strftime(p.ts, $TS6) AS ts_s, c.value AS last_click_value, strftime(c.ts, $TS6) AS last_click_ts_s FROM (SELECT * FROM events WHERE event_type = 'purchase') p ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c ON p.user_id = c.user_id AND p.ts >= c.ts ORDER BY p.event_id""",
    // match-then-age-gate: the CASE nulls out stale matches AFTER the asof
    // pick, it never falls back to an older click
    "join_asof_tolerance" ->
      s"""SELECT p.event_id, p.user_id, strftime(p.ts, $TS6) AS ts_s, CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 600000000 THEN c.value END AS click_value, CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 600000000 THEN epoch_us(p.ts) - epoch_us(c.ts) END AS click_age_us FROM (SELECT * FROM events WHERE event_type = 'purchase') p ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c ON p.user_id = c.user_id AND p.ts >= c.ts ORDER BY p.event_id""",
    "join_semi_active_nodes" ->
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey",
    "join_anti_unknown_nodes" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey",
    "agg_last_seen_per_node" ->
      s"""SELECT user_id, strftime(max(ts), $TS6) AS last_seen, count(*) AS n_events FROM events GROUP BY user_id ORDER BY user_id""",
    "agg_metrics_summary" ->
      s"""SELECT user_id, min(value) AS min_value, max(value) AS max_value, $DAVG AS avg_value, count(value) AS n_values FROM events GROUP BY user_id ORDER BY user_id""",
    "agg_count_by_type" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type",
    "agg_distinct_nodes" ->
      "SELECT count(DISTINCT user_id) AS n_nodes, count(*) AS n_events FROM events",
    "agg_distinct_kmv" ->
      """WITH h AS (SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT::DOUBLE / 18446744073709551616.0 AS h FROM events), tk AS (SELECT h FROM h ORDER BY h LIMIT 64) SELECT CAST((SELECT count(*) FROM h) AS BIGINT) AS n_distinct_hashed, CASE WHEN (SELECT count(*) FROM tk) < 64 THEN CAST((SELECT count(*) FROM h) AS DOUBLE) ELSE 63.0 / (SELECT max(h) FROM tk) END AS est_distinct""",
    "stat_tukey_outliers" ->
      """WITH b AS (SELECT event_type, value, event_id FROM events WHERE value IS NOT NULL), c AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rn, count(*) OVER (PARTITION BY event_type) AS n FROM b), f0 AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n, max(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT) THEN value END) AS q1, max(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT) THEN value END) AS q3 FROM c GROUP BY 1), f AS (SELECT event_type, n, q1, q3, q1 - 1.5 * (q3 - q1) AS lo_fence, q3 + 1.5 * (q3 - q1) AS hi_fence FROM f0) SELECT b.event_type, max(f.n) AS n, max(f.q1) AS q1, max(f.q3) AS q3, max(f.lo_fence) AS lo_fence, max(f.hi_fence) AS hi_fence, CAST(SUM(CASE WHEN b.value < f.lo_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_low, CAST(SUM(CASE WHEN b.value > f.hi_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_high, CAST(CAST(SUM(CASE WHEN b.value < f.lo_fence OR b.value > f.hi_fence THEN 1 ELSE 0 END) AS HUGEINT) * 1000000000 // CAST(max(f.n) AS HUGEINT) AS BIGINT) AS outlier_ppb FROM b JOIN f ON b.event_type = f.event_type GROUP BY 1 ORDER BY 1""",
    "agg_distinct_kmv_native" ->
      """WITH h AS (SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT::DOUBLE / 18446744073709551616.0 AS h FROM events), tk AS (SELECT h FROM h ORDER BY h LIMIT 64), a AS (SELECT CAST(count(*) AS BIGINT) AS m, max(h) AS hk FROM tk) SELECT m, CASE WHEN m < 64 THEN 1.0 ELSE hk END AS theta, CASE WHEN m < 64 THEN CAST(m AS DOUBLE) ELSE 63.0 / hk END AS est_distinct FROM a""",
    "text_hashed_features" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents), b AS (SELECT doc_id, CAST(('0x' || substr(md5(token), 1, 2))::INT AS BIGINT) AS bucket FROM tok), g AS (SELECT doc_id, bucket, count(*) AS n FROM b GROUP BY 1, 2) SELECT doc_id, bucket, n, CAST(sum(n) OVER (PARTITION BY doc_id) AS BIGINT) AS doc_tokens, CAST(CAST(n AS HUGEINT) * 1000000000 // CAST(sum(n) OVER (PARTITION BY doc_id) AS HUGEINT) AS BIGINT) AS tf_ppb FROM g ORDER BY doc_id, bucket""",
    "text_readability" ->
      """WITH c AS (SELECT doc_id, greatest(CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT), 1) AS n_words, greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1) AS n_sentences, greatest(CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT), 1) AS n_syllables FROM documents) SELECT doc_id, n_words, n_sentences, n_syllables, 206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)) - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) AS flesch FROM c ORDER BY doc_id""",
    "corpus_temperature_mix" ->
      """WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1), w AS (SELECT source, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS weight FROM s), wt AS (SELECT source, n_docs, weight, CAST(SUM(CAST(weight AS DECIMAL(28,6))) OVER () AS DOUBLE) AS w_total FROM w), q AS (SELECT source, n_docs, weight, w_total, 10000.0 * weight / w_total AS ex, floor(10000.0 * weight / w_total) AS fl FROM wt), r AS (SELECT *, ex - fl AS rem, CAST(sum(CAST(fl AS BIGINT)) OVER () AS BIGINT) AS tot_fl, row_number() OVER (ORDER BY (ex - fl) DESC, source) AS rk FROM q) SELECT source, n_docs, weight, CAST(floor(weight * 1000000000.0 / w_total) AS BIGINT) AS share_ppb, CAST(fl AS BIGINT) + CASE WHEN rk <= 10000 - tot_fl THEN 1 ELSE 0 END AS alloc_docs FROM r ORDER BY source""",
    "events_attribution_linear" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts, value AS p_value FROM events WHERE event_type = 'purchase'), tch AS (SELECT user_id, ts AS t_ts, event_type AS touch_type FROM events WHERE event_type IN ('click', 'view')), j AS (SELECT p.p_id, p.p_value, t.t_ts, t.touch_type FROM p LEFT JOIN tch t ON p.user_id = t.user_id AND t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 7 DAY), c AS (SELECT p_id, p_value, t_ts, touch_type, count(t_ts) OVER (PARTITION BY p_id) AS n_touches FROM j) SELECT coalesce(touch_type, '(unattributed)') AS touch_type, count(*) AS n_credits, CAST(SUM(CAST(CASE WHEN t_ts IS NOT NULL THEN p_value / CAST(n_touches AS DOUBLE) ELSE p_value END AS DECIMAL(28,6))) AS DOUBLE) AS revenue FROM c GROUP BY 1 ORDER BY 1""",
    "agg_distinct_diff_kmv" ->
      """WITH h AS (SELECT DISTINCT event_type, user_id, ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT::DOUBLE / 18446744073709551616.0 AS h FROM events WHERE event_type IN ('click', 'purchase')), r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h), th AS (SELECT event_type, CASE WHEN count(*) < 64 THEN 1.0 ELSE max(CASE WHEN rn = 64 THEN h END) END AS theta FROM r GROUP BY 1), t AS (SELECT min(theta) AS theta FROM th), sa AS (SELECT user_id, h FROM r WHERE event_type = 'click' AND rn <= 64), sb AS (SELECT user_id FROM r WHERE event_type = 'purchase' AND rn <= 64), df AS (SELECT count(*) AS n_diff_sample FROM sa, t WHERE sa.h < t.theta AND sa.user_id NOT IN (SELECT user_id FROM sb)), ex AS (SELECT count(*) AS n_exact FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'click') a WHERE a.user_id NOT IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')) SELECT CAST(64 AS BIGINT) AS k, t.theta, df.n_diff_sample, CAST(df.n_diff_sample AS DOUBLE) / t.theta AS est_diff, ex.n_exact, CAST(df.n_diff_sample AS DOUBLE) / t.theta - CAST(ex.n_exact AS DOUBLE) AS err FROM df, t, ex""",
    "stat_theil_sen" ->
      s"""WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day, $DAVG AS v FROM events WHERE value IS NOT NULL GROUP BY 1, 2), p AS (SELECT l.user_id, (r.v - l.v) / CAST(date_diff('day', l.day, r.day) AS DOUBLE) AS slope FROM daily l JOIN daily r ON l.user_id = r.user_id AND l.day < r.day), rk AS (SELECT user_id, slope, CAST(row_number() OVER (PARTITION BY user_id ORDER BY slope) AS BIGINT) AS rn, count(*) OVER (PARTITION BY user_id) AS n FROM p), f AS (SELECT user_id, CAST(max(n) AS BIGINT) AS n_pairs, max(CASE WHEN rn = (n + 1) // 2 THEN slope END) AS lo, max(CASE WHEN rn = n // 2 + 1 THEN slope END) AS hi FROM rk GROUP BY 1) SELECT user_id, n_pairs, CASE WHEN n_pairs % 2 = 1 THEN lo ELSE (lo + hi) / 2.0 END AS slope_per_day FROM f ORDER BY user_id""",
    "stat_holt_forecast" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n FROM events GROUP BY 1, 2), s AS (SELECT event_type, list([CAST(n AS DOUBLE), 0.0] ORDER BY hr) AS xs FROM h GROUP BY 1), r AS (SELECT event_type, CAST(len(xs) AS BIGINT) AS n_hours, list_reduce(xs, (acc, x) -> [(x[1] + (acc[1] + acc[2])) / 2.0, (((x[1] + (acc[1] + acc[2])) / 2.0 - acc[1]) + acc[2]) / 2.0]) AS lb FROM s) SELECT event_type, n_hours, lb[1] AS level, lb[2] AS trend, lb[1] + lb[2] AS forecast_next FROM r ORDER BY event_type""",
    "ml_lag_features" ->
      s"""WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day, $DAVG AS v FROM events WHERE value IS NOT NULL GROUP BY 1, 2), f AS (SELECT user_id, day, v, lag(v, 1) OVER w AS lag1, lag(v, 7) OVER w AS lag7, v - lag(v, 1) OVER w AS delta1, count(v) OVER w7 AS n_window, CAST(sum(CAST(v AS DECIMAL(28,6))) OVER w7 AS DOUBLE) AS s1, CAST(sum(CAST(v * v AS DECIMAL(28,6))) OVER w7 AS DOUBLE) AS s2 FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY day), w7 AS (PARTITION BY user_id ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) SELECT user_id, strftime(day, $TS0) AS day_s, v, lag1, lag7, delta1, CAST(n_window AS BIGINT) AS n_window, s1 / CAST(n_window AS DOUBLE) AS roll7_avg, CASE WHEN n_window > 1 THEN sqrt(greatest((s2 - s1 * s1 / CAST(n_window AS DOUBLE)) / CAST(n_window - 1 AS DOUBLE), 0.0)) END AS roll7_std FROM f ORDER BY user_id, day_s""",
    "stat_changepoint_cusum" ->
      s"""WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day, $DAVG AS v FROM events WHERE value IS NOT NULL GROUP BY 1, 2), m AS (SELECT user_id, day, v, CAST(sum(CAST(v AS DECIMAL(28,6))) OVER (PARTITION BY user_id) AS DOUBLE) / CAST(count(v) OVER (PARTITION BY user_id) AS DOUBLE) AS mean_v FROM daily), c AS (SELECT user_id, day, CAST(sum(CAST(v - mean_v AS DECIMAL(28,6))) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cusum FROM m), r AS (SELECT user_id, day, cusum, row_number() OVER (PARTITION BY user_id ORDER BY abs(cusum) DESC, day) AS rk, count(*) OVER (PARTITION BY user_id) AS n_days FROM c) SELECT user_id, CAST(n_days AS BIGINT) AS n_days, strftime(day, $TS0) AS cp_day_s, cusum AS cusum_at_cp FROM r WHERE rk = 1 ORDER BY user_id""",
    "stat_trimmed_mean" ->
      """WITH b AS (SELECT event_type, value, event_id FROM events WHERE value IS NOT NULL), r AS (SELECT event_type, value, CAST(row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rn, count(*) OVER (PARTITION BY event_type) AS n FROM b), k AS (SELECT event_type, value, n, n // 10 AS cut FROM r WHERE rn > n // 10 AND rn <= n - n // 10) SELECT event_type, CAST(max(n) AS BIGINT) AS n, CAST(max(cut) AS BIGINT) AS n_trimmed_each, count(*) AS n_kept, CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value) AS trimmed_mean FROM k GROUP BY 1 ORDER BY 1""",
    "text_ngram_novelty" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents), sh AS (SELECT doc_id, unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t)-1)])) AS s FROM toks WHERE len(t) >= 3), fs AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY 1) SELECT sh.doc_id, count(*) AS n_shingles, CAST(sum(CASE WHEN fs.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel, CAST(CAST(sum(CASE WHEN fs.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS HUGEINT) * 1000000000 // count(*) AS BIGINT) AS novelty_ppb FROM sh JOIN fs USING (s) GROUP BY 1 ORDER BY 1""",
    "join_interval_overlap" ->
      """WITH g AS (SELECT user_id, event_id, ts, epoch_us(ts) e_us, lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev_us FROM events), s AS (SELECT user_id, event_id, ts, CASE WHEN prev_us IS NULL OR e_us - prev_us > 21600000000 THEN 1 ELSE 0 END new_sess FROM g), t AS (SELECT user_id, event_id, ts, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) session_num FROM s), bd AS (SELECT user_id, session_num, min(ts) AS st, max(ts) AS en FROM t GROUP BY 1, 2), sp AS (SELECT user_id, session_num, epoch_us(st) AS s_us, epoch_us(en) AS e_us, unnest(generate_series(CAST(date_trunc('day', st) AS DATE), CAST(date_trunc('day', en) AS DATE), INTERVAL 1 DAY)) AS day FROM bd), pr AS (SELECT DISTINCT a.user_id AS user_a, a.session_num AS sess_a, b.user_id AS user_b, b.session_num AS sess_b, least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS overlap_us FROM sp a JOIN sp b ON a.day = b.day AND a.user_id < b.user_id AND greatest(a.s_us, b.s_us) < least(a.e_us, b.e_us)) SELECT user_a, user_b, count(*) AS n_concurrent, CAST(sum(overlap_us) AS BIGINT) AS overlap_us_total FROM pr GROUP BY 1, 2 ORDER BY 1, 2""",
    "multimodal_keyframe_select" ->
      """WITH hx AS (SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n FROM documents), b AS (SELECT doc_id, i, (strpos('0123456789ABCDEF', substr(h, CAST(2*i+1 AS INT), 1)) - 1) * 16 + (strpos('0123456789ABCDEF', substr(h, CAST(2*i+2 AS INT), 1)) - 1) AS byte FROM (SELECT doc_id, h, unnest(range(n)) AS i FROM hx)), f AS (SELECT doc_id, i // 64 AS frame_no, count(*) AS cnt, sum(byte) AS s FROM b GROUP BY 1, 2), act AS (SELECT doc_id, frame_no, CAST(s AS DOUBLE) / 255.0 AS energy FROM f WHERE cnt = 64 AND CAST(s AS DOUBLE) / 255.0 > 23.7), isl AS (SELECT doc_id, frame_no, energy, frame_no - row_number() OVER (PARTITION BY doc_id ORDER BY frame_no) AS island FROM act), k AS (SELECT doc_id, island, frame_no, energy, min(frame_no) OVER (PARTITION BY doc_id, island) AS seg_start, max(frame_no) OVER (PARTITION BY doc_id, island) AS seg_end, row_number() OVER (PARTITION BY doc_id, island ORDER BY energy DESC, frame_no) AS rk FROM isl) SELECT doc_id, CAST(seg_start AS BIGINT) AS seg_start, CAST(seg_end AS BIGINT) AS seg_end, CAST(frame_no AS BIGINT) AS keyframe_no, energy AS key_energy FROM k WHERE rk = 1 ORDER BY doc_id, seg_start""",
    "agg_salted_skew" ->
      "SELECT event_type, CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type",
    "agg_quantiles" ->
      """WITH t AS (SELECT event_type, value, CAST(row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rn, count(*) OVER (PARTITION BY event_type) AS n FROM events) SELECT event_type, max(n) AS n, max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS p50, max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN value END) AS p90, max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN value END) AS p99 FROM t GROUP BY event_type ORDER BY event_type""",
    // banded two-phase quantiles are EXACT — same discrete definition,
    // same oracle SQL as agg_quantiles (only the Spark-side plan differs)
    "agg_quantiles_banded" ->
      """WITH t AS (SELECT event_type, value, CAST(row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rn, count(*) OVER (PARTITION BY event_type) AS n FROM events) SELECT event_type, max(n) AS n, max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS p50, max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN value END) AS p90, max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN value END) AS p99 FROM t GROUP BY event_type ORDER BY event_type""",
    "agg_pivot_type_hour" ->
      s"""SELECT strftime(date_trunc('hour', ts), $TS0) AS hour_s, CAST(SUM(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS click, CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS purchase, CAST(SUM(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS view, CAST(SUM(CASE WHEN event_type='signup' THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS signup, CAST(SUM(CASE WHEN event_type='error' THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS error FROM events GROUP BY date_trunc('hour', ts) ORDER BY hour_s""",
    "agg_cube_type_day" ->
      s"""SELECT CAST(GROUPING(event_type) AS INT) AS g_type, CAST(GROUPING(day) AS INT) AS g_day, event_type, day, count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value FROM (SELECT event_type, strftime(date_trunc('day', ts), $TS0) AS day, value FROM events) GROUP BY CUBE(event_type, day) ORDER BY g_type, g_day, event_type NULLS FIRST, day NULLS FIRST""",
    "agg_grouping_sets" ->
      s"""SELECT CAST(GROUPING(event_type) AS INT) AS g_type, CAST(GROUPING(day) AS INT) AS g_day, event_type, day, count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value FROM (SELECT event_type, strftime(date_trunc('day', ts), $TS0) AS day, value FROM events) GROUP BY GROUPING SETS ((event_type), (day), ()) ORDER BY g_type, g_day, event_type NULLS FIRST, day NULLS FIRST""",
    "ts_resample_linear" ->
      s"""WITH hourly AS (SELECT user_id, epoch_us(date_trunc('hour', ts)) // 3600000000 AS hu, CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value) AS v FROM events GROUP BY 1, 2), n AS (SELECT *, lead(hu) OVER w AS next_hu, lead(v) OVER w AS next_v FROM hourly WINDOW w AS (PARTITION BY user_id ORDER BY hu)), g AS (SELECT user_id, hu, v, next_hu, next_v, unnest(range(hu, coalesce(next_hu - 1, hu) + 1)) AS h FROM n) SELECT user_id, strftime(make_timestamp(h * 3600000000), $TS0) AS hour_s, CASE WHEN h = hu THEN v ELSE v + (next_v - v) * (CAST(h - hu AS DOUBLE) / CAST(next_hu - hu AS DOUBLE)) END AS value_interp, h <> hu AS is_interp FROM g ORDER BY user_id, hour_s""",
    "text_token_positions" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents) SELECT doc_id, CAST(i AS BIGINT) AS pos, t[CAST(i+1 AS INT)] AS token FROM (SELECT doc_id, t, unnest(range(least(5, len(t)))) AS i FROM toks) ORDER BY doc_id, pos""",
    "text_chunk_windows" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents), c AS (SELECT doc_id, t, unnest(range(((len(t)-1)//32)+1)) AS i FROM toks WHERE len(t) > 0) SELECT doc_id, CAST(i AS BIGINT) AS chunk_id, CAST(i*32 AS BIGINT) AS start_tok, CAST(len(t[(i*32+1):(i*32+64)]) AS BIGINT) AS chunk_tokens, md5(array_to_string(t[(i*32+1):(i*32+64)], ' ')) AS chunk_md5 FROM c ORDER BY doc_id, chunk_id""",
    // the oracle spells the pack offset as the naive all-rows running sum;
    // the Spark side computes the same prefix sum with the two-phase
    // distributed scan (per-range totals + tiny base cumsum + local window)
    "corpus_pack_sequences" ->
      """WITH s AS (SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n FROM documents), c AS (SELECT doc_id, n, sum(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS start_off FROM s) SELECT CAST(start_off // 512 AS BIGINT) AS bin, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS total_tokens, min(doc_id) AS first_doc, max(doc_id) AS last_doc FROM c GROUP BY 1 ORDER BY bin""",
    "agg_quantiles_sampled" ->
      """WITH s AS (SELECT event_type, event_id, value FROM events WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 16))::UBIGINT::DOUBLE / 18446744073709551616.0 < 0.1), t AS (SELECT event_type, value, CAST(row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rn, count(*) OVER (PARTITION BY event_type) AS n FROM s) SELECT event_type, max(n) AS n_sample, max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS p50_est, max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN value END) AS p90_est, max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN value END) AS p99_est FROM t GROUP BY event_type ORDER BY event_type""",
    // salted join is bit-identical to the plain left join — same oracle as J1
    "join_salted_skew" ->
      "SELECT l_orderkey, l_linenumber, l_suppkey, s_name FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey ORDER BY l_orderkey, l_linenumber, l_suppkey",
    // closed-form Pearson from exact integer power sums (both engines'
    // built-in corr() is an order-dependent double accumulation)
    "stat_corr_hourly" ->
      "WITH h AS (SELECT date_trunc('hour', ts) AS hour, sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x, sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y FROM events GROUP BY 1), s AS (SELECT count(*) AS n_hours, CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx, CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy, CAST(sum(CAST(x*y AS HUGEINT)) AS DOUBLE) AS sxy, CAST(sum(CAST(x*x AS HUGEINT)) AS DOUBLE) AS sxx, CAST(sum(CAST(y*y AS HUGEINT)) AS DOUBLE) AS syy FROM h) SELECT n_hours, (n_hours * sxy - sx * sy) / (sqrt(n_hours * sxx - sx * sx) * sqrt(n_hours * syy - sy * sy)) AS corr_xy FROM s",
    "events_retention_cohort" ->
      s"""WITH f AS (SELECT user_id, date_trunc('day', min(ts)) AS cohort_day FROM events GROUP BY 1), d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events) SELECT strftime(f.cohort_day, $TS0) AS cohort_day_s, CAST(date_diff('day', f.cohort_day, d.day) AS BIGINT) AS day_offset, count(DISTINCT d.user_id) AS n_users FROM d JOIN f USING (user_id) GROUP BY f.cohort_day, date_diff('day', f.cohort_day, d.day) ORDER BY cohort_day_s, day_offset""",
    "text_ngram_counts" ->
      """WITH toks AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents), bg AS (SELECT t[CAST(i+1 AS INT)] AS w1, t[CAST(i+2 AS INT)] AS w2 FROM (SELECT t, unnest(range(len(t)-1)) AS i FROM toks WHERE len(t) >= 2)), c AS (SELECT w1, w2, count(*) AS n FROM bg GROUP BY 1, 2), tot AS (SELECT w1, w2, n, sum(n) OVER (PARTITION BY w1) AS w1_total FROM c) SELECT w1, w2, n, CAST(n AS DOUBLE) / CAST(w1_total AS DOUBLE) AS cond_p FROM tot ORDER BY n DESC, w1, w2 LIMIT 100""",
    "agg_mode_per_key" ->
      "SELECT user_id, top_type, n FROM (SELECT user_id, event_type AS top_type, count(*) AS n, row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rn FROM events GROUP BY user_id, event_type) WHERE rn = 1 ORDER BY user_id",
    "events_funnel_stages" ->
      s"""WITH w1 AS (SELECT user_id, event_type, ts, min(CASE WHEN event_type = 'click' THEN ts END) OVER (PARTITION BY user_id) AS t1 FROM events), w2 AS (SELECT *, min(CASE WHEN event_type = 'view' AND ts > t1 THEN ts END) OVER (PARTITION BY user_id) AS t2 FROM w1), w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END) OVER (PARTITION BY user_id) AS t3 FROM w2), u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3 FROM w3 GROUP BY user_id) SELECT user_id, CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2 WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage, strftime(t1, $TS6) AS t1_s, strftime(t2, $TS6) AS t2_s, strftime(t3, $TS6) AS t3_s FROM u ORDER BY user_id""",
    "events_window_funnel" ->
      """WITH w1 AS (SELECT user_id, event_type, ts, min(CASE WHEN event_type = 'click' THEN ts END) OVER (PARTITION BY user_id) AS t1 FROM events), w2 AS (SELECT *, min(CASE WHEN event_type = 'view' AND ts > t1 AND ts <= t1 + INTERVAL 24 HOUR THEN ts END) OVER (PARTITION BY user_id) AS t2 FROM w1), w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 AND ts <= t1 + INTERVAL 24 HOUR THEN ts END) OVER (PARTITION BY user_id) AS t3 FROM w2), u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3 FROM w3 GROUP BY user_id) SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2 WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS funnel_depth, count(*) AS n_users FROM u GROUP BY 1 ORDER BY 1""",
    "events_rfm_scores" ->
      """WITH u AS (SELECT user_id, max(ts) AS last_ts, count(*) AS frequency, CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE) AS monetary FROM events GROUP BY 1), r AS (SELECT user_id, CAST(date_diff('day', CAST(last_ts AS DATE), DATE '2024-02-01') AS BIGINT) AS recency_days, frequency, monetary FROM u), s AS (SELECT user_id, recency_days, frequency, monetary, CAST(ntile(4) OVER (ORDER BY recency_days DESC, user_id) AS BIGINT) AS r_score, CAST(ntile(4) OVER (ORDER BY frequency, user_id) AS BIGINT) AS f_score, CAST(ntile(4) OVER (ORDER BY monetary, user_id) AS BIGINT) AS m_score FROM r) SELECT user_id, recency_days, frequency, monetary, r_score, f_score, m_score, CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS segment FROM s ORDER BY user_id""",
    "multimodal_vad_segments" ->
      """WITH hx AS (SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n FROM documents), b AS (SELECT doc_id, i, (strpos('0123456789ABCDEF', substr(h, CAST(2*i+1 AS INT), 1)) - 1) * 16 + (strpos('0123456789ABCDEF', substr(h, CAST(2*i+2 AS INT), 1)) - 1) AS byte FROM (SELECT doc_id, h, unnest(range(n)) AS i FROM hx)), f AS (SELECT doc_id, i // 64 AS frame_no, count(*) AS cnt, sum(byte) AS s FROM b GROUP BY 1, 2), act AS (SELECT doc_id, frame_no FROM f WHERE cnt = 64 AND CAST(s AS DOUBLE) / 255.0 > 23.7), isl AS (SELECT doc_id, frame_no, frame_no - row_number() OVER (PARTITION BY doc_id ORDER BY frame_no) AS island FROM act) SELECT doc_id, CAST(min(frame_no) AS BIGINT) AS seg_start, CAST(max(frame_no) AS BIGINT) AS seg_end, count(*) AS n_frames FROM isl GROUP BY doc_id, island ORDER BY doc_id, seg_start""",
    "dedup_minhash_est" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents), sh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t)-1)]) s FROM toks WHERE len(t) >= 3), ex AS (SELECT doc_id, ('0x' || substr(md5(unnest(s)), 1, 16))::UBIGINT::HUGEINT AS u FROM sh), seeds AS (SELECT seed, ((2*seed + 1) * CAST('11400714819323198485' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT) AS a, (seed * CAST('14029467366897019727' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT) AS b FROM range(32) r(seed)), minsig AS (SELECT doc_id, seed, min(((u % 4294967296) * a + (((u // 4294967296) * a) % 4294967296) * 4294967296 + b) % CAST('18446744073709551616' AS HUGEINT)) AS mv FROM ex CROSS JOIN seeds GROUP BY doc_id, seed), bands AS (SELECT doc_id, seed // 4 AS band, string_agg(CAST(mv AS VARCHAR), ',' ORDER BY seed) AS key FROM minsig GROUP BY doc_id, seed // 4), cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id), agr AS (SELECT c.doc_a, c.doc_b, sum(CASE WHEN ma.mv = mb.mv THEN 1 ELSE 0 END) AS n_agree FROM cand c JOIN minsig ma ON ma.doc_id = c.doc_a JOIN minsig mb ON mb.doc_id = c.doc_b AND mb.seed = ma.seed GROUP BY 1, 2) SELECT a.doc_a, a.doc_b, CAST(a.n_agree AS BIGINT) AS n_agree, CAST(a.n_agree AS DOUBLE) / 32.0 AS est_jaccard, CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jaccard, CAST(a.n_agree AS DOUBLE) / 32.0 - CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS err FROM agr a JOIN sh sa ON a.doc_a = sa.doc_id JOIN sh sb ON a.doc_b = sb.doc_id ORDER BY doc_a, doc_b""",
    "sample_rate_per_stratum" ->
      """WITH s AS (SELECT doc_id, lang, CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 1000 AS BIGINT) AS permille, CAST(CASE WHEN lang = 'en' THEN 250 ELSE 1000 END AS BIGINT) AS rate FROM documents) SELECT doc_id, lang, permille, rate FROM s WHERE permille < rate ORDER BY doc_id""",
    "text_vocab_coverage" ->
      """WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents), c AS (SELECT token, count(*) AS n FROM tok GROUP BY 1), r AS (SELECT token, n, CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank, CAST(sum(n) OVER (ORDER BY n DESC, token) AS BIGINT) AS cum_n, CAST(sum(n) OVER () AS BIGINT) AS total_n FROM c) SELECT rank, token, n, cum_n, CAST(CAST(cum_n AS HUGEINT) * 1000000000 // CAST(total_n AS HUGEINT) AS BIGINT) AS cum_share_ppb FROM r WHERE rank <= 100 ORDER BY rank""",
    "multimodal_blockhash" ->
      """WITH hx AS (SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n FROM documents), b AS (SELECT doc_id, i, (strpos('0123456789ABCDEF', substr(h, CAST(2*i+1 AS INT), 1)) - 1) * 16 + (strpos('0123456789ABCDEF', substr(h, CAST(2*i+2 AS INT), 1)) - 1) AS byte FROM (SELECT doc_id, h, unnest(range(n)) AS i FROM hx)), bs AS (SELECT doc_id, i % 16 AS blk, sum(byte) AS s FROM b GROUP BY 1, 2), tot AS (SELECT doc_id, sum(s) AS total FROM bs GROUP BY 1), sig0 AS (SELECT bs.doc_id, sum(CASE WHEN bs.s * 16 > tot.total THEN (1 << CAST(blk AS INT)) ELSE 0 END) AS bh FROM bs JOIN tot ON bs.doc_id = tot.doc_id GROUP BY bs.doc_id), sig AS (SELECT d.doc_id, coalesce(s0.bh, 0) AS bh FROM documents d LEFT JOIN sig0 s0 USING (doc_id)) SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b, CAST(bit_count(xor(CAST(a.bh AS BIGINT), CAST(b2.bh AS BIGINT))) AS BIGINT) AS hamming FROM sig a JOIN sig b2 ON a.doc_id < b2.doc_id WHERE bit_count(xor(CAST(a.bh AS BIGINT), CAST(b2.bh AS BIGINT))) <= 2 ORDER BY doc_a, doc_b""",
    "agg_value_histogram" ->
      "SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket, CAST(floor(value / 25.0) AS BIGINT)::DOUBLE * 25.0 AS bucket_lo, count(*) AS n, min(value) AS lo_seen, max(value) AS hi_seen FROM events GROUP BY 1 ORDER BY bucket",
    "join_range_tier" ->
      "SELECT event_id, value, tier FROM events LEFT JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0), ('high', 200.0, 1000000.0)) AS t(tier, lo, hi) ON value >= lo AND value < hi ORDER BY event_id",
    "join_interval_bucket" ->
      "WITH c AS (SELECT user_id, epoch_us(ts) AS c_us FROM events WHERE event_type = 'click'), p AS (SELECT event_id, user_id, epoch_us(ts) AS p_us FROM events WHERE event_type = 'purchase') SELECT p.event_id, count(c.c_us) AS n_nearby_clicks FROM p LEFT JOIN c ON p.user_id = c.user_id AND abs(c.c_us - p.p_us) <= 300000000 GROUP BY p.event_id ORDER BY event_id",
    "ts_fill_gaps" ->
      s"""WITH hourly AS (SELECT user_id, date_trunc('hour', ts) AS hour, $DAVG AS avg_value FROM events GROUP BY 1, 2), bounds AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY 1), spine AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds), j AS (SELECT s.user_id, s.hour, h.avg_value FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour) SELECT user_id, strftime(hour, $TS0) AS hour_s, avg_value, last_value(avg_value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value, avg_value IS NULL AS is_gap FROM j ORDER BY user_id, hour_s""",
    "dedup_graph_degrees" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents), sh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t)-1)]) s FROM toks WHERE len(t) >= 3), sz AS (SELECT doc_id, len(s) n FROM sh), ex AS (SELECT doc_id, unnest(s) sh FROM sh), posts AS (SELECT sh, count(*) df FROM ex GROUP BY sh HAVING count(*) BETWEEN 2 AND 1000), c AS (SELECT a.doc_id da, b.doc_id db, count(*) cnt FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id WHERE a.sh IN (SELECT sh FROM posts) GROUP BY 1, 2), pairs AS (SELECT da, db FROM c JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id WHERE CAST(cnt AS DOUBLE) / (sa.n + sb.n - cnt) >= 0.3), d AS (SELECT da AS doc_id FROM pairs UNION ALL SELECT db FROM pairs), deg AS (SELECT doc_id, count(*) AS degree FROM d GROUP BY 1) SELECT degree, count(*) AS n_docs FROM deg GROUP BY 1 ORDER BY degree""",
    "agg_time_bucket" ->
      s"""SELECT strftime(date_trunc('hour', ts), $TS0) AS hour_s, user_id, $DAVG AS avg_value, count(*) AS n FROM events GROUP BY 1, 2 ORDER BY hour_s, user_id""",
    "agg_rollup_node_day" ->
      s"""SELECT CAST(GROUPING(user_id) AS INT) AS g_user, CAST(GROUPING(day) AS INT) AS g_day, user_id, day, count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value FROM (SELECT user_id, strftime(date_trunc('day', ts), $TS0) AS day, value FROM events) GROUP BY ROLLUP(user_id, day) ORDER BY g_user, g_day, user_id NULLS FIRST, day NULLS FIRST""",
    "agg_partial_final" ->
      s"""WITH hourly AS (SELECT user_id, date_trunc('hour', ts) AS hour, $DAVG AS hourly_avg FROM events GROUP BY 1, 2) SELECT user_id, max(hourly_avg) AS max_hourly_avg, count(*) AS n_hours FROM hourly GROUP BY user_id ORDER BY user_id""",
    "window_latest_per_key" ->
      s"""SELECT user_id, event_id, strftime(ts, $TS6) AS ts_s, event_type, value FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events) WHERE rn = 1 ORDER BY user_id""",
    "window_gap_to_prev" ->
      s"""SELECT event_id, user_id, strftime(ts, $TS6) AS ts_s, epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us FROM events ORDER BY event_id""",
    "window_moving_avg" ->
      "SELECT event_id, user_id, value, CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) / COUNT(value) OVER w AS moving_avg FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) ORDER BY event_id",
    "window_rank_hottest" ->
      s"""SELECT day_s, rnk, event_id, user_id, value FROM (SELECT strftime(date_trunc('day', ts), $TS0) AS day_s, rank() OVER (PARTITION BY date_trunc('day', ts) ORDER BY value DESC, event_id) AS rnk, event_id, user_id, value FROM events) WHERE rnk <= 5 ORDER BY day_s, rnk, event_id""",
    "sort_by_time" ->
      s"""SELECT event_id, strftime(ts, $TS6) AS ts_s, user_id, event_type, value FROM events ORDER BY ts_s, event_id""",
    "limit_head" ->
      s"""SELECT event_id, strftime(ts, $TS6) AS ts_s, user_id FROM events ORDER BY ts_s, event_id LIMIT 1""",
    "topk_recent_per_node" ->
      s"""SELECT user_id, rn, event_id, strftime(ts, $TS6) AS ts_s, value FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events) WHERE rn <= 3 ORDER BY user_id, rn""",
    "union_multi_file" ->
      "SELECT event_id, user_id, event_type FROM (SELECT * FROM events WHERE event_type = 'click' UNION ALL SELECT * FROM events WHERE event_type = 'error') ORDER BY event_id",
    "except_missing_nodes" ->
      "SELECT user_id FROM (SELECT DISTINCT user_id FROM events EXCEPT SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') ORDER BY user_id",
    "intersect_common_times" ->
      s"""SELECT strftime(hour, $TS0) AS hour_s FROM (SELECT DISTINCT date_trunc('hour', ts) AS hour FROM events WHERE event_type = 'click' INTERSECT SELECT DISTINCT date_trunc('hour', ts) AS hour FROM events WHERE event_type = 'purchase') ORDER BY hour_s""",
    "except_all_hours" ->
      s"""SELECT user_id, strftime(date_trunc('hour', ts), $TS0) AS hour_s FROM events WHERE event_type = 'click' EXCEPT ALL SELECT user_id, strftime(date_trunc('hour', ts), $TS0) FROM events WHERE event_type = 'error' ORDER BY user_id, hour_s""",
    "intersect_all_hours" ->
      s"""SELECT user_id, strftime(date_trunc('hour', ts), $TS0) AS hour_s FROM events WHERE event_type = 'click' INTERSECT ALL SELECT user_id, strftime(date_trunc('hour', ts), $TS0) FROM events WHERE event_type = 'purchase' ORDER BY user_id, hour_s""",
    "window_ntile_quartile" ->
      "SELECT event_id, event_type, value, CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS quartile FROM events ORDER BY event_id",
    "window_topk_hourly" ->
      s"""SELECT hour_s, rnk, event_type, n FROM (SELECT strftime(hour, $TS0) AS hour_s, event_type, n, CAST(row_number() OVER (PARTITION BY hour ORDER BY n DESC, event_type) AS BIGINT) AS rnk FROM (SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n FROM events GROUP BY 1, 2)) WHERE rnk <= 3 ORDER BY hour_s, rnk""",
    // z from exact integer power sums; the (x - sx/n) / sqrt(sxx/n - (sx/n)*(sx/n))
    // chain is spelled identically on both sides (fixed-order double ops)
    "window_zscore_hours" ->
      s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS x FROM events GROUP BY 1, 2), s AS (SELECT event_type, hour, x, count(*) OVER (PARTITION BY event_type) AS n, CAST(sum(CAST(x AS HUGEINT)) OVER (PARTITION BY event_type) AS DOUBLE) AS sx, CAST(sum(CAST(x*x AS HUGEINT)) OVER (PARTITION BY event_type) AS DOUBLE) AS sxx FROM h) SELECT event_type, strftime(hour, $TS0) AS hour_s, x, (x - sx/n) / sqrt(sxx/n - (sx/n)*(sx/n)) AS z FROM s WHERE (sxx/n - (sx/n)*(sx/n)) > 0 AND abs((x - sx/n) / sqrt(sxx/n - (sx/n)*(sx/n))) > 2.0 ORDER BY event_type, hour_s""",
    "multimodal_frame_energies" ->
      """WITH hx AS (SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n FROM documents), b AS (SELECT doc_id, i, (strpos('0123456789ABCDEF', substr(h, CAST(2*i+1 AS INT), 1)) - 1) * 16 + (strpos('0123456789ABCDEF', substr(h, CAST(2*i+2 AS INT), 1)) - 1) AS byte FROM (SELECT doc_id, h, unnest(range(n)) AS i FROM hx)), f AS (SELECT doc_id, i // 64 AS frame_no, count(*) AS cnt, sum(byte) AS s FROM b GROUP BY 1, 2) SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no, CAST(s AS DOUBLE) / 255.0 AS energy FROM f WHERE cnt = 64 AND frame_no % 2 = 0 ORDER BY doc_id, frame_no""",
    "dedup_exact" ->
      "SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies, md5(text) AS text_md5 FROM documents GROUP BY md5(text) ORDER BY keep_doc_id",
    "dedup_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents), sh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t)-1)]) s FROM toks WHERE len(t) >= 3), sz AS (SELECT doc_id, len(s) n FROM sh), ex AS (SELECT doc_id, unnest(s) sh FROM sh), posts AS (SELECT sh, count(*) df FROM ex GROUP BY sh HAVING count(*) BETWEEN 2 AND 1000), c AS (SELECT a.doc_id da, b.doc_id db, count(*) cnt FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id WHERE a.sh IN (SELECT sh FROM posts) GROUP BY 1, 2) SELECT da AS doc_a, db AS doc_b, CAST(cnt AS DOUBLE) / (sa.n + sb.n - cnt) AS jaccard FROM c JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id WHERE CAST(cnt AS DOUBLE) / (sa.n + sb.n - cnt) >= 0.3 ORDER BY doc_a, doc_b""",
    // asymmetric containment c/min(na,nb) over the same candidate core
    "dedup_containment" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents), sh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t)-1)]) s FROM toks WHERE len(t) >= 3), sz AS (SELECT doc_id, len(s) n FROM sh), ex AS (SELECT doc_id, unnest(s) sh FROM sh), posts AS (SELECT sh, count(*) df FROM ex GROUP BY sh HAVING count(*) BETWEEN 2 AND 1000), c AS (SELECT a.doc_id da, b.doc_id db, count(*) cnt FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id WHERE a.sh IN (SELECT sh FROM posts) GROUP BY 1, 2) SELECT da AS doc_a, db AS doc_b, CAST(sa.n AS INT) AS na, CAST(sb.n AS INT) AS nb, cnt AS c, CAST(cnt AS DOUBLE) / least(sa.n, sb.n) AS containment FROM c JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id WHERE CAST(cnt AS DOUBLE) / least(sa.n, sb.n) >= 0.8 ORDER BY doc_a, doc_b""",
    "dedup_clusters" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents), sh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t)-1)]) s FROM toks WHERE len(t) >= 3), sz AS (SELECT doc_id, len(s) n FROM sh), ex AS (SELECT doc_id, unnest(s) sh FROM sh), posts AS (SELECT sh, count(*) df FROM ex GROUP BY sh HAVING count(*) BETWEEN 2 AND 1000), c AS (SELECT a.doc_id da, b.doc_id db, count(*) cnt FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id WHERE a.sh IN (SELECT sh FROM posts) GROUP BY 1, 2), pairs AS (SELECT da, db FROM c JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id WHERE CAST(cnt AS DOUBLE) / (sa.n + sb.n - cnt) >= 0.3), edges AS (SELECT da AS src, db AS dst FROM pairs UNION ALL SELECT db, da FROM pairs), nodes AS (SELECT DISTINCT src AS id FROM edges), reach(id, r) AS (SELECT id, id FROM nodes UNION SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id) SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id ORDER BY doc_id""",
    "dedup_near_minhash" ->
      NEAR_MINHASH_SQL,
    "dedup_incremental" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents), sh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t)-1)]) s FROM toks WHERE len(t) >= 3), ex AS (SELECT doc_id, ('0x' || substr(md5(unnest(s)), 1, 16))::UBIGINT::HUGEINT AS u FROM sh), seeds AS (SELECT seed, ((2*seed + 1) * CAST('11400714819323198485' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT) AS a, (seed * CAST('14029467366897019727' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT) AS b FROM range(32) r(seed)), minsig AS (SELECT doc_id, seed, min(((u % 4294967296) * a + (((u // 4294967296) * a) % 4294967296) * 4294967296 + b) % CAST('18446744073709551616' AS HUGEINT)) AS mv FROM ex CROSS JOIN seeds GROUP BY doc_id, seed), bands AS (SELECT doc_id, seed // 4 AS band, string_agg(CAST(mv AS VARCHAR), ',' ORDER BY seed) AS key FROM minsig GROUP BY doc_id, seed // 4), cand AS (SELECT DISTINCT n.doc_id AS doc_id, e.doc_id AS store_id FROM bands n JOIN bands e ON n.band = e.band AND n.key = e.key WHERE n.doc_id % 2 = 1 AND e.doc_id % 2 = 0), ver AS (SELECT c.doc_id, c.store_id, CAST(len(list_intersect(sn.s, se.s)) AS DOUBLE) / (len(sn.s) + len(se.s) - len(list_intersect(sn.s, se.s))) AS jaccard FROM cand c JOIN sh sn ON c.doc_id = sn.doc_id JOIN sh se ON c.store_id = se.doc_id), near AS (SELECT doc_id, store_id AS near_dup_of, jaccard FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY store_id) AS rn FROM ver WHERE jaccard >= 0.3) WHERE rn = 1), store AS (SELECT md5(text) AS m, min(doc_id) AS exact_dup_of FROM documents WHERE doc_id % 2 = 0 GROUP BY md5(text)), exact AS (SELECT d.doc_id, s.exact_dup_of FROM documents d LEFT JOIN store s ON md5(d.text) = s.m WHERE d.doc_id % 2 = 1) SELECT e.doc_id, CASE WHEN e.exact_dup_of IS NOT NULL THEN 'exact_dup' WHEN n.near_dup_of IS NOT NULL THEN 'near_dup' ELSE 'new' END AS status, COALESCE(e.exact_dup_of, n.near_dup_of) AS dup_of, CASE WHEN e.exact_dup_of IS NULL THEN n.jaccard END AS jaccard FROM exact e LEFT JOIN near n USING (doc_id) ORDER BY doc_id""",
    "dedup_simhash" ->
      """WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM documents), dig AS (SELECT doc_id, p, strpos('0123456789abcdef', substr(md5(tok), p + 1, 1)) - 1 AS d FROM toks CROSS JOIN range(16) r(p)), bitv AS (SELECT doc_id, p, b, SUM(CASE WHEN (d >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v FROM dig CROSS JOIN range(4) r2(b) GROUP BY doc_id, p, b), sigd AS (SELECT doc_id, p, SUM(CASE WHEN v > 0 THEN (1 << b) ELSE 0 END) AS sd FROM bitv GROUP BY doc_id, p), sig AS (SELECT d.doc_id, coalesce(s.sl, [0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0]) AS sl FROM documents d LEFT JOIN (SELECT doc_id, list(sd ORDER BY p) AS sl FROM sigd GROUP BY doc_id) s USING (doc_id)) SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(list_sum(list_transform(range(1,17), i -> bit_count(xor(CAST(a.sl[i] AS BIGINT), CAST(b.sl[i] AS BIGINT))))) AS BIGINT) AS hamming FROM sig a JOIN sig b ON a.doc_id < b.doc_id WHERE list_sum(list_transform(range(1,17), i -> bit_count(xor(CAST(a.sl[i] AS BIGINT), CAST(b.sl[i] AS BIGINT))))) <= 6 ORDER BY doc_a, doc_b""",
    "dedup_embedding_cosine" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings), n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) nrm FROM e), p AS (SELECT a.vec_id va, b.vec_id vb, list_dot_product(a.v, b.v) / (a.nrm * b.nrm) c FROM n a JOIN n b ON a.vec_id < b.vec_id) SELECT va AS vec_a, vb AS vec_b, c AS cosine FROM p WHERE c >= 0.35 ORDER BY vec_a, vec_b""",
    // dot(a,b) and dot(b,a) are identical index-ordered folds, so the
    // directed pair can be computed from either orientation
    "sim_knn_join" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings), n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) nrm FROM e), p AS (SELECT a.vec_id src, b.vec_id dst, list_dot_product(a.v, b.v) / (a.nrm * b.nrm) c FROM n a JOIN n b ON a.vec_id <> b.vec_id), r AS (SELECT src, dst, c, CAST(row_number() OVER (PARTITION BY src ORDER BY c DESC, dst) AS BIGINT) AS rn FROM p) SELECT src AS vec_id, rn, dst AS neighbor_id, c AS cosine FROM r WHERE rn <= 5 ORDER BY vec_id, rn""",
    "sim_knn_join_lsh" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings), n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) nrm, (CASE WHEN v[1] > 0 THEN '1' ELSE '0' END || CASE WHEN v[2] > 0 THEN '1' ELSE '0' END || CASE WHEN v[3] > 0 THEN '1' ELSE '0' END || CASE WHEN v[4] > 0 THEN '1' ELSE '0' END || CASE WHEN v[5] > 0 THEN '1' ELSE '0' END || CASE WHEN v[6] > 0 THEN '1' ELSE '0' END) bucket FROM e), p AS (SELECT a.vec_id src, b.vec_id dst, list_dot_product(a.v, b.v) / (a.nrm * b.nrm) c FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id), r AS (SELECT src, dst, c, CAST(row_number() OVER (PARTITION BY src ORDER BY c DESC, dst) AS BIGINT) AS rn FROM p) SELECT src AS vec_id, rn, dst AS neighbor_id, c AS cosine FROM r WHERE rn <= 5 ORDER BY vec_id, rn""",
    "dedup_semantic_clusters" ->
      """WITH RECURSIVE e0 AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings), n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) nrm FROM e0), p AS (SELECT a.vec_id va, b.vec_id vb FROM n a JOIN n b ON a.vec_id < b.vec_id AND list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.35), edges AS (SELECT va AS src, vb AS dst FROM p UNION ALL SELECT vb, va FROM p), nodes AS (SELECT DISTINCT src AS id FROM edges), reach(id, r) AS (SELECT id, id FROM nodes UNION SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id) SELECT id AS vec_id, min(r) AS cluster_id FROM reach GROUP BY id ORDER BY vec_id""",
    "corpus_mix_report" ->
      """WITH c AS (SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars, CAST(sum(CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS BIGINT)) AS BIGINT) AS n_tokens FROM documents GROUP BY 1, 2) SELECT lang, source, n_docs, n_chars, n_tokens, CAST(CAST(n_docs AS HUGEINT) * 1000000000 // CAST(sum(n_docs) OVER () AS HUGEINT) AS BIGINT) AS doc_share_ppb, CAST(CAST(n_tokens AS HUGEINT) * 1000000000 // CAST(sum(n_tokens) OVER () AS HUGEINT) AS BIGINT) AS token_share_ppb FROM c ORDER BY lang, source""",
    // x*2^48 is an exact integer for float32 elements (|x| >= 2^-25), so the
    // DECIMAL(38,0) sum never rounds — Spark's HALF_UP vs DuckDB's truncating
    // double->decimal cast would diverge on a DECIMAL(38,12) spelling
    "agg_embedding_centroid" ->
      """WITH e AS (SELECT label, embedding::DOUBLE[] v FROM embeddings), d AS (SELECT label, CAST(i AS BIGINT) AS dim, v[CAST(i+1 AS INT)] AS x FROM (SELECT label, v, unnest(range(64)) AS i FROM e)) SELECT label, dim, CAST(SUM(CAST(x * 281474976710656.0 AS DECIMAL(38,0))) AS DOUBLE) / 281474976710656.0 / COUNT(*) AS centroid, COUNT(*) AS n FROM d GROUP BY label, dim ORDER BY label, dim""",
    "emb_centroid_drift" ->
      """WITH d AS (SELECT label, vec_id % 2 AS par, CAST(i AS BIGINT) AS dim, v[CAST(i+1 AS INT)] AS x FROM (SELECT label, vec_id, embedding::DOUBLE[] v, unnest(range(64)) AS i FROM embeddings)), c AS (SELECT label, par, dim, CAST(SUM(CAST(x * 281474976710656.0 AS DECIMAL(38,0))) AS DOUBLE) / 281474976710656.0 / COUNT(*) AS centroid FROM d GROUP BY 1, 2, 3) SELECT a.label, count(*) AS n_dims, max(abs(b.centroid - a.centroid)) AS max_abs_drift FROM c a JOIN c b ON a.label = b.label AND a.dim = b.dim AND a.par = 0 AND b.par = 1 GROUP BY 1 ORDER BY a.label""",
    "join_fuzzy_blocked" ->
      """WITH n AS (SELECT p_name, count(*) AS n_rows, split_part(p_name, ' ', 1) AS blk FROM part GROUP BY 1) SELECT a.p_name AS name_a, b.p_name AS name_b, CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist, a.n_rows AS n_a, b.n_rows AS n_b FROM n a JOIN n b ON a.blk = b.blk AND a.p_name < b.p_name WHERE levenshtein(a.p_name, b.p_name) <= 3 ORDER BY name_a, name_b""",
    // scale=max(|x|)/127 (selection + one divide), q=floor(x/scale+0.5)
    // clamped — every step a single correctly-rounded IEEE op; err_l1 sums
    // in DECIMAL(28,6) (Det.dsum)
    "emb_quantize_int8" ->
      """WITH d AS (SELECT vec_id, CAST(i AS BIGINT) AS dim, v[CAST(i+1 AS INT)] AS x FROM (SELECT vec_id, embedding::DOUBLE[] v, unnest(range(64)) AS i FROM embeddings)), m AS (SELECT vec_id, max(abs(x)) / 127 AS scale FROM d GROUP BY 1), q AS (SELECT d.vec_id, m.scale, CASE WHEN m.scale = 0 THEN 0 ELSE least(greatest(CAST(floor(x / m.scale + 0.5) AS BIGINT), -127), 127) END AS q, x FROM d JOIN m USING (vec_id)) SELECT vec_id, max(scale) AS scale, min(q) AS q_min, max(q) AS q_max, CAST(sum(q * q) AS BIGINT) AS q_norm2, CAST(SUM(CAST(abs(q * scale - x) AS DECIMAL(28,6))) AS DOUBLE) AS err_l1 FROM q GROUP BY vec_id ORDER BY vec_id""",
    "corpus_shuffle_order" ->
      """WITH h AS (SELECT doc_id, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT AS hkey FROM documents), s AS (SELECT doc_id, hkey, CAST(hkey % 8 AS BIGINT) AS shard FROM h) SELECT doc_id, shard, CAST(row_number() OVER (PARTITION BY shard ORDER BY hkey, doc_id) AS BIGINT) AS pos FROM s ORDER BY shard, pos""",
    "sim_search_cosine_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings), n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) nrm FROM e), p AS (SELECT q.vec_id query_id, c.vec_id vec_id, list_dot_product(q.v, c.v) / (q.nrm * c.nrm) cosine FROM n q JOIN n c ON c.vec_id != q.vec_id WHERE q.vec_id < 10), r AS (SELECT query_id, vec_id, cosine, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) rn FROM p) SELECT query_id, rn, vec_id, cosine FROM r WHERE rn <= 10 ORDER BY query_id, rn""",
    "sim_search_lsh_bucketed" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings), n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) nrm, (CASE WHEN v[1] > 0 THEN '1' ELSE '0' END || CASE WHEN v[2] > 0 THEN '1' ELSE '0' END || CASE WHEN v[3] > 0 THEN '1' ELSE '0' END || CASE WHEN v[4] > 0 THEN '1' ELSE '0' END || CASE WHEN v[5] > 0 THEN '1' ELSE '0' END || CASE WHEN v[6] > 0 THEN '1' ELSE '0' END) bucket FROM e), p AS (SELECT q.vec_id query_id, c.vec_id vec_id, list_dot_product(q.v, c.v) / (q.nrm * c.nrm) cosine FROM n q JOIN n c ON c.bucket = q.bucket AND c.vec_id != q.vec_id WHERE q.vec_id < 50), r AS (SELECT query_id, vec_id, cosine, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) rn FROM p) SELECT query_id, rn, vec_id, cosine FROM r WHERE rn <= 5 ORDER BY query_id, rn""",
    "sim_search_lsh_multiprobe" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings), n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) nrm, (CASE WHEN v[1] > 0 THEN '1' ELSE '0' END || CASE WHEN v[2] > 0 THEN '1' ELSE '0' END || CASE WHEN v[3] > 0 THEN '1' ELSE '0' END || CASE WHEN v[4] > 0 THEN '1' ELSE '0' END || CASE WHEN v[5] > 0 THEN '1' ELSE '0' END || CASE WHEN v[6] > 0 THEN '1' ELSE '0' END) bucket FROM e), probes AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, unnest([bucket] || [substr(bucket, 1, i - 1) || (CASE WHEN substr(bucket, i, 1) = '1' THEN '0' ELSE '1' END) || substr(bucket, i + 1) FOR i IN range(1, 7)]) AS bucket FROM n WHERE vec_id < 50), p AS (SELECT pr.query_id, c.vec_id, list_dot_product(pr.qv, c.v) / (pr.qn * c.nrm) cosine FROM n c JOIN probes pr ON c.bucket = pr.bucket AND c.vec_id != pr.query_id), r AS (SELECT query_id, vec_id, cosine, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) rn FROM p) SELECT query_id, rn, vec_id, cosine FROM r WHERE rn <= 5 ORDER BY query_id, rn""",
    "sim_search_ivf" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e), c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 16), a1 AS (SELECT n.vec_id, n.v, c0.cid, row_number() OVER (PARTITION BY n.vec_id ORDER BY list_dot_product(n.v, c0.cv) / (n.nrm * c0.cn) DESC, c0.cid) AS rk FROM n CROSS JOIN c0), s1 AS (SELECT cid AS cell, v FROM a1 WHERE rk = 1), d1 AS (SELECT cell, unnest(range(64)) AS i, v FROM s1), m1 AS (SELECT cell, i, CAST(SUM(CAST(v[CAST(i+1 AS INT)] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mx FROM d1 GROUP BY cell, i), c1l AS (SELECT cell AS cid, list(mx ORDER BY i) AS cv FROM m1 GROUP BY cell), c1 AS (SELECT c0.cid, COALESCE(c1l.cv, c0.cv) AS cv, sqrt(list_dot_product(COALESCE(c1l.cv, c0.cv), COALESCE(c1l.cv, c0.cv))) AS cn FROM c0 LEFT JOIN c1l ON c0.cid = c1l.cid), a2 AS (SELECT n.vec_id, n.v, c1.cid, row_number() OVER (PARTITION BY n.vec_id ORDER BY list_dot_product(n.v, c1.cv) / (n.nrm * c1.cn) DESC, c1.cid) AS rk FROM n CROSS JOIN c1), s2 AS (SELECT cid AS cell, v FROM a2 WHERE rk = 1), d2 AS (SELECT cell, unnest(range(64)) AS i, v FROM s2), m2 AS (SELECT cell, i, CAST(SUM(CAST(v[CAST(i+1 AS INT)] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mx FROM d2 GROUP BY cell, i), c2l AS (SELECT cell AS cid, list(mx ORDER BY i) AS cv FROM m2 GROUP BY cell), cf AS (SELECT c1.cid, COALESCE(c2l.cv, c1.cv) AS cv, sqrt(list_dot_product(COALESCE(c2l.cv, c1.cv), COALESCE(c2l.cv, c1.cv))) AS cn FROM c1 LEFT JOIN c2l ON c1.cid = c2l.cid), ac AS (SELECT n.vec_id, cf.cid, row_number() OVER (PARTITION BY n.vec_id ORDER BY list_dot_product(n.v, cf.cv) / (n.nrm * cf.cn) DESC, cf.cid) AS rk FROM n CROSS JOIN cf), assigned AS (SELECT n.vec_id, n.v, n.nrm, ac.cid AS cell FROM n JOIN ac ON n.vec_id = ac.vec_id AND ac.rk = 1), probes AS (SELECT n.vec_id AS query_id, n.v AS qv, n.nrm AS qn, ac.cid AS cell FROM n JOIN ac ON n.vec_id = ac.vec_id AND ac.rk <= 4 WHERE n.vec_id < 10), p AS (SELECT pr.query_id, a.vec_id, a.cell, list_dot_product(pr.qv, a.v) / (pr.qn * a.nrm) AS cosine FROM assigned a JOIN probes pr ON a.cell = pr.cell WHERE a.vec_id != pr.query_id), r AS (SELECT query_id, vec_id, cell, cosine, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn FROM p) SELECT query_id, rn, vec_id, cell, cosine FROM r WHERE rn <= 10 ORDER BY query_id, rn""",
    "text_tokenize_stats" ->
      "SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents) GROUP BY token ORDER BY n DESC, token LIMIT 100",
    "text_filter_lang" ->
      "SELECT doc_id, lang, source, n_chars FROM documents WHERE lang = 'en' ORDER BY doc_id",
    "text_langid" ->
      """WITH s AS (SELECT doc_id, lang AS true_lang, CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|a)\b')) AS BIGINT) en_n, CAST(len(regexp_extract_all(lower(text), '\b(el|la|de|que|los)\b')) AS BIGINT) es_n, CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS BIGINT) de_n, CAST(len(regexp_extract_all(lower(text), '\b(le|les|et|des|un)\b')) AS BIGINT) fr_n FROM documents) SELECT doc_id, true_lang, en_n, es_n, de_n, fr_n, CASE WHEN en_n >= es_n AND en_n >= de_n AND en_n >= fr_n THEN 'en' WHEN es_n >= de_n AND es_n >= fr_n THEN 'es' WHEN de_n >= fr_n THEN 'de' ELSE 'fr' END AS pred_lang FROM s ORDER BY doc_id""",
    "text_quality_score" ->
      """WITH s AS (SELECT doc_id, n_chars, len(regexp_extract_all(lower(text), '[a-z0-9]+')) n_tok, len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) n_stop, len(regexp_extract_all(text, '[0-9]')) n_digit FROM documents) SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens, CAST(n_chars AS DOUBLE) / greatest(n_tok, 1) AS avg_token_len, CAST(n_stop AS DOUBLE) / greatest(n_tok, 1) AS stopword_ratio, CAST(n_digit AS DOUBLE) / greatest(n_chars, 1) AS digit_ratio, (CASE WHEN n_tok >= 20 THEN 1.0 ELSE 0.0 END + CASE WHEN n_stop > 0 THEN 1.0 ELSE 0.0 END + (1.0 - CAST(n_digit AS DOUBLE) / greatest(n_chars, 1))) AS quality_score FROM s ORDER BY doc_id""",
    "text_token_count" ->
      """SELECT doc_id, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws_tokens, CAST(len(regexp_extract_all(lower(text), '[a-z0-9]{1,4}')) AS BIGINT) AS subword_tokens, n_chars FROM documents ORDER BY doc_id""",
    "text_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint FROM documents ORDER BY doc_id""",
    "text_pii_scrub" ->
      """WITH s AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS synth FROM documents) SELECT doc_id, CAST(len(regexp_extract_all(synth, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails, CAST(len(regexp_extract_all(synth, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS BIGINT) AS n_phones, CAST(len(regexp_extract_all(synth, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips, md5(regexp_replace(regexp_replace(regexp_replace(synth, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g'), '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')) AS scrubbed_md5 FROM s ORDER BY doc_id""",
    "sample_hash_split" ->
      """SELECT doc_id, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 100 AS bucket, CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 100 < 90 THEN 'train' WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 100 < 95 THEN 'val' ELSE 'test' END AS split FROM documents ORDER BY doc_id""",
    "sample_upweight" ->
      """WITH s AS (SELECT doc_id, (CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 20 THEN 1.0 ELSE 0.0 END + CASE WHEN len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) > 0 THEN 1.0 ELSE 0.0 END + (1.0 - CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / greatest(n_chars, 1))) AS q FROM documents), e AS (SELECT doc_id, CASE WHEN q >= 2.5 THEN 2 WHEN q >= 1.5 THEN 1 ELSE 0 END AS epochs FROM s) SELECT doc_id, CAST(epochs AS BIGINT) AS epochs, CAST(unnest(range(1, epochs + 1)) AS BIGINT) AS copy_id FROM e WHERE epochs > 0 ORDER BY doc_id, copy_id""",
    "sample_per_group" ->
      """SELECT lang, rn, doc_id, source FROM (SELECT lang, doc_id, source, row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn FROM documents) WHERE rn <= 50 ORDER BY lang, rn""",
    "events_sessionize" ->
      s"""WITH g AS (SELECT user_id, event_id, ts, epoch_us(ts) e_us, lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev_us FROM events), s AS (SELECT user_id, event_id, ts, CASE WHEN prev_us IS NULL OR e_us - prev_us > 21600000000 THEN 1 ELSE 0 END new_sess FROM g), t AS (SELECT user_id, event_id, ts, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) session_num FROM s) SELECT user_id, session_num, strftime(min(ts), $TS6) AS session_start_s, strftime(max(ts), $TS6) AS session_end_s, count(*) AS n_events FROM t GROUP BY user_id, session_num ORDER BY user_id, session_num""",
    "multimodal_extract_meta" ->
      "SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 'image/fake' ELSE 'audio/fake' END AS media_type, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, md5(text) AS content_md5 FROM documents ORDER BY doc_id",
    "corpus_prep_pipeline" ->
      """WITH s AS (SELECT doc_id, lang, text, n_chars, len(regexp_extract_all(lower(text), '[a-z0-9]+')) n_tok, len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) n_stop, len(regexp_extract_all(text, '[0-9]')) n_digit FROM documents), g AS (SELECT doc_id, lang, text, CAST(n_tok AS BIGINT) AS n_tokens, (CASE WHEN n_tok >= 20 THEN 1.0 ELSE 0.0 END + CASE WHEN n_stop > 0 THEN 1.0 ELSE 0.0 END + (1.0 - CAST(n_digit AS DOUBLE) / greatest(n_chars, 1))) AS quality_score FROM s WHERE (CASE WHEN n_tok >= 20 THEN 1.0 ELSE 0.0 END + CASE WHEN n_stop > 0 THEN 1.0 ELSE 0.0 END + (1.0 - CAST(n_digit AS DOUBLE) / greatest(n_chars, 1))) >= 2.0), d AS (SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM g) SELECT doc_id, lang, n_tokens, quality_score, CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 100 < 90 THEN 'train' WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 100 < 95 THEN 'val' ELSE 'test' END AS split FROM d WHERE doc_id = keep_id ORDER BY doc_id""",
    "multimodal_fake_features" ->
      """WITH hx AS (SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n FROM documents), b AS (SELECT doc_id, i, (strpos('0123456789ABCDEF', substr(h, CAST(2*i+1 AS INT), 1)) - 1) * 16 + (strpos('0123456789ABCDEF', substr(h, CAST(2*i+2 AS INT), 1)) - 1) AS byte FROM (SELECT doc_id, h, unnest(range(n)) AS i FROM hx)), feat AS (SELECT doc_id, CAST(sum(CASE WHEN i % 8 = 0 THEN byte ELSE 0 END) AS DOUBLE) / 255.0 AS f0, CAST(sum(CASE WHEN i % 8 = 1 THEN byte ELSE 0 END) AS DOUBLE) / 255.0 AS f1 FROM b GROUP BY doc_id), chk AS (SELECT doc_id, list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT), list(CAST(byte AS HUGEINT) ORDER BY i)), (h, x) -> (31*h + x) % CAST('18446744073709551616' AS HUGEINT)) AS hu FROM b GROUP BY doc_id) SELECT d.doc_id, CASE WHEN d.doc_id % 2 = 0 THEN 'image/fake' ELSE 'audio/fake' END AS media_type, CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes, CAST(CASE WHEN coalesce(c.hu, 1125899906842597) >= CAST('9223372036854775808' AS HUGEINT) THEN coalesce(c.hu, 1125899906842597) - CAST('18446744073709551616' AS HUGEINT) ELSE coalesce(c.hu, 1125899906842597) END AS BIGINT) AS checksum, coalesce(f.f0, 0.0) AS f0, coalesce(f.f1, 0.0) AS f1 FROM documents d LEFT JOIN feat f USING (doc_id) LEFT JOIN chk c USING (doc_id) ORDER BY doc_id""",
    "clean_pipeline" ->
      s"""SELECT event_id, strftime(timezone('America/Los_Angeles', timezone('UTC', TRY_CAST(strftime(ts, $TS6) AS TIMESTAMP))), $TS0) AS pacific_time, round(TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE), 3) AS value_r FROM events WHERE event_type IN ('click', 'view') AND TRY_CAST(strftime(ts, $TS6) AS TIMESTAMP) IS NOT NULL ORDER BY event_id""",
    "snapshot_diff" ->
      s"""WITH a AS (SELECT user_id, count(*) AS n_before, max(ts) AS last_before FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1), b AS (SELECT user_id, count(*) AS n_after, max(ts) AS last_after FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1) SELECT coalesce(a.user_id, b.user_id) AS user_id, coalesce(a.n_before, 0) AS n_before, coalesce(b.n_after, 0) AS n_after, strftime(a.last_before, $TS6) AS last_before_s, strftime(b.last_after, $TS6) AS last_after_s, CASE WHEN a.user_id IS NULL THEN 'added' WHEN b.user_id IS NULL THEN 'removed' WHEN a.n_before = b.n_after THEN 'same' ELSE 'changed' END AS status FROM a FULL JOIN b ON a.user_id = b.user_id ORDER BY user_id""",
    // bloom prefilter is exact (no false negatives + exact post-join), so
    // the oracle is the PLAIN join — the filter must be invisible in results
    "join_bloom_prefilter" ->
      "SELECT o.o_orderkey, o.o_custkey, c.c_name FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_mktsegment = 'BUILDING' ORDER BY o.o_orderkey",
    "join_star_rollup" ->
      "SELECT r.r_name, n.n_name, count(*) AS n_orders, CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey JOIN nation n ON c.c_nationkey = n.n_nationkey JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY 1, 2 ORDER BY r_name, n_name",
    // TPC-H-shaped suite: every sum is DECIMAL(28,6)-accumulated, every
    // per-row price chain is spelled in the same fixed operator order as
    // the Spark plan, so all seven hash-match
    "tpch_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty, CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge, CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty, CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price, CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc, count(*) AS count_order FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' GROUP BY 1, 2 ORDER BY 1, 2""",
    "tpch_shipping_priority" ->
      s"""SELECT o.o_orderkey, strftime(o.o_orderdate, $TS0) AS o_orderdate_s, o.o_orderpriority, CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00' AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00' GROUP BY 1, 2, 3 ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "tpch_local_supplier_volume" ->
      """SELECT n.n_name, CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue, count(*) AS n_items FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey JOIN supplier s ON l.l_suppkey = s.s_suppkey JOIN nation n ON s.s_nationkey = n.n_nationkey JOIN region r ON n.n_regionkey = r.r_regionkey JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00' GROUP BY 1 ORDER BY revenue DESC, n_name""",
    "tpch_revenue_forecast" ->
      "SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue, count(*) AS n_items FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24",
    "tpch_promo_revenue" ->
      """WITH j AS (SELECT l.l_extendedprice, l.l_discount, p.p_type FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00' AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'), s AS (SELECT CAST(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE) AS promo_revenue, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue, count(*) AS n_items FROM j) SELECT promo_revenue, total_revenue, n_items, 100.0 * promo_revenue / total_revenue AS promo_share_pct FROM s""",
    "tpch_late_shipment_priority" ->
      "SELECT o_orderpriority, count(*) AS n_late_orders FROM orders o WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00' AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00' AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) GROUP BY 1 ORDER BY 1",
    "tpch_returned_revenue" ->
      """WITH rev AS (SELECT o.o_custkey, CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue, count(*) AS n_returned_items FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey WHERE l.l_returnflag = 'R' AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00' GROUP BY 1) SELECT c.c_custkey, c.c_name, c.c_acctbal, rev.revenue, rev.n_returned_items FROM rev JOIN customer c ON rev.o_custkey = c.c_custkey ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "tpch_nation_trade_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, year(l.l_shipdate) AS ship_year, CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue, count(*) AS n_items FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey JOIN supplier s ON l.l_suppkey = s.s_suppkey JOIN customer c ON o.o_custkey = c.c_custkey JOIN nation n1 ON s.s_nationkey = n1.n_nationkey JOIN nation n2 ON c.c_nationkey = n2.n_nationkey WHERE (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_11') OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_7') GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "tpch_market_share" ->
      """WITH j AS (SELECT year(o.o_orderdate) AS order_year, n1.n_name AS supp_nation, l.l_extendedprice, l.l_discount FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey JOIN orders o ON l.l_orderkey = o.o_orderkey JOIN customer c ON o.o_custkey = c.c_custkey JOIN nation n2 ON c.c_nationkey = n2.n_nationkey JOIN region r ON n2.n_regionkey = r.r_regionkey JOIN supplier s ON l.l_suppkey = s.s_suppkey JOIN nation n1 ON s.s_nationkey = n1.n_nationkey WHERE p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'), a AS (SELECT order_year, CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_7' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE) AS nation_revenue, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue, count(*) AS n_items FROM j GROUP BY 1) SELECT order_year, nation_revenue, total_revenue, n_items, nation_revenue / total_revenue AS mkt_share FROM a ORDER BY order_year""",
    "tpch_customer_distribution" ->
      """WITH oc AS (SELECT o_custkey, count(*) AS c_count FROM orders GROUP BY 1) SELECT COALESCE(oc.c_count, 0) AS c_count, count(*) AS custdist FROM customer c LEFT JOIN oc ON c.c_custkey = oc.o_custkey GROUP BY 1 ORDER BY custdist DESC, c_count DESC""",
    "tpch_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' GROUP BY 1) SELECT r.l_suppkey AS s_suppkey, s.s_name, r.total_revenue FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev) ORDER BY s_suppkey""",
    "tpch_small_qty_revenue" ->
      """WITH w AS (SELECT l.l_quantity, l.l_extendedprice, CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,6))) OVER (PARTITION BY l.l_partkey) AS DOUBLE) / COUNT(l.l_quantity) OVER (PARTITION BY l.l_partkey) AS avg_qty FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey WHERE p.p_brand = 'Brand#4') SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0 AS avg_yearly, count(*) AS n_items FROM w WHERE l_quantity < 0.2 * avg_qty""",
    "tpch_big_order_customers" ->
      s"""WITH big AS (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty FROM lineitem GROUP BY 1 HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) > 250) SELECT c.c_name, c.c_custkey, o.o_orderkey, strftime(o.o_orderdate, $TS0) AS o_orderdate_s, o.o_totalprice, big.total_qty FROM big JOIN orders o ON big.l_orderkey = o.o_orderkey JOIN customer c ON o.o_custkey = c.c_custkey ORDER BY total_qty DESC, o_orderkey""",
    "tpch_bracket_revenue" ->
      """WITH j AS (SELECT CASE WHEN p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20 THEN 'bracket_1' WHEN p.p_brand = 'Brand#19' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 30 THEN 'bracket_2' ELSE 'bracket_3' END AS bracket, l.l_extendedprice, l.l_discount, l.l_quantity FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey WHERE (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20) OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 30) OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 40)) SELECT bracket, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue, CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty, count(*) AS n_items FROM j GROUP BY 1 ORDER BY 1""",
    "tpch_part_value_concentration" ->
      """WITH pv AS (SELECT l_partkey, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS part_value, count(*) AS n_items FROM lineitem GROUP BY 1), t AS (SELECT CAST(SUM(CAST(part_value AS DECIMAL(28,6))) AS DOUBLE) AS total_value FROM pv) SELECT pv.l_partkey, pv.part_value, pv.n_items, t.total_value FROM pv, t WHERE pv.part_value > 0.00075 * t.total_value ORDER BY part_value DESC, l_partkey""",
    "agg_distinct_union_kmv" ->
      """WITH h AS (SELECT DISTINCT event_type, user_id, ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT::DOUBLE / 18446744073709551616.0 AS h FROM events WHERE event_type IN ('click', 'purchase')), r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h), th AS (SELECT event_type, CASE WHEN count(*) < 64 THEN 1.0 ELSE max(CASE WHEN rn = 64 THEN h END) END AS theta FROM r GROUP BY 1), t AS (SELECT min(theta) AS theta FROM th), us AS (SELECT count(*) AS n_union_sample FROM (SELECT DISTINCT user_id, h FROM r WHERE rn <= 64) u, t WHERE u.h < t.theta), ex AS (SELECT count(DISTINCT user_id) AS n_exact FROM events WHERE event_type IN ('click', 'purchase')) SELECT CAST(64 AS BIGINT) AS k, t.theta, us.n_union_sample, CAST(us.n_union_sample AS DOUBLE) / t.theta AS est_union, ex.n_exact, CAST(us.n_union_sample AS DOUBLE) / t.theta - CAST(ex.n_exact AS DOUBLE) AS err FROM us, t, ex""",
    "stat_chi_square" ->
      """WITH cells0 AS (SELECT event_type, hour(ts) // 6 AS daypart, count(*) AS o0 FROM events GROUP BY 1, 2), cells AS (SELECT t.event_type, p.daypart, COALESCE(c.o0, 0) AS o FROM (SELECT DISTINCT event_type FROM cells0) t CROSS JOIN (SELECT DISTINCT daypart FROM cells0) p LEFT JOIN cells0 c ON c.event_type = t.event_type AND c.daypart = p.daypart), m AS (SELECT o, sum(o) OVER () AS g, CAST(sum(o) OVER (PARTITION BY event_type) AS DOUBLE) * CAST(sum(o) OVER (PARTITION BY daypart) AS DOUBLE) / CAST(sum(o) OVER () AS DOUBLE) AS e FROM cells), t AS (SELECT g, CAST(floor((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e * 1048576.0) AS BIGINT) AS term_q20 FROM m) SELECT count(*) AS n_cells, CAST(max(g) AS BIGINT) AS n_events, CAST(sum(term_q20) AS BIGINT) AS chi2_q20, CAST(sum(term_q20) AS DOUBLE) / 1048576.0 AS chi2 FROM t""",
    "stat_gini_revenue" ->
      """WITH pc AS (SELECT o_custkey, CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100 AS DECIMAL(38,0)) AS BIGINT) AS rev_cents FROM orders GROUP BY 1), r AS (SELECT rev_cents, row_number() OVER (ORDER BY rev_cents, o_custkey) * rev_cents AS w FROM pc), a AS (SELECT count(*) AS n_customers, CAST(sum(rev_cents) AS BIGINT) AS total_cents, CAST(SUM(CAST(w AS DECIMAL(38,0))) AS DOUBLE) AS wsum FROM r) SELECT n_customers, CAST(total_cents AS DOUBLE) / 100.0 AS total_revenue, 2.0 * wsum / (CAST(n_customers AS DOUBLE) * CAST(total_cents AS DOUBLE)) - (CAST(n_customers AS DOUBLE) + 1.0) / CAST(n_customers AS DOUBLE) AS gini FROM a""",
    "ts_interval_union" ->
      """WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s_us, epoch_us(ts) + 1800000000 AS e_us FROM events), w AS (SELECT *, max(e_us) OVER (PARTITION BY user_id ORDER BY s_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme FROM iv), f AS (SELECT *, CASE WHEN pme IS NULL OR s_us > pme THEN 1 ELSE 0 END AS is_new FROM w), g AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY s_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island FROM f) SELECT user_id, island, min(s_us) AS start_us, max(e_us) AS end_us, (max(e_us) - min(s_us)) // 1000000 AS duration_s, count(*) AS n_events FROM g GROUP BY 1, 2 ORDER BY user_id, island""",
    "graph_triangles" ->
      """WITH active AS (SELECT DISTINCT user_id, date_trunc('minute', ts) AS hr FROM events), edges AS (SELECT DISTINCT x.user_id AS a, y.user_id AS b FROM active x JOIN active y ON x.hr = y.hr AND x.user_id < y.user_id), tri AS (SELECT count(*) AS n_triangles FROM (SELECT e1.a AS wa, e2.b AS wc FROM edges e1 JOIN edges e2 ON e1.b = e2.a) w JOIN edges e3 ON w.wa = e3.a AND w.wc = e3.b), deg AS (SELECT v, count(*) AS deg FROM (SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges) GROUP BY 1), wt AS (SELECT CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges FROM deg), ec AS (SELECT count(*) AS n_edges FROM edges) SELECT ec.n_edges, tri.n_triangles, wt.n_wedges, CASE WHEN wt.n_wedges = 0 THEN 0.0 ELSE 3.0 * CAST(tri.n_triangles AS DOUBLE) / CAST(wt.n_wedges AS DOUBLE) END AS clustering_coeff FROM ec, tri, wt""",
    "graph_link_jaccard" ->
      """WITH active AS (SELECT DISTINCT user_id, date_trunc('minute', ts) AS hr FROM events), edges AS (SELECT DISTINCT x.user_id AS a, y.user_id AS b FROM active x JOIN active y ON x.hr = y.hr AND x.user_id < y.user_id), nbrs AS (SELECT a AS v, b AS w FROM edges UNION ALL SELECT b AS v, a AS w FROM edges), deg AS (SELECT v, count(*) AS deg FROM nbrs GROUP BY 1), cmn AS (SELECT n1.v AS a, n2.v AS b, count(*) AS common FROM nbrs n1 JOIN nbrs n2 ON n1.w = n2.w AND n1.v < n2.v GROUP BY 1, 2), cand AS (SELECT c.* FROM cmn c LEFT JOIN edges e ON c.a = e.a AND c.b = e.b WHERE e.a IS NULL), sc AS (SELECT cand.a, cand.b, common, da.deg + db.deg - common AS union_n, CAST(common AS DOUBLE) / CAST(da.deg + db.deg - common AS DOUBLE) AS jaccard FROM cand JOIN deg da ON cand.a = da.v JOIN deg db ON cand.b = db.v), r AS (SELECT *, row_number() OVER (ORDER BY jaccard DESC, a, b) AS rn FROM sc) SELECT CAST(rn AS BIGINT) AS rn, a, b, common, union_n, jaccard FROM r WHERE rn <= 20 ORDER BY rn""",
    "stat_ks_drift" ->
      """WITH cells AS (SELECT event_type, value, CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS d1, CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS d2 FROM events WHERE value IS NOT NULL GROUP BY 1, 2), cdf AS (SELECT *, CAST(sum(d1) OVER (PARTITION BY event_type ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c1, CAST(sum(d2) OVER (PARTITION BY event_type ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c2, CAST(sum(d1) OVER (PARTITION BY event_type) AS BIGINT) AS n1, CAST(sum(d2) OVER (PARTITION BY event_type) AS BIGINT) AS n2 FROM cells), g AS (SELECT *, abs(c1 * n2 - c2 * n1) AS gap FROM cdf), r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY gap DESC, value) AS rn FROM g) SELECT event_type, n1, n2, gap AS ks_num, CASE WHEN n1 = 0 OR n2 = 0 THEN NULL ELSE CAST(gap AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) END AS ks_d, value AS at_value FROM r WHERE rn = 1 ORDER BY event_type""",
    "stat_mann_kendall" ->
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day, CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value) AS v FROM events WHERE value IS NOT NULL GROUP BY 1, 2), sp AS (SELECT l.user_id, CAST(SUM(CASE WHEN r.v > l.v THEN 1 WHEN r.v < l.v THEN -1 ELSE 0 END) AS BIGINT) AS s FROM daily l JOIN daily r ON l.user_id = r.user_id AND l.day < r.day GROUP BY 1), tg AS (SELECT user_id, v, count(*) AS t FROM daily GROUP BY 1, 2), ties AS (SELECT user_id, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18, CAST(SUM(t) AS BIGINT) AS n_days FROM tg GROUP BY 1), m AS (SELECT ties.user_id, n_days, COALESCE(sp.s, 0) AS s, n_days * (n_days - 1) * (2 * n_days + 5) - tie18 AS var18 FROM ties LEFT JOIN sp ON ties.user_id = sp.user_id), zc AS (SELECT *, CASE WHEN var18 = 0 THEN NULL WHEN s > 0 THEN (s - 1) / sqrt(var18 / 18.0) WHEN s < 0 THEN (s + 1) / sqrt(var18 / 18.0) ELSE 0.0 END AS z FROM m) SELECT user_id, n_days, s, var18, z, CASE WHEN z IS NULL OR abs(z) < 1.96 THEN 'no_trend' WHEN z > 0 THEN 'increasing' ELSE 'decreasing' END AS trend FROM zc ORDER BY user_id""",
    "agg_rolling_distinct" ->
      """WITH activity AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events), days AS (SELECT DISTINCT d AS obs FROM activity), fan AS (SELECT a.user_id, t.i, CAST(a.d + t.i * INTERVAL 1 DAY AS DATE) AS obs FROM activity a, (SELECT unnest(range(7)) AS i) t), j AS (SELECT f.user_id, f.i, f.obs FROM fan f JOIN days dd ON f.obs = dd.obs) SELECT strftime(obs, '%Y-%m-%d') AS day, CAST(count(DISTINCT CASE WHEN i = 0 THEN user_id END) AS BIGINT) AS n_active_1d, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_7d, CAST(count(DISTINCT CASE WHEN i = 0 THEN user_id END) AS DOUBLE) / CAST(count(DISTINCT user_id) AS DOUBLE) AS stickiness FROM j GROUP BY obs ORDER BY day""",
    "union_schema_evolve" ->
      """WITH u AS (SELECT event_id, ts, user_id, event_type, value FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00' UNION ALL BY NAME SELECT event_id, ts, user_id, event_type, 2::BIGINT AS schema_ver FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00') SELECT COALESCE(schema_ver, 1) AS schema_ver, count(*) AS n_rows, count(value) AS n_value_present, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM u GROUP BY 1 ORDER BY schema_ver""",
    "window_position_profile" ->
      """SELECT user_id, event_id, value, cume_dist() OVER w AS cume, nth_value(value, 2) OVER w AS second_value, lead(value, 2, -1.0) OVER w AS lead2_or_sentinel FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) ORDER BY user_id, event_id""",
    "text_rules_filter" ->
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents), stats AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_words, COALESCE(CAST(list_sum(list_transform(t, w -> length(w))) AS BIGINT), 0) AS sum_len FROM tok), topn AS (SELECT doc_id, CAST(max(n) AS BIGINT) AS top_n FROM (SELECT doc_id, w, count(*) AS n FROM (SELECT doc_id, unnest(t) AS w FROM tok) GROUP BY 1, 2) GROUP BY 1), m AS (SELECT s.doc_id, s.n_words, s.sum_len, COALESCE(t2.top_n, 0) AS top_n FROM stats s LEFT JOIN topn t2 ON s.doc_id = t2.doc_id) SELECT doc_id, n_words, sum_len, top_n, CASE WHEN n_words < 5 THEN 'too_short' WHEN n_words > 5000 THEN 'too_long' WHEN sum_len < n_words * 3 THEN 'word_len_low' WHEN sum_len > n_words * 12 THEN 'word_len_high' WHEN top_n * 5 > n_words THEN 'repetitive' ELSE 'pass' END AS verdict FROM m ORDER BY doc_id""",
    "events_burst_users" ->
      s"""WITH bm AS (SELECT user_id, date_trunc('minute', ts) AS minute, count(*) AS n FROM events GROUP BY 1, 2), pk AS (SELECT user_id, max(n) AS peak_per_minute FROM bm GROUP BY 1), fp AS (SELECT bm.user_id, pk.peak_per_minute, min(bm.minute) AS first_peak FROM bm JOIN pk ON bm.user_id = pk.user_id AND bm.n = pk.peak_per_minute GROUP BY 1, 2) SELECT user_id, peak_per_minute, strftime(first_peak, $TS0) AS first_peak_minute FROM fp WHERE peak_per_minute >= 4 ORDER BY user_id""",
    "stat_benford" ->
      """WITH d AS (SELECT substr(CAST(CAST(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100 AS DECIMAL(38,0)) AS BIGINT) AS VARCHAR), 1, 1) AS digit FROM lineitem), g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1), s AS (SELECT digit, n, CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS share FROM g), e AS (SELECT *, CASE digit WHEN '1' THEN 0.3010299956639812 WHEN '2' THEN 0.17609125905568124 WHEN '3' THEN 0.12493873660829992 WHEN '4' THEN 0.09691001300805642 WHEN '5' THEN 0.07918124604762482 WHEN '6' THEN 0.06694678963061322 WHEN '7' THEN 0.05799194697768673 WHEN '8' THEN 0.05115252244738129 WHEN '9' THEN 0.04575749056067514 ELSE 0.0 END AS benford_p FROM s) SELECT digit, n, share, benford_p, share - benford_p AS deviation FROM e ORDER BY digit""",
    "snapshot_upsert" ->
      s"""WITH b AS (SELECT user_id, value AS base_value, ts AS base_ts FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00') WHERE rn = 1), d AS (SELECT user_id, value AS delta_value, ts AS delta_ts FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00') WHERE rn = 1) SELECT COALESCE(b.user_id, d.user_id) AS user_id, CASE WHEN b.base_ts IS NULL THEN 'inserted' WHEN d.delta_ts IS NULL THEN 'kept' ELSE 'updated' END AS action, COALESCE(d.delta_value, b.base_value) AS value, strftime(COALESCE(d.delta_ts, b.base_ts), $TS6) AS state_ts_s, b.base_value AS prev_value FROM b FULL OUTER JOIN d ON b.user_id = d.user_id ORDER BY user_id""",
    "ts_downsample_ltob" ->
      s"""WITH pts AS (SELECT user_id, event_id, epoch_us(ts) AS x, value AS y, epoch_us(ts) // 3600000000 AS bucket FROM events), c0 AS (SELECT user_id, bucket, SUM(CAST(x AS HUGEINT)) AS sx, count(*) AS cn, CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) / COUNT(y) AS cy FROM pts GROUP BY 1, 2), c AS (SELECT user_id, bucket, ${D2D("sx")} / cn AS cx, cy FROM c0), nb AS (SELECT user_id, bucket, lag(cx) OVER w AS lx, lag(cy) OVER w AS ly, lead(cx) OVER w AS rx, lead(cy) OVER w AS ry FROM c WINDOW w AS (PARTITION BY user_id ORDER BY bucket)), j AS (SELECT p.user_id, p.bucket, p.event_id, p.x, p.y, nb.lx, nb.rx, abs((nb.lx - nb.rx) * (p.y - nb.ly) - (nb.lx - CAST(p.x AS DOUBLE)) * (nb.ry - nb.ly)) AS area FROM pts p JOIN nb USING (user_id, bucket)), r AS (SELECT *, row_number() OVER (PARTITION BY user_id, bucket ORDER BY area DESC, x, event_id) AS rn_area, row_number() OVER (PARTITION BY user_id, bucket ORDER BY x, event_id) AS rn_first, row_number() OVER (PARTITION BY user_id, bucket ORDER BY x DESC, event_id DESC) AS rn_last FROM j) SELECT user_id, bucket, event_id, strftime(make_timestamp(x), $TS6) AS ts_s, y AS value, area FROM r WHERE CASE WHEN lx IS NULL THEN rn_first = 1 WHEN rx IS NULL THEN rn_last = 1 ELSE rn_area = 1 END ORDER BY user_id, bucket""",
    "ts_downsample_lttb" ->
      s"""WITH RECURSIVE pts AS (SELECT user_id, event_id, epoch_us(ts) AS x, value AS y, epoch_us(ts) // 3600000000 AS bucket FROM events), bk AS (SELECT user_id, bucket, CAST(row_number() OVER (PARTITION BY user_id ORDER BY bucket) - 1 AS BIGINT) AS bi, CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS nb FROM (SELECT DISTINCT user_id, bucket FROM pts)), cent0 AS (SELECT user_id, bucket, SUM(CAST(x AS HUGEINT)) AS sx, count(*) AS cn, CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) / COUNT(y) AS cy FROM pts GROUP BY 1, 2), cent AS (SELECT user_id, bucket, ${D2D("sx")} / cn AS cx, cy FROM cent0), p AS (SELECT pts.user_id, pts.event_id, pts.x, pts.y, pts.bucket, bk.bi, bk.nb FROM pts JOIN bk USING (user_id, bucket)), f0 AS (SELECT user_id, bi, nb, bucket, event_id, x, y FROM (SELECT p.*, row_number() OVER (PARTITION BY user_id ORDER BY x, event_id) AS rn FROM p WHERE bi = 0) WHERE rn = 1), rec AS (SELECT user_id, bi, nb, bucket, event_id, x, y, CAST(NULL AS DOUBLE) AS area FROM f0 UNION ALL SELECT user_id, bi, nb, bucket, event_id, x, y, CASE WHEN is_last THEN NULL ELSE area END AS area FROM (SELECT q.*, row_number() OVER (PARTITION BY q.user_id ORDER BY CASE WHEN q.is_last THEN -CAST(q.x AS DOUBLE) ELSE -q.area END, CASE WHEN q.is_last THEN -q.event_id ELSE q.x END, q.event_id) AS rn FROM (SELECT c.user_id, c.bi, c.nb, c.bucket, c.event_id, c.x, c.y, c.bi = c.nb - 1 AS is_last, abs((CAST(r.x AS DOUBLE) - nc.cx) * (c.y - r.y) - (CAST(r.x AS DOUBLE) - CAST(c.x AS DOUBLE)) * (nc.cy - r.y)) AS area FROM rec r JOIN p c ON c.user_id = r.user_id AND c.bi = r.bi + 1 LEFT JOIN bk nbk ON nbk.user_id = c.user_id AND nbk.bi = c.bi + 1 LEFT JOIN cent nc ON nc.user_id = c.user_id AND nc.bucket = nbk.bucket) q) WHERE rn = 1) SELECT user_id, bucket, event_id, strftime(make_timestamp(x), $TS6) AS ts_s, y AS value, area FROM rec ORDER BY user_id, bucket""",
    "stat_moments_per_type" ->
      s"""WITH c0 AS (SELECT event_type, CAST(CAST(CAST(value AS DECIMAL(28,2)) * 100 AS DECIMAL(38,0)) AS HUGEINT) AS c FROM events), r0 AS (SELECT event_type, count(*) AS n, SUM(c) AS r1, SUM(c * c) AS r2, SUM(c * c * c) AS r3, SUM(c * c * c * c) AS r4 FROM c0 GROUP BY 1), s AS (SELECT event_type, n, ${D2D("r1")} AS s1, ${D2D("r2")} AS s2, ${D2D("r3")} AS s3, ${D2D("r4")} AS s4 FROM r0), m AS (SELECT event_type, n, s1 / n AS mean, s1, s2, s3, s4 FROM s), t AS (SELECT *, s2 / n - mean * mean AS m2, s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean * mean * mean AS m3, s4 / n - 4.0 * mean * (s3 / n) + 6.0 * mean * mean * (s2 / n) - 3.0 * mean * mean * mean * mean AS m4 FROM m) SELECT event_type, n, mean / 100.0 AS mean, m2 / 10000.0 AS variance, CASE WHEN m2 > 0 THEN m3 / (m2 * sqrt(m2)) END AS skewness, CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3.0 END AS kurtosis_excess FROM t ORDER BY event_type""",
    "window_hampel" ->
      """WITH o AS (SELECT event_id, user_id, ts, value, CAST(CAST(CAST(value AS DECIMAL(28,2)) * 100 AS DECIMAL(38,0)) AS BIGINT) AS cents FROM events), wa AS (SELECT *, list_sort(list(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)) AS warr FROM o), m AS (SELECT *, len(warr) AS wn FROM wa), m2 AS (SELECT *, warr[CAST((wn - 1) // 2 + 1 AS INT)] + warr[CAST(wn // 2 + 1 AS INT)] AS med2 FROM m), d AS (SELECT *, list_sort([abs(x * 2 - med2) FOR x IN warr]) AS darr FROM m2), z AS (SELECT *, darr[CAST((wn - 1) // 2 + 1 AS INT)] + darr[CAST(wn // 2 + 1 AS INT)] AS mad2, abs(cents * 2 - med2) AS dev2 FROM d), f AS (SELECT *, CAST(dev2 * 2 AS DOUBLE) > 1.4826 * mad2 * 3.0 AS is_outlier FROM z) SELECT event_id, user_id, value, CASE WHEN is_outlier THEN CAST(med2 AS DOUBLE) / 200.0 ELSE value END AS filtered_value, is_outlier FROM f ORDER BY event_id""",
    "window_drawdown" ->
      s"""WITH o AS (SELECT event_id, user_id, ts, value, CAST(CAST(CAST(value AS DECIMAL(28,2)) * 100 AS DECIMAL(38,0)) AS BIGINT) AS cents FROM events), w AS (SELECT *, max(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_c FROM o) SELECT event_id, user_id, strftime(ts, $TS6) AS ts_s, value, CAST(peak_c AS DOUBLE) / 100.0 AS peak_value, peak_c - cents AS drawdown_cents, CASE WHEN peak_c > 0 THEN CAST(CAST(peak_c - cents AS HUGEINT) * 1000000000 // CAST(peak_c AS HUGEINT) AS BIGINT) END AS drawdown_ppb FROM w ORDER BY event_id""",
    "events_regularity_score" ->
      s"""WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS e_us, epoch_us(ts) // 60000000 AS minute FROM events), g AS (SELECT *, e_us - lag(e_us) OVER (PARTITION BY user_id ORDER BY e_us, event_id) AS gap FROM o), gs0 AS (SELECT user_id, count(*) AS n_events, CAST(count(DISTINCT minute) AS BIGINT) AS n_minutes, SUM(CAST(gap AS HUGEINT)) AS rg, SUM(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT)) AS rg2, CAST(sum(CASE WHEN gap IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps FROM g GROUP BY 1), gs AS (SELECT user_id, n_events, n_minutes, ${D2D("rg")} AS sg, ${D2D("rg2")} AS sg2, n_gaps FROM gs0), b AS (SELECT user_id, CAST(max(mc) AS BIGINT) AS burst_max_per_minute FROM (SELECT user_id, minute, count(*) AS mc FROM o GROUP BY 1, 2) GROUP BY 1), j AS (SELECT gs.*, b.burst_max_per_minute FROM gs JOIN b USING (user_id)), r AS (SELECT *, CAST(CAST(n_events - n_minutes AS HUGEINT) * 1000000000 // CAST(n_events AS HUGEINT) AS BIGINT) AS dup_minute_ppb, CASE WHEN n_gaps > 0 THEN sg / n_gaps END AS mean_gap_us, CASE WHEN n_gaps > 0 THEN sg2 / n_gaps - (sg / n_gaps) * (sg / n_gaps) END AS gap_var_us2 FROM j) SELECT user_id, n_events, n_minutes, dup_minute_ppb, mean_gap_us, gap_var_us2, burst_max_per_minute, (burst_max_per_minute >= 10 OR (n_events >= 20 AND dup_minute_ppb >= 500000000)) AS suspected_bot FROM r ORDER BY user_id""",
    "graph_kcore" ->
      """WITH RECURSIVE active AS (SELECT DISTINCT user_id, date_trunc('minute', ts) AS hr FROM events), edges AS (SELECT DISTINCT x.user_id AS a, y.user_id AS b FROM active x JOIN active y ON x.hr = y.hr AND x.user_id < y.user_id), d0 AS (SELECT v, count(*) AS deg FROM (SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges) GROUP BY 1), core AS (SELECT 0 AS iter, (SELECT coalesce(list(v ORDER BY v), []) FROM d0 WHERE deg >= 3) AS vs, (SELECT list({'a': a, 'b': b}) FROM edges) AS es UNION ALL SELECT iter + 1, nxt, es FROM (SELECT iter, vs, es, list_filter(vs, v -> len(list_filter(es, e -> (e.a = v OR e.b = v) AND list_contains(vs, e.a) AND list_contains(vs, e.b))) >= 3) AS nxt FROM core) WHERE iter < 50 AND nxt <> vs), fin AS (SELECT vs FROM core ORDER BY iter DESC LIMIT 1), surv AS (SELECT unnest(vs) AS v FROM fin), sub AS (SELECT a, b FROM edges WHERE a IN (SELECT v FROM surv) AND b IN (SELECT v FROM surv)) SELECT v AS user_id, CAST(count(*) AS BIGINT) AS core_degree FROM (SELECT a AS v FROM sub UNION ALL SELECT b AS v FROM sub) GROUP BY 1 ORDER BY user_id""",
    "sample_topk_hash" ->
      """WITH h AS (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 16) AS hkey FROM documents), t AS (SELECT doc_id, hkey FROM h ORDER BY hkey, doc_id LIMIT 100) SELECT CAST(row_number() OVER (ORDER BY hkey, doc_id) AS BIGINT) AS rank, doc_id, hkey FROM t ORDER BY rank""",
    "ts_kalman_filter" ->
      s"""WITH RECURSIVE pts AS (SELECT user_id, event_id, ts, value AS z, CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn FROM events), rec AS (SELECT user_id, rn, event_id, ts, z, z AS x, CAST(4.0 AS DOUBLE) AS p, CAST(NULL AS DOUBLE) AS gain FROM pts WHERE rn = 1 UNION ALL SELECT c.user_id, c.rn, c.event_id, c.ts, c.z, r.x + ((r.p + 0.05) / ((r.p + 0.05) + 4.0)) * (c.z - r.x) AS x, (1.0 - ((r.p + 0.05) / ((r.p + 0.05) + 4.0))) * (r.p + 0.05) AS p, (r.p + 0.05) / ((r.p + 0.05) + 4.0) AS gain FROM rec r JOIN pts c ON c.user_id = r.user_id AND c.rn = r.rn + 1) SELECT event_id, user_id, strftime(ts, $TS6) AS ts_s, z AS value, x AS x_filt, p AS p_var, gain FROM rec ORDER BY event_id""",
    "stat_runs_test" ->
      """WITH r0 AS (SELECT event_type, event_id, ts, value, CAST(row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rn, count(*) OVER (PARTITION BY event_type) AS n FROM events), med AS (SELECT event_type, max(CASE WHEN rn = ceil(n * 0.5) THEN value END) AS med FROM r0 GROUP BY 1), sg AS (SELECT e.event_type, e.ts, e.event_id, CASE WHEN e.value > m.med THEN 1 ELSE 0 END AS above FROM events e JOIN med m USING (event_type)), rr AS (SELECT *, CASE WHEN lag(above) OVER w IS NULL OR above <> lag(above) OVER w THEN 1 ELSE 0 END AS newrun FROM sg WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)), ag AS (SELECT event_type, CAST(sum(CASE WHEN above = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_above, CAST(sum(CASE WHEN above = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_below, CAST(sum(newrun) AS BIGINT) AS n_runs FROM rr GROUP BY 1), st AS (SELECT *, CAST(n_above + n_below AS DOUBLE) AS t, 2.0 * n_above * n_below AS p2 FROM ag), fin AS (SELECT *, 1.0 + p2 / t AS expected_runs, p2 * (p2 - t) / (t * t * (t - 1.0)) AS var_runs FROM st) SELECT event_type, n_above, n_below, n_runs, expected_runs, CASE WHEN var_runs > 0 THEN (CAST(n_runs AS DOUBLE) - expected_runs) / sqrt(var_runs) END AS z FROM fin ORDER BY event_type""",
    "corpus_quality_report" ->
      """WITH s AS (SELECT source, doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) n_tok, len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) n_stop, len(regexp_extract_all(text, '[0-9]')) n_digit, n_chars FROM documents), q0 AS (SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tokens, (CASE WHEN n_tok >= 20 THEN 1.0 ELSE 0.0 END + CASE WHEN n_stop > 0 THEN 1.0 ELSE 0.0 END + (1.0 - CAST(n_digit AS DOUBLE) / greatest(n_chars, 1))) AS q FROM s), r0 AS (SELECT *, CAST(row_number() OVER (PARTITION BY source ORDER BY q, doc_id) AS BIGINT) AS rn, count(*) OVER (PARTITION BY source) AS n FROM q0) SELECT source, CAST(max(n) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens, CAST(SUM(CAST(q AS DECIMAL(28,6))) AS DOUBLE) / COUNT(q) AS mean_quality, max(CASE WHEN rn = ceil(n * 0.25) THEN q END) AS q25, max(CASE WHEN rn = ceil(n * 0.5) THEN q END) AS q50, max(CASE WHEN rn = ceil(n * 0.75) THEN q END) AS q75, CAST(sum(CASE WHEN q < 1.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_gate FROM r0 GROUP BY source ORDER BY source""",
    "events_interarrival_histogram" ->
      """WITH o AS (SELECT event_type, user_id, event_id, epoch_us(ts) AS e_us FROM events), g AS (SELECT event_type, e_us - lag(e_us) OVER (PARTITION BY event_type, user_id ORDER BY e_us, event_id) AS gap FROM o), b AS (SELECT event_type, CAST(length(bin(gap)) - 1 AS BIGINT) AS bucket, gap FROM g WHERE gap IS NOT NULL), agg AS (SELECT event_type, bucket, count(*) AS n, min(gap) AS gap_min_us, max(gap) AS gap_max_us FROM b GROUP BY 1, 2) SELECT event_type, bucket, n, gap_min_us, gap_max_us, CAST(CAST(n AS HUGEINT) * 1000000000 // CAST(sum(n) OVER (PARTITION BY event_type) AS HUGEINT) AS BIGINT) AS share_ppb FROM agg ORDER BY event_type, bucket""",
    "events_pareto_deciles" ->
      """WITH u AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1), r AS (SELECT user_id, n_events, CAST(ntile(10) OVER (ORDER BY n_events DESC, user_id) AS BIGINT) AS decile FROM u), d AS (SELECT decile, count(*) AS n_users, CAST(sum(n_events) AS BIGINT) AS n_events FROM r GROUP BY 1) SELECT decile, n_users, n_events, CAST(CAST(n_events AS HUGEINT) * 1000000000 // CAST(sum(n_events) OVER () AS HUGEINT) AS BIGINT) AS share_ppb, CAST(CAST(sum(n_events) OVER (ORDER BY decile) AS HUGEINT) * 1000000000 // CAST(sum(n_events) OVER () AS HUGEINT) AS BIGINT) AS cum_share_ppb FROM d ORDER BY decile""",
    "corpus_length_histogram" ->
      """WITH t AS (SELECT lang, CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens FROM documents), b AS (SELECT lang, CAST(length(bin(n_tokens)) - 1 AS BIGINT) AS bucket, n_tokens FROM t), agg AS (SELECT lang, bucket, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens, min(n_tokens) AS len_min, max(n_tokens) AS len_max FROM b GROUP BY 1, 2) SELECT lang, bucket, n_docs, n_tokens, len_min, len_max, CAST(CAST(n_docs AS HUGEINT) * 1000000000 // CAST(sum(n_docs) OVER (PARTITION BY lang) AS HUGEINT) AS BIGINT) AS doc_share_ppb FROM agg ORDER BY lang, bucket""",
    "stat_cramers_v" ->
      """WITH cells0 AS (SELECT event_type, hour(ts) // 6 AS daypart, count(*) AS o0 FROM events GROUP BY 1, 2), cells AS (SELECT t.event_type, p.daypart, COALESCE(c.o0, 0) AS o FROM (SELECT DISTINCT event_type FROM cells0) t CROSS JOIN (SELECT DISTINCT daypart FROM cells0) p LEFT JOIN cells0 c ON c.event_type = t.event_type AND c.daypart = p.daypart), m AS (SELECT event_type, daypart, o, sum(o) OVER () AS g, CAST(sum(o) OVER (PARTITION BY event_type) AS DOUBLE) * CAST(sum(o) OVER (PARTITION BY daypart) AS DOUBLE) / CAST(sum(o) OVER () AS DOUBLE) AS e FROM cells), t AS (SELECT event_type, daypart, g, CAST(floor((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e * 1048576.0) AS BIGINT) AS term_q20 FROM m), a AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_rows, CAST(count(DISTINCT daypart) AS BIGINT) AS n_cols, CAST(max(g) AS BIGINT) AS n_events, CAST(sum(term_q20) AS BIGINT) AS chi2_q20 FROM t), a2 AS (SELECT *, CAST(chi2_q20 AS DOUBLE) / 1048576.0 AS chi2, least(n_rows, n_cols) - 1 AS mdim FROM a) SELECT n_rows, n_cols, n_events, chi2, CASE WHEN n_events > 0 AND mdim > 0 THEN sqrt(chi2 / CAST(n_events * mdim AS DOUBLE)) END AS cramers_v FROM a2""",
    "stat_poisson_dispersion" ->
      s"""WITH h AS (SELECT event_type, epoch_us(date_trunc('hour', ts)) // 3600000000 AS hu, count(*) AS n FROM events GROUP BY 1, 2), s0 AS (SELECT event_type, min(hu) AS mn, max(hu) AS mx, count(*) AS n_active_hours, CAST(sum(n) AS BIGINT) AS n_events, SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS rn2 FROM h GROUP BY 1), s AS (SELECT event_type, mx - mn + 1 AS n_hours, n_active_hours, n_events, ${D2D("rn2")} AS sn2 FROM s0), s2 AS (SELECT *, CAST(n_events AS DOUBLE) / CAST(n_hours AS DOUBLE) AS mean FROM s), s3 AS (SELECT *, sn2 / CAST(n_hours AS DOUBLE) - mean * mean AS variance FROM s2) SELECT event_type, n_hours, n_active_hours, n_events, mean AS mean_per_hour, variance, CASE WHEN mean > 0 THEN variance / mean END AS vmr FROM s3 ORDER BY event_type""",
    "dedup_cross_source" ->
      s"""WITH pairs AS (SELECT * FROM ($NEAR_MINHASH_SQL)), src AS (SELECT doc_id, source FROM documents), lab AS (SELECT least(sa.source, sb.source) AS source_a, greatest(sa.source, sb.source) AS source_b, p.jaccard FROM pairs p JOIN src sa ON sa.doc_id = p.doc_a JOIN src sb ON sb.doc_id = p.doc_b) SELECT source_a, source_b, count(*) AS n_pairs, CAST(SUM(CAST(jaccard AS DECIMAL(28,6))) AS DOUBLE) / COUNT(jaccard) AS jaccard_avg, source_a <> source_b AS is_cross FROM lab GROUP BY 1, 2 ORDER BY 1, 2""",
    "stat_welch_t" ->
      """WITH pc AS (SELECT event_type, count(*) AS ni, CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS s1, CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE) AS s2 FROM events WHERE value IS NOT NULL AND event_type IN ('click', 'purchase') GROUP BY 1), pc2 AS (SELECT *, s1 / ni AS mean_i FROM pc), pc3 AS (SELECT *, CASE WHEN ni > 1 THEN (s2 - CAST(ni AS DOUBLE) * (mean_i * mean_i)) / CAST(ni - 1 AS DOUBLE) END AS var_i FROM pc2), p AS (SELECT CAST(max(CASE WHEN event_type = 'click' THEN ni END) AS BIGINT) AS n_a, CAST(max(CASE WHEN event_type = 'purchase' THEN ni END) AS BIGINT) AS n_b, max(CASE WHEN event_type = 'click' THEN mean_i END) AS mean_a, max(CASE WHEN event_type = 'purchase' THEN mean_i END) AS mean_b, max(CASE WHEN event_type = 'click' THEN var_i END) AS var_a, max(CASE WHEN event_type = 'purchase' THEN var_i END) AS var_b FROM pc3), p2 AS (SELECT *, var_a / n_a + var_b / n_b AS sem FROM p) SELECT n_a, n_b, mean_a, mean_b, var_a, var_b, CASE WHEN sem > 0 THEN (mean_a - mean_b) / sqrt(sem) END AS t_stat, CASE WHEN sem > 0 AND n_a > 1 AND n_b > 1 THEN (sem * sem) / (((var_a / n_a) * (var_a / n_a)) / CAST(n_a - 1 AS DOUBLE) + ((var_b / n_b) * (var_b / n_b)) / CAST(n_b - 1 AS DOUBLE)) END AS df_welch FROM p2""",
    "graph_degree_assortativity" ->
      s"""WITH act AS (SELECT DISTINCT user_id, date_trunc('minute', ts) AS m FROM events), e AS (SELECT DISTINCT x.user_id AS a, y.user_id AS b FROM act x JOIN act y ON x.m = y.m AND x.user_id < y.user_id), d AS (SELECT v, count(*) AS deg FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY 1), nn AS (SELECT count(*) AS n_nodes FROM d), j AS (SELECT da.deg AS deg_a, db.deg AS deg_b FROM e JOIN d da ON da.v = e.a JOIN d db ON db.v = e.b), s0 AS (SELECT count(*) AS n_edges, SUM(CAST(deg_a + deg_b AS HUGEINT)) AS rx, SUM(CAST(deg_a AS HUGEINT) * CAST(deg_a AS HUGEINT) + CAST(deg_b AS HUGEINT) * CAST(deg_b AS HUGEINT)) AS rx2, SUM(2 * CAST(deg_a AS HUGEINT) * CAST(deg_b AS HUGEINT)) AS rxy FROM j), s AS (SELECT n_edges, ${D2D("rx")} AS sx, ${D2D("rx2")} AS sx2, ${D2D("rxy")} AS sxy FROM s0), s2 AS (SELECT *, CAST(n_edges AS DOUBLE) * 2.0 AS m FROM s), s3 AS (SELECT *, m * sxy - sx * sx AS num, m * sx2 - sx * sx AS den FROM s2) SELECT nn.n_nodes, s3.n_edges, CASE WHEN den > 0 THEN num / den END AS assortativity FROM s3, nn""",
    "window_rolling_median" ->
      s"""WITH f AS (SELECT event_id, user_id, ts, value, list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS arr FROM events) SELECT event_id, user_id, strftime(ts, $TS6) AS ts_s, value, CAST(len(arr) AS BIGINT) AS n_window, list_sort(arr)[CAST((len(arr) + 1) // 2 AS INT)] AS roll_median FROM f ORDER BY event_id""",
    "window_peak_detect" ->
      s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n FROM events GROUP BY 1, 2), x AS (SELECT event_type, hr, n, lag(n) OVER w AS prev_n, lead(n) OVER w AS next_n FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr)) SELECT event_type, strftime(hr, $TS0) AS hour_s, n, prev_n, next_n FROM x WHERE prev_n IS NOT NULL AND next_n IS NOT NULL AND n > prev_n AND n > next_n ORDER BY 1, 2""",
    "stat_anova_f" ->
      """WITH pc AS (SELECT event_type, count(*) AS ni, CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS s1, CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE) AS s2 FROM events WHERE value IS NOT NULL GROUP BY 1), pc2 AS (SELECT *, s1 / ni AS mean_i FROM pc), pc3 AS (SELECT *, s2 - CAST(ni AS DOUBLE) * (mean_i * mean_i) AS ss_within_i FROM pc2), g AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ni) AS BIGINT) AS n_total, CAST(SUM(CAST(s1 AS DECIMAL(28,6))) AS DOUBLE) AS s_all, CAST(SUM(CAST(ss_within_i AS DECIMAL(28,6))) AS DOUBLE) AS ssw, CAST(SUM(CAST(CAST(ni AS DOUBLE) * (mean_i * mean_i) AS DECIMAL(28,6))) AS DOUBLE) AS nm2 FROM pc3), g2 AS (SELECT *, s_all / n_total AS gmean FROM g), g3 AS (SELECT *, nm2 - CAST(n_total AS DOUBLE) * (gmean * gmean) AS ssb FROM g2) SELECT k, n_total, ssb AS ss_between, ssw AS ss_within, CASE WHEN ssw > 0 AND k > 1 THEN (ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n_total - k AS DOUBLE)) END AS f_stat FROM g3""",
    "stat_holt_winters" ->
      """WITH h AS (SELECT event_type, epoch_us(date_trunc('hour', ts)) // 3600000000 AS hu, count(*) AS n FROM events GROUP BY 1, 2), b AS (SELECT event_type, min(hu) AS mn, max(hu) AS mx FROM h GROUP BY 1), grid AS (SELECT event_type, unnest(range(mn, mx + 1)) AS hu FROM b), d AS (SELECT g.event_type, g.hu, CAST(coalesce(h.n, 0) AS DOUBLE) AS x FROM grid g LEFT JOIN h ON h.event_type = g.event_type AND h.hu = g.hu), s AS (SELECT event_type, list([x] || [0.0 FOR i IN range(25)] ORDER BY hu) AS xs FROM d GROUP BY 1), r AS (SELECT event_type, CAST(len(xs) AS BIGINT) AS n_hours, list_reduce(xs, (acc, e) -> [((e[1] - acc[3]) + (acc[1] + acc[2])) / 2.0, ((((e[1] - acc[3]) + (acc[1] + acc[2])) / 2.0 - acc[1]) + acc[2]) / 2.0] || acc[4:26] || [((e[1] - ((e[1] - acc[3]) + (acc[1] + acc[2])) / 2.0) + acc[3]) / 2.0]) AS st FROM s) SELECT event_type, n_hours, st[1] AS level, st[2] AS trend, st[3] AS season_next, st[1] + st[2] + st[3] AS forecast_next FROM r ORDER BY event_type""",
    "agg_quantiles_sketch" ->
      """WITH b AS (SELECT event_type, CAST(length(bin(greatest(CAST(floor(value * 1000) AS BIGINT), 0))) - 1 AS BIGINT) AS band FROM events WHERE value IS NOT NULL), h AS (SELECT event_type, band, count(*) AS cnt FROM b GROUP BY 1, 2), c AS (SELECT event_type, band, cnt, CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY band) AS BIGINT) AS cum, CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n, count(*) OVER (PARTITION BY event_type) AS n_bands FROM h), q AS (SELECT qname, CAST(q AS DOUBLE) AS q FROM (VALUES ('p50', 0.5), ('p90', 0.9), ('p99', 0.99)) t(qname, q)), p AS (SELECT c.*, q.qname, CAST(ceil(c.n * q.q) AS BIGINT) AS t FROM c, q), f AS (SELECT *, CAST(1::BIGINT << CAST(band AS INT) AS DOUBLE) AS lo FROM p WHERE cum >= t AND cum - cnt < t), e AS (SELECT event_type, n, n_bands, qname, (lo + lo * (CAST(t - (cum - cnt) AS DOUBLE) / CAST(cnt AS DOUBLE))) / 1000.0 AS est FROM f) SELECT event_type, max(n) AS n, CAST(max(n_bands) AS BIGINT) AS n_bands, max(CASE WHEN qname = 'p50' THEN est END) AS p50_est, max(CASE WHEN qname = 'p90' THEN est END) AS p90_est, max(CASE WHEN qname = 'p99' THEN est END) AS p99_est FROM e GROUP BY 1 ORDER BY 1""",
    "stat_brown_forsythe" ->
      """WITH r0 AS (SELECT event_type, event_id, value, CAST(row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rn, count(*) OVER (PARTITION BY event_type) AS n FROM events), med AS (SELECT event_type, max(CASE WHEN rn = ceil(n * 0.5) THEN value END) AS med FROM r0 GROUP BY 1), zz AS (SELECT e.event_type, abs(e.value - m.med) AS z FROM events e JOIN med m USING (event_type)), pc AS (SELECT event_type, count(*) AS ni, CAST(SUM(CAST(z AS DECIMAL(28,6))) AS DOUBLE) AS sz, CAST(SUM(CAST(z * z AS DECIMAL(28,6))) AS DOUBLE) AS sz2 FROM zz GROUP BY 1), pc2 AS (SELECT *, sz / ni AS zbar_i FROM pc), pc3 AS (SELECT *, sz2 - CAST(ni AS DOUBLE) * (zbar_i * zbar_i) AS ss_within FROM pc2), g AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ni) AS BIGINT) AS n_total, CAST(SUM(CAST(sz AS DECIMAL(28,6))) AS DOUBLE) AS sz_all, CAST(SUM(CAST(ss_within AS DECIMAL(28,6))) AS DOUBLE) AS den, CAST(SUM(CAST(CAST(ni AS DOUBLE) * (zbar_i * zbar_i) AS DECIMAL(28,6))) AS DOUBLE) AS nz2 FROM pc3), g2 AS (SELECT *, sz_all / n_total AS zbar FROM g), g3 AS (SELECT *, nz2 - CAST(n_total AS DOUBLE) * (zbar * zbar) AS num FROM g2) SELECT k, n_total, CASE WHEN den > 0 AND k > 1 THEN (CAST(n_total - k AS DOUBLE) / CAST(k - 1 AS DOUBLE)) * (num / den) END AS bf_w FROM g3""",
    "emb_norm_stats" ->
      """WITH n AS (SELECT label, sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm FROM embeddings) SELECT label, count(*) AS n_vecs, min(nrm) AS norm_min, CAST(SUM(CAST(nrm AS DECIMAL(28,6))) AS DOUBLE) / COUNT(nrm) AS norm_mean, max(nrm) AS norm_max, CAST(sum(CASE WHEN nrm < 0.000001 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero FROM n GROUP BY label ORDER BY label""",
    "emb_binarize_sign" ->
      """WITH s AS (SELECT vec_id, label, CAST(list_sum([CASE WHEN embedding[i + 1] > 0.0 THEN 1::BIGINT << i ELSE 0::BIGINT END FOR i IN range(0, 32)]) AS BIGINT) AS sig_lo, CAST(list_sum([CASE WHEN embedding[i + 33] > 0.0 THEN 1::BIGINT << i ELSE 0::BIGINT END FOR i IN range(0, 32)]) AS BIGINT) AS sig_hi FROM embeddings) SELECT vec_id, label, sig_lo, sig_hi, CAST(bit_count(sig_lo) + bit_count(sig_hi) AS BIGINT) AS n_pos FROM s ORDER BY vec_id""",
    "sim_search_hamming_topk" ->
      """WITH s AS (SELECT vec_id, CAST(list_sum([CASE WHEN embedding[i + 1] > 0.0 THEN 1::BIGINT << i ELSE 0::BIGINT END FOR i IN range(0, 32)]) AS BIGINT) AS sig_lo, CAST(list_sum([CASE WHEN embedding[i + 33] > 0.0 THEN 1::BIGINT << i ELSE 0::BIGINT END FOR i IN range(0, 32)]) AS BIGINT) AS sig_hi FROM embeddings), q AS (SELECT vec_id AS query_id, sig_lo AS qlo, sig_hi AS qhi FROM s WHERE vec_id < 10), p AS (SELECT q.query_id, s.vec_id, CAST(bit_count(xor(s.sig_lo, q.qlo)) + bit_count(xor(s.sig_hi, q.qhi)) AS BIGINT) AS hamming FROM s, q WHERE s.vec_id <> q.query_id), r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY hamming, vec_id) AS rn FROM p) SELECT query_id, CAST(rn AS BIGINT) AS rn, vec_id, hamming FROM r WHERE rn <= 10 ORDER BY query_id, rn""",
    "dedup_normalized" ->
      """WITH n AS (SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(lower(text), '[\t\n\r]', ' ', 'g'), '[^a-z0-9 ]', '', 'g'), '  *', ' ', 'g')) AS norm FROM documents) SELECT min(doc_id) AS keep_doc_id, count(*) AS n_equivalent, md5(norm) AS norm_md5 FROM n GROUP BY md5(norm) ORDER BY keep_doc_id""",
    "multimodal_audio_fingerprint" ->
      """WITH hx AS (SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n FROM documents), b AS (SELECT doc_id, i, (strpos('0123456789ABCDEF', substr(h, CAST(2*i+1 AS INT), 1)) - 1) * 16 + (strpos('0123456789ABCDEF', substr(h, CAST(2*i+2 AS INT), 1)) - 1) AS byte FROM (SELECT doc_id, h, unnest(range(n)) AS i FROM hx)), f AS (SELECT doc_id, i // 32 AS fno, count(*) AS cnt, sum(byte) AS e FROM b GROUP BY 1, 2), cf AS (SELECT doc_id, fno, e FROM f WHERE cnt = 32), nf AS (SELECT doc_id, count(*) AS n_frames FROM cf GROUP BY 1), d AS (SELECT c1.doc_id, CASE WHEN c2.e > c1.e THEN 1::BIGINT << CAST(c1.fno AS INT) ELSE 0::BIGINT END AS bit FROM cf c1 JOIN cf c2 ON c1.doc_id = c2.doc_id AND c2.fno = c1.fno + 1 WHERE c1.fno < 48), fps AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS fp FROM d GROUP BY 1), base AS (SELECT h.doc_id, CAST(COALESCE(nf.n_frames, 0) AS BIGINT) AS n_frames, CAST(COALESCE(fps.fp, 0) AS BIGINT) AS fingerprint FROM hx h LEFT JOIN nf USING (doc_id) LEFT JOIN fps USING (doc_id)) SELECT doc_id, n_frames, fingerprint, count(*) OVER (PARTITION BY fingerprint) AS n_matching FROM base ORDER BY doc_id""",
    "tpch_min_cost_supplier" ->
      """WITH eu AS (SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey JOIN region r ON n.n_regionkey = r.r_regionkey WHERE r.r_name = 'EUROPE'), cost AS (SELECT l.l_partkey, l.l_suppkey, min(l.l_extendedprice / l.l_quantity) AS unit_cost FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey JOIN eu ON l.l_suppkey = eu.s_suppkey WHERE p.p_type = 'STANDARD' AND p.p_size = 15 GROUP BY 1, 2), best AS (SELECT l_partkey, min(unit_cost) AS min_cost FROM cost GROUP BY 1) SELECT eu.s_acctbal, eu.s_name, eu.n_name, c.l_partkey AS p_partkey, c.unit_cost FROM cost c JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.min_cost JOIN eu ON c.l_suppkey = eu.s_suppkey ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",
    "tpch_product_profit" ->
      """SELECT n.n_name, year(o.o_orderdate) AS o_year, CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) - 0.1 * p.p_retailprice * l.l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_profit, count(*) AS n_items FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey JOIN supplier s ON l.l_suppkey = s.s_suppkey JOIN nation n ON s.s_nationkey = n.n_nationkey JOIN orders o ON l.l_orderkey = o.o_orderkey WHERE p.p_name LIKE '%gear%' GROUP BY 1, 2 ORDER BY 1, 2 DESC""",
    "tpch_ship_latency_priority" ->
      """WITH j AS (SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) >= 60 THEN 'SLOW' WHEN date_diff('day', o.o_orderdate, l.l_shipdate) >= 30 THEN 'MEDIUM' ELSE 'FAST' END AS latency_tier, o.o_orderpriority FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00') SELECT latency_tier, CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS n_critical, CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS n_other FROM j GROUP BY 1 ORDER BY 1""",
    "tpch_supplier_part_counts" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem), ok AS (SELECT pr.l_partkey, pr.l_suppkey FROM pairs pr WHERE pr.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)) SELECT p.p_brand, p.p_type, p.p_size, count(DISTINCT ok.l_suppkey) AS supplier_cnt FROM ok JOIN part p ON ok.l_partkey = p.p_partkey WHERE p.p_brand <> 'Brand#2' GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "tpch_dominant_part_supplier" ->
      """WITH shipped AS (SELECT l.l_partkey, l.l_suppkey, CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS supp_qty FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey WHERE p.p_name LIKE 'red%' AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00' GROUP BY 1, 2), totals AS (SELECT l_partkey, CAST(SUM(CAST(supp_qty AS DECIMAL(28,6))) AS DOUBLE) AS total_qty FROM shipped GROUP BY 1), dom AS (SELECT DISTINCT sh.l_suppkey FROM shipped sh JOIN totals t ON sh.l_partkey = t.l_partkey WHERE sh.supp_qty > 0.5 * t.total_qty) SELECT s.s_suppkey, s.s_name, n.n_name FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey JOIN region r ON n.n_regionkey = r.r_regionkey WHERE r.r_name = 'ASIA' AND s.s_suppkey IN (SELECT l_suppkey FROM dom) ORDER BY s_suppkey""",
    "tpch_waiting_suppliers" ->
      """WITH pos AS (SELECT l.l_orderkey, l.l_suppkey, max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY THEN 1 ELSE 0 END) AS supp_late FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey WHERE o.o_orderstatus = 'F' GROUP BY 1, 2), po AS (SELECT l_orderkey, count(*) AS n_supp, sum(supp_late) AS n_late_supp FROM pos GROUP BY 1), blamed AS (SELECT pos.l_suppkey, count(*) AS numwait FROM pos JOIN po ON pos.l_orderkey = po.l_orderkey WHERE pos.supp_late = 1 AND po.n_supp > 1 AND po.n_late_supp = 1 GROUP BY 1) SELECT s.s_suppkey, s.s_name, b.numwait FROM blamed b JOIN supplier s ON b.l_suppkey = s.s_suppkey JOIN nation n ON s.s_nationkey = n.n_nationkey WHERE n.n_name = 'NATION_3' ORDER BY numwait DESC, s_name LIMIT 25""",
    "agg_distinct_intersect_kmv" ->
      """WITH h AS (SELECT DISTINCT event_type, user_id, ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT::DOUBLE / 18446744073709551616.0 AS h FROM events WHERE event_type IN ('click', 'purchase')), r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h), th AS (SELECT event_type, CASE WHEN count(*) < 64 THEN 1.0 ELSE max(CASE WHEN rn = 64 THEN h END) END AS theta FROM r GROUP BY 1), t AS (SELECT min(theta) AS theta FROM th), sa AS (SELECT user_id, h FROM r WHERE event_type = 'click' AND rn <= 64), sb AS (SELECT user_id FROM r WHERE event_type = 'purchase' AND rn <= 64), cm AS (SELECT count(*) AS n_common_sample FROM sa JOIN sb USING (user_id), t WHERE sa.h < t.theta), ex AS (SELECT count(*) AS n_exact FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'click') a JOIN (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') b USING (user_id)) SELECT CAST(64 AS BIGINT) AS k, t.theta, cm.n_common_sample, CAST(cm.n_common_sample AS DOUBLE) / t.theta AS est_intersect, ex.n_exact, CAST(cm.n_common_sample AS DOUBLE) / t.theta - CAST(ex.n_exact AS DOUBLE) AS err FROM cm, t, ex""",
    "tpch_idle_customer_balance" ->
      """WITH avgb AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0), idle AS (SELECT c.c_acctbal, c.c_nationkey FROM customer c, avgb WHERE c.c_acctbal > avgb.avg_bal AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')) SELECT n.n_name, count(*) AS n_customers, CAST(SUM(CAST(i.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_bal FROM idle i JOIN nation n ON i.c_nationkey = n.n_nationkey GROUP BY 1 ORDER BY 1""",
    "stat_seasonal_residual" ->
      s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n FROM events GROUP BY 1, 2), c AS (SELECT event_type, hr, n, (epoch_us(hr) // 86400000000 + 4) % 7 AS dow, hour(hr) AS hod FROM h), b AS (SELECT event_type, dow, hod, CAST(sum(n) AS DOUBLE) / count(*) AS baseline_n FROM c GROUP BY 1, 2, 3) SELECT c.event_type, strftime(c.hr, $TS0) AS hour_s, c.n, b.baseline_n, CAST(c.n AS DOUBLE) - b.baseline_n AS residual FROM c JOIN b USING (event_type, dow, hod) ORDER BY event_type, hour_s""",
    // e_t = (x_t + e_{t-1})/2: one add + one exact exponent shift per
    // step, folded in the same hour order by both engines
    "stat_ewma_hourly" ->
      "WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n FROM events GROUP BY 1, 2), s AS (SELECT event_type, list(CAST(n AS DOUBLE) ORDER BY hr) AS xs FROM h GROUP BY 1) SELECT event_type, CAST(len(xs) AS BIGINT) AS n_hours, list_reduce(xs, (acc, x) -> (x + acc) / 2.0) AS ewma FROM s ORDER BY event_type",
    "agg_ohlc_hourly" ->
      s"""WITH b AS (SELECT event_type, date_trunc('hour', ts) AS hr, ts, event_id, value, row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts) ORDER BY ts, event_id) AS rn, count(*) OVER (PARTITION BY event_type, date_trunc('hour', ts)) AS cnt FROM events) SELECT event_type, strftime(hr, $TS0) AS hour_s, max(CASE WHEN rn = 1 THEN value END) AS open, max(value) AS high, min(value) AS low, max(CASE WHEN rn = cnt THEN value END) AS close, count(*) AS n FROM b GROUP BY 1, 2 ORDER BY event_type, hour_s""",
    "agg_simpson_diversity" ->
      "WITH u AS (SELECT event_type, user_id, count(*) AS n FROM events GROUP BY 1, 2) SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events, count(*) AS n_users, CAST(sum(n * n) AS BIGINT) AS sum_sq, 1.0 - CAST(sum(n * n) AS DOUBLE) / (CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE)) AS simpson_diversity FROM u GROUP BY 1 ORDER BY event_type",
    // portable HLL: registers from md5 slices, harmonic denominator kept
    // exact as DECIMAL integer powers of two — the sketch hash-matches
    "agg_distinct_hll_portable" ->
      "WITH r AS (SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))::INT AS b, ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 14))::UBIGINT AS v FROM events), regs AS (SELECT b, max(CASE WHEN v = 0 THEN 57 ELSE 57 - length(bin(v)) END) AS m FROM r GROUP BY 1), s AS (SELECT count(*) AS hit, sum(CAST(1::UBIGINT << (57 - m) AS DECIMAL(38,0))) AS t_hit FROM regs) SELECT 256::BIGINT AS m_buckets, CAST(256 - hit AS BIGINT) AS v_zero, CAST(hit AS BIGINT) AS n_buckets_hit, (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 144115188075855872.0 / (CAST(t_hit AS DOUBLE) + CAST(256 - hit AS DOUBLE) * 144115188075855872.0) AS est_raw FROM s",
    "profile_join_cardinality" ->
      "WITH a AS (SELECT o_custkey AS key, count(*) AS na FROM orders GROUP BY 1), b AS (SELECT c_custkey AS key, count(*) AS nb FROM customer GROUP BY 1) SELECT count(*) AS n_matching_keys, CAST(sum(na * nb) AS BIGINT) AS join_rows, CAST(max(na * nb) AS BIGINT) AS max_key_rows FROM a JOIN b USING (key)",
    "profile_expectations" ->
      """WITH s AS (SELECT CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_id_null, count(*) - count(DISTINCT event_id) AS v_id_dup, CAST(sum(CASE WHEN ts IS NULL OR ts < TIMESTAMP '2024-01-01 00:00:00' OR ts >= TIMESTAMP '2025-01-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS v_ts_range, CAST(sum(CASE WHEN event_type IS NULL OR event_type NOT IN ('click', 'view', 'purchase', 'signup', 'error') THEN 1 ELSE 0 END) AS BIGINT) AS v_type_domain, CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_user_null, CAST(sum(CASE WHEN value IS NULL OR value < 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS v_value_neg FROM events), r AS (SELECT 'event_id_not_null' AS rule, v_id_null AS n_violations FROM s UNION ALL SELECT 'event_id_unique', v_id_dup FROM s UNION ALL SELECT 'ts_in_2024', v_ts_range FROM s UNION ALL SELECT 'event_type_in_domain', v_type_domain FROM s UNION ALL SELECT 'user_id_not_null', v_user_null FROM s UNION ALL SELECT 'value_non_negative', v_value_neg FROM s) SELECT rule, n_violations, CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed FROM r ORDER BY rule""",
    // the oracle is the PLAIN long-form aggregate: pivot∘unpivot = identity
    "agg_unpivot_roundtrip" ->
      s"""SELECT strftime(date_trunc('hour', ts), $TS0) AS hour_s, event_type, CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value FROM events GROUP BY 1, 2 ORDER BY hour_s, event_type""",
    "events_dau_mau" ->
      s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d, user_id // 32 AS w, bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS word FROM events GROUP BY 1, 2), grid AS (SELECT * FROM (SELECT DISTINCT d FROM daily) CROSS JOIN (SELECT DISTINCT w FROM daily)), g AS (SELECT grid.d, grid.w, daily.word FROM grid LEFT JOIN daily USING (d, w)), m AS (SELECT d, w, word, bit_or(coalesce(word, 0)) OVER (PARTITION BY w ORDER BY d RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS mword FROM g), s AS (SELECT d, CAST(sum(bit_count(coalesce(word, 0))) AS BIGINT) AS dau, CAST(sum(bit_count(mword)) AS BIGINT) AS mau FROM m GROUP BY 1) SELECT strftime(make_timestamp(d * 86400000000), $TS0) AS day_s, dau, mau, CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE) AS stickiness FROM s ORDER BY day_s""",
    "events_behavior_cohorts" ->
      """WITH b AS (SELECT user_id, bit_or(CASE event_type WHEN 'click' THEN 1 WHEN 'purchase' THEN 2 WHEN 'view' THEN 4 WHEN 'signup' THEN 8 WHEN 'error' THEN 16 ELSE 0 END) AS mask FROM events WHERE ts < TIMESTAMP '2024-01-02 00:00:00' GROUP BY 1), c AS (SELECT mask, count(*) AS n_users FROM b GROUP BY 1) SELECT CAST(mask AS BIGINT) AS mask, concat_ws('+', CASE WHEN mask & 1 <> 0 THEN 'click' END, CASE WHEN mask & 2 <> 0 THEN 'purchase' END, CASE WHEN mask & 4 <> 0 THEN 'view' END, CASE WHEN mask & 8 <> 0 THEN 'signup' END, CASE WHEN mask & 16 <> 0 THEN 'error' END) AS behavior_set, n_users FROM c ORDER BY mask""",
    "agg_bitmap_distinct" ->
      "WITH b AS (SELECT event_type, user_id // 32 AS w, bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS word FROM events GROUP BY 1, 2) SELECT event_type, CAST(sum(bit_count(word)) AS BIGINT) AS n_distinct_users, count(*) AS n_words FROM b GROUP BY 1 ORDER BY event_type",
    "stat_rolling_corr" ->
      "WITH h AS (SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS hu, CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x, CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1), r AS (SELECT hu, x, y, CAST(count(*) OVER fr AS BIGINT) AS n_hours, CAST(count(*) OVER fr AS DOUBLE) AS n, CAST(sum(x) OVER fr AS DOUBLE) AS sx, CAST(sum(y) OVER fr AS DOUBLE) AS sy, CAST(sum(x*y) OVER fr AS DOUBLE) AS sxy, CAST(sum(x*x) OVER fr AS DOUBLE) AS sxx, CAST(sum(y*y) OVER fr AS DOUBLE) AS syy FROM h WINDOW fr AS (ORDER BY hu RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)) SELECT hu, n_hours, x, y, CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) END AS rolling_r FROM r ORDER BY hu",
    "layout_zorder_skipping" ->
      """WITH raw AS (SELECT event_id, user_id, ts, epoch_us(ts) // 3600000000 AS hu FROM events), bounds AS (SELECT min(user_id) AS u_lo, max(user_id) AS u_hi, min(hu) AS h_lo, max(hu) AS h_hi FROM raw), base AS (SELECT event_id, user_id, ts, ((user_id - u_lo) * 256) // (u_hi - u_lo + 1) AS xa, ((hu - h_lo) * 256) // (h_hi - h_lo + 1) AS xb FROM raw CROSS JOIN bounds), s1 AS (SELECT *, (xa | (xa << 8)) & 16711935 AS a1, (xb | (xb << 8)) & 16711935 AS b1 FROM base), s2 AS (SELECT *, (a1 | (a1 << 4)) & 252645135 AS a2, (b1 | (b1 << 4)) & 252645135 AS b2 FROM s1), s3 AS (SELECT *, (a2 | (a2 << 2)) & 858993459 AS a3, (b2 | (b2 << 2)) & 858993459 AS b3 FROM s2), s4 AS (SELECT *, (a3 | (a3 << 1)) & 1431655765 AS a4, (b3 | (b3 << 1)) & 1431655765 AS b4 FROM s3), zz AS (SELECT event_id, user_id, ts, a4 | (b4 << 1) AS z FROM s4), tb AS (SELECT user_id, (row_number() OVER (ORDER BY ts, event_id) - 1) // 512 AS blk FROM zz), zb AS (SELECT user_id, (row_number() OVER (ORDER BY z, event_id) - 1) // 512 AS blk FROM zz), tstat AS (SELECT blk, min(user_id) AS u_min, max(user_id) AS u_max, count(*) AS n FROM tb GROUP BY 1), zstat AS (SELECT blk, min(user_id) AS u_min, max(user_id) AS u_max, count(*) AS n FROM zb GROUP BY 1) SELECT 'time_sorted' AS layout, count(*) AS n_blocks, CAST(sum(CASE WHEN u_min <= 42 AND u_max >= 42 THEN 1 ELSE 0 END) AS BIGINT) AS blocks_hit, CAST(sum(CASE WHEN u_min <= 42 AND u_max >= 42 THEN n ELSE 0 END) AS BIGINT) AS rows_hit FROM tstat UNION ALL SELECT 'z_sorted', count(*), CAST(sum(CASE WHEN u_min <= 42 AND u_max >= 42 THEN 1 ELSE 0 END) AS BIGINT), CAST(sum(CASE WHEN u_min <= 42 AND u_max >= 42 THEN n ELSE 0 END) AS BIGINT) FROM zstat ORDER BY layout""",
    "agg_weighted_avg" ->
      "SELECT l_returnflag, CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS weighted_sum, CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty, count(*) AS n_items, CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6))) AS DOUBLE) / CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS wavg_price FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "window_percent_rank" ->
      "SELECT event_id, event_type, value, percent_rank() OVER w AS pct_rank, cume_dist() OVER w AS cume FROM events WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id) ORDER BY event_id",
    // every arithmetic step (q·(n−1), frac, lo + (hi−lo)·frac) is the same
    // fixed chain of correctly-rounded double ops in both engines
    "agg_quantiles_interp" -> {
      def p(q: String) = s"CAST($q AS DOUBLE) * CAST(n - 1 AS DOUBLE)"
      def straddle(q: String, nm: String) =
        s"max(CASE WHEN rn = floor(${p(q)}) + 1 THEN value END) AS lo_$nm, " +
          s"max(CASE WHEN rn = floor(${p(q)}) + 2 THEN value END) AS hi_$nm"
      def interp(q: String, nm: String) =
        s"CASE WHEN ${p(q)} - floor(${p(q)}) = 0 THEN lo_$nm " +
          s"ELSE lo_$nm + (hi_$nm - lo_$nm) * (${p(q)} - floor(${p(q)})) END AS ${nm}_interp"
      "WITH o AS (SELECT event_type, value, row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn, count(*) OVER (PARTITION BY event_type) AS n FROM events), " +
        s"a AS (SELECT event_type, max(n) AS n, ${straddle("0.5", "p50")}, ${straddle("0.9", "p90")}, ${straddle("0.99", "p99")} FROM o GROUP BY 1) " +
        s"SELECT event_type, n, ${interp("0.5", "p50")}, ${interp("0.9", "p90")}, ${interp("0.99", "p99")} FROM a ORDER BY event_type"
    },
    "join_pointintime_scd2" ->
      s"""WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n FROM events GROUP BY 1, 2), t AS (SELECT *, CASE WHEN n >= 4 THEN 'high' WHEN n >= 2 THEN 'mid' ELSE 'low' END AS tier FROM daily), g AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY day) - row_number() OVER (PARTITION BY user_id, tier ORDER BY day) AS island FROM t), iv AS (SELECT user_id, tier, min(day) AS from_day, max(day) AS to_day FROM g GROUP BY user_id, tier, island) SELECT e.event_id, e.user_id, strftime(e.ts, $TS6) AS ts_s, e.value, iv.tier, strftime(iv.from_day, $TS0) AS valid_from, strftime(iv.to_day, $TS0) AS valid_to FROM events e JOIN iv ON e.user_id = iv.user_id AND date_trunc('day', e.ts) >= iv.from_day AND date_trunc('day', e.ts) <= iv.to_day WHERE e.event_type = 'purchase' ORDER BY e.event_id""",
    "scd2_intervals" ->
      s"""WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n FROM events GROUP BY 1, 2), t AS (SELECT *, CASE WHEN n >= 4 THEN 'high' WHEN n >= 2 THEN 'mid' ELSE 'low' END AS tier FROM daily), g AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY day) - row_number() OVER (PARTITION BY user_id, tier ORDER BY day) AS island FROM t) SELECT user_id, tier, strftime(min(day), $TS0) AS valid_from, strftime(max(day), $TS0) AS valid_to, count(*) AS n_days, CAST(sum(n) AS BIGINT) AS n_events FROM g GROUP BY user_id, tier, island ORDER BY user_id, valid_from""",
    "text_repetition_ratio" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents), bg AS (SELECT doc_id, t[CAST(i+1 AS INT)] || ' ' || t[CAST(i+2 AS INT)] AS bigram FROM (SELECT doc_id, t, unnest(range(len(t)-1)) AS i FROM toks WHERE len(t) >= 2)), c AS (SELECT doc_id, bigram, count(*) AS n FROM bg GROUP BY 1, 2) SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams, count(*) AS n_distinct, CAST(max(n) AS BIGINT) AS top_n, 1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS dup_frac, CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS top_share FROM c GROUP BY doc_id ORDER BY doc_id""",
    "text_decontaminate" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents), g AS (SELECT DISTINCT doc_id, t[CAST(i+1 AS INT)] || ' ' || t[CAST(i+2 AS INT)] || ' ' || t[CAST(i+3 AS INT)] AS gram FROM (SELECT doc_id, t, unnest(range(len(t)-2)) AS i FROM toks WHERE len(t) >= 3)), bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0), h AS (SELECT doc_id, count(*) AS shared FROM g JOIN bench USING (gram) WHERE doc_id % 10 <> 0 GROUP BY doc_id) SELECT d.doc_id, CAST(coalesce(h.shared, 0) AS BIGINT) AS n_shared, CAST(CASE WHEN coalesce(h.shared, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated FROM documents d LEFT JOIN h USING (doc_id) WHERE d.doc_id % 10 <> 0 ORDER BY d.doc_id""",
    "events_transition_matrix" ->
      "WITH p AS (SELECT event_type AS cur_type, lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type FROM events), c AS (SELECT cur_type, next_type, count(*) AS n FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2) SELECT cur_type, next_type, n, CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY cur_type) AS DOUBLE) AS p_next FROM c ORDER BY cur_type, next_type",
    "agg_count_min" ->
      "WITH ex AS (SELECT event_type, unnest(range(4)) AS j FROM events), cms AS (SELECT j, ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || event_type), 1, 8))::BIGINT % 64 AS cell, count(*) AS n FROM ex GROUP BY 1, 2), keys AS (SELECT event_type, j, ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || event_type), 1, 8))::BIGINT % 64 AS cell FROM (SELECT DISTINCT event_type FROM events), range(4) r(j)), est AS (SELECT event_type, CAST(min(n) AS BIGINT) AS n_est FROM keys JOIN cms USING (j, cell) GROUP BY event_type) SELECT t.event_type, t.n_true, est.n_est FROM (SELECT event_type, count(*) AS n_true FROM events GROUP BY 1) t JOIN est USING (event_type) ORDER BY event_type",
    "profile_columns" ->
      """WITH b AS (SELECT count(*) AS n_rows, count(event_id) AS nn_event_id, count(DISTINCT event_id) AS nd_event_id, count(ts) AS nn_ts, count(DISTINCT ts) AS nd_ts, count(user_id) AS nn_user_id, count(DISTINCT user_id) AS nd_user_id, count(event_type) AS nn_event_type, count(DISTINCT event_type) AS nd_event_type, count(value) AS nn_value, count(DISTINCT value) AS nd_value, count(props) AS nn_props, count(DISTINCT props) AS nd_props FROM events) SELECT col_name, n_rows, n_nonnull, n_rows - n_nonnull AS n_null, n_distinct FROM (SELECT 'event_id' AS col_name, n_rows, nn_event_id AS n_nonnull, nd_event_id AS n_distinct FROM b UNION ALL SELECT 'ts', n_rows, nn_ts, nd_ts FROM b UNION ALL SELECT 'user_id', n_rows, nn_user_id, nd_user_id FROM b UNION ALL SELECT 'event_type', n_rows, nn_event_type, nd_event_type FROM b UNION ALL SELECT 'value', n_rows, nn_value, nd_value FROM b UNION ALL SELECT 'props', n_rows, nn_props, nd_props FROM b) ORDER BY col_name""",
    // engine-neutral dow: (days-since-epoch + 4) mod 7, Sunday=0 — avoids
    // Spark's Sunday=1 vs DuckDB's Sunday=0 convention mismatch
    "stat_seasonality" ->
      s"""SELECT event_type, (epoch_us(ts) // 86400000000 + 4) % 7 AS dow, hour(ts) AS hod, count(*) AS n, $DAVG AS avg_value FROM events GROUP BY 1, 2, 3 ORDER BY event_type, dow, hod""",
    "window_mad_hours" ->
      s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n FROM events GROUP BY 1, 2), r AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type ORDER BY n, hour) AS BIGINT) AS rn, count(*) OVER (PARTITION BY event_type) AS nn FROM h), m AS (SELECT event_type, max(CASE WHEN rn = CAST(ceil(nn * 0.5) AS BIGINT) THEN n END) AS med FROM r GROUP BY 1), d AS (SELECT h.event_type, h.hour, h.n, m.med, abs(h.n - m.med) AS dev FROM h JOIN m USING (event_type)), r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type ORDER BY dev, hour) AS BIGINT) AS rn, count(*) OVER (PARTITION BY event_type) AS nn FROM d), m2 AS (SELECT event_type, max(CASE WHEN rn = CAST(ceil(nn * 0.5) AS BIGINT) THEN dev END) AS mad FROM r2 GROUP BY 1) SELECT d.event_type, strftime(d.hour, $TS0) AS hour_s, d.n, d.med, d.dev, m2.mad, d.dev > 3 * m2.mad AS is_anomaly FROM d JOIN m2 USING (event_type) ORDER BY event_type, hour_s""",
    "stat_autocorr_lag" ->
      "WITH h AS (SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hu, count(*) AS n FROM events GROUP BY 1, 2), p AS (SELECT a.event_type, l.lag, a.n AS x, b.n AS y FROM h a CROSS JOIN (VALUES (CAST(1 AS BIGINT)), (CAST(24 AS BIGINT))) l(lag) JOIN h b ON b.event_type = a.event_type AND b.hu = a.hu + l.lag * 3600000000), s AS (SELECT event_type, lag, count(*) AS n_pairs, CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx, CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy, CAST(sum(CAST(x*y AS HUGEINT)) AS DOUBLE) AS sxy, CAST(sum(CAST(x*x AS HUGEINT)) AS DOUBLE) AS sxx, CAST(sum(CAST(y*y AS HUGEINT)) AS DOUBLE) AS syy FROM p GROUP BY 1, 2) SELECT event_type, lag, n_pairs, (n_pairs * sxy - sx * sy) / (sqrt(n_pairs * sxx - sx * sx) * sqrt(n_pairs * syy - sy * sy)) AS autocorr FROM s WHERE n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0 ORDER BY event_type, lag",
    // running sum stays on INTEGER counts (exact under any window-eval
    // order); the mean enters once per row via S_t - t*mean, a fixed
    // 3-op double chain both engines round identically
    "window_cusum" ->
      s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n FROM events GROUP BY 1, 2), w AS (SELECT event_type, hour, n, sum(n) OVER (PARTITION BY event_type ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_t, CAST(row_number() OVER (PARTITION BY event_type ORDER BY hour) AS BIGINT) AS t_idx, CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE) / CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE) AS mean_n FROM h) SELECT event_type, strftime(hour, $TS0) AS hour_s, n, CAST(s_t AS DOUBLE) - CAST(t_idx AS DOUBLE) * mean_n AS cusum FROM w ORDER BY event_type, hour_s""",
    "agg_time_weighted_avg" ->
      "WITH o AS (SELECT user_id, event_id, value, epoch_us(ts) AS tu, lag(value) OVER w AS pv, lag(epoch_us(ts)) OVER w AS ptu FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), s AS (SELECT user_id, count(*) AS n_segments, CAST(sum(CAST(floor((value + pv) / 2.0 * (CAST(tu - ptu AS DOUBLE) / 1000000.0) * 1048576.0) AS BIGINT)) AS DOUBLE) AS area_q, max(tu) - min(ptu) AS span_us FROM o WHERE ptu IS NOT NULL GROUP BY 1) SELECT user_id, n_segments, (area_q / 1048576.0) / (CAST(span_us AS DOUBLE) / 1000000.0) AS twa FROM s WHERE span_us > 0 ORDER BY user_id",
    "profile_key_skew" ->
      "WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1), r AS (SELECT cnt, CAST(row_number() OVER (ORDER BY cnt, user_id) AS BIGINT) AS rn, CAST(count(*) OVER () AS BIGINT) AS nk FROM c), s AS (SELECT max(nk) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows, max(cnt) AS max_cnt, max(CASE WHEN rn = CAST(ceil(nk * 0.5) AS BIGINT) THEN cnt END) AS med_cnt, CAST(sum(CASE WHEN rn > nk - 10 THEN cnt ELSE 0 END) AS BIGINT) AS top10_rows FROM r) SELECT n_keys, n_rows, max_cnt, med_cnt, CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE) AS avg_cnt, CAST(top10_rows AS DOUBLE) / CAST(n_rows AS DOUBLE) AS top10_share FROM s",
    "window_minmax_scale" ->
      "WITH w AS (SELECT event_id, event_type, value, min(value) OVER (PARTITION BY event_type) AS mn, max(value) OVER (PARTITION BY event_type) AS mx FROM events) SELECT event_id, event_type, value, CASE WHEN mx > mn THEN (value - mn) / (mx - mn) ELSE 0.5 END AS scaled FROM w ORDER BY event_id",
    "clean_winsorize" ->
      "WITH r AS (SELECT event_type, value, event_id, CAST(row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rn, count(*) OVER (PARTITION BY event_type) AS n FROM events), b AS (SELECT event_type, max(CASE WHEN rn = CAST(ceil(n * 0.01) AS BIGINT) THEN value END) AS lo_v, max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN value END) AS hi_v FROM r GROUP BY 1) SELECT e.event_id, e.event_type, e.value, least(greatest(e.value, b.lo_v), b.hi_v) AS value_w FROM events e JOIN b USING (event_type) ORDER BY event_id",
    "stat_regression_hourly" ->
      "WITH h AS (SELECT event_type, epoch_us(date_trunc('hour', ts)) // 3600000000 - 473352 AS x, count(*) AS y FROM events GROUP BY 1, 2), s AS (SELECT event_type, count(*) AS n_hours, CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx, CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy, CAST(sum(CAST(x*y AS HUGEINT)) AS DOUBLE) AS sxy, CAST(sum(CAST(x*x AS HUGEINT)) AS DOUBLE) AS sxx FROM h GROUP BY 1) SELECT event_type, n_hours, (n_hours * sxy - sx * sy) / (n_hours * sxx - sx * sx) AS slope, (sy - (n_hours * sxy - sx * sy) / (n_hours * sxx - sx * sx) * sx) / n_hours AS intercept FROM s WHERE (n_hours * sxx - sx * sx) > 0 ORDER BY event_type",
    "text_tfidf_topk" ->
      "WITH tf AS (SELECT doc_id, token, count(*) AS tf FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents) GROUP BY 1, 2), df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1), nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents), s AS (SELECT tf.doc_id, tf.token, tf.tf, df.df, CAST(tf.tf AS DOUBLE) * (CAST(nd.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS score FROM tf JOIN df USING (token) CROSS JOIN nd), r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS BIGINT) AS rn FROM s) SELECT doc_id, rn, token, tf, df, score FROM r WHERE rn <= 5 ORDER BY doc_id, rn",
    // non-overlapping 8-token passages; nd counts DISTINCT docs so
    // within-doc repeats never mark a passage duplicated
    "text_passage_dedup" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents), seg AS (SELECT doc_id, md5(list_aggregate(ts[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], 'string_agg', ' ')) AS p FROM (SELECT doc_id, ts, unnest(range(CAST(floor(len(ts)/8) AS BIGINT))) AS i FROM toks WHERE len(ts) >= 8)), c AS (SELECT p, count(DISTINCT doc_id) AS nd FROM seg GROUP BY 1) SELECT s.doc_id, count(*) AS n_passages, CAST(sum(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup, CAST(sum(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_ratio FROM seg s JOIN c USING (p) GROUP BY 1 ORDER BY 1""",
    // PQ over the int8 codes: distances are pure integer arithmetic, so
    // the learned-codebook argmin can never flip on a float ulp
    "emb_pq_codes" ->
      """WITH d AS (SELECT vec_id, CAST(i AS BIGINT) AS dim, v[CAST(i+1 AS INT)] AS x FROM (SELECT vec_id, embedding::DOUBLE[] v, unnest(range(64)) AS i FROM embeddings)), m AS (SELECT vec_id, max(abs(x)) / 127 AS scale FROM d GROUP BY 1), q AS (SELECT d.vec_id, d.dim, CASE WHEN m.scale = 0 THEN 0 ELSE least(greatest(CAST(floor(x / m.scale + 0.5) AS BIGINT), -127), 127) END AS q FROM d JOIN m USING (vec_id)), pr AS (SELECT vec_id, dim // 8 AS sub, dim % 8 AS k, q FROM q), cb AS (SELECT vec_id AS cid, sub, k, q AS qc FROM pr WHERE vec_id < 16), dist AS (SELECT pr.vec_id, pr.sub, cb.cid, CAST(sum((pr.q - cb.qc) * (pr.q - cb.qc)) AS BIGINT) AS dist2 FROM pr JOIN cb ON pr.sub = cb.sub AND pr.k = cb.k GROUP BY 1, 2, 3), best AS (SELECT vec_id, sub, cid, dist2, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist2, cid) AS rn FROM dist) SELECT vec_id, CAST(sub AS BIGINT) AS sub, cid AS code, dist2 FROM best WHERE rn = 1 ORDER BY vec_id, sub""",
    // ADC reuses the PQ distance CTE: `dist` serves both the code
    // assignment (argmin) and the query distance tables — as in Scala
    "sim_search_pq_adc" ->
      """WITH d AS (SELECT vec_id, CAST(i AS BIGINT) AS dim, v[CAST(i+1 AS INT)] AS x FROM (SELECT vec_id, embedding::DOUBLE[] v, unnest(range(64)) AS i FROM embeddings)), m AS (SELECT vec_id, max(abs(x)) / 127 AS scale FROM d GROUP BY 1), q AS (SELECT d.vec_id, d.dim, CASE WHEN m.scale = 0 THEN 0 ELSE least(greatest(CAST(floor(x / m.scale + 0.5) AS BIGINT), -127), 127) END AS q FROM d JOIN m USING (vec_id)), pr AS (SELECT vec_id, dim // 8 AS sub, dim % 8 AS k, q FROM q), cb AS (SELECT vec_id AS cid, sub, k, q AS qc FROM pr WHERE vec_id < 16), dist AS (SELECT pr.vec_id, pr.sub, cb.cid, CAST(sum((pr.q - cb.qc) * (pr.q - cb.qc)) AS BIGINT) AS dist2 FROM pr JOIN cb ON pr.sub = cb.sub AND pr.k = cb.k GROUP BY 1, 2, 3), best AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist2, cid) AS rn FROM dist), codes AS (SELECT vec_id, sub, cid AS code FROM best WHERE rn = 1), dt AS (SELECT vec_id AS query_id, sub, cid, dist2 FROM dist WHERE vec_id < 10), scored AS (SELECT dt.query_id, c.vec_id, CAST(sum(dt.dist2) AS BIGINT) AS adc_dist2 FROM codes c JOIN dt ON c.sub = dt.sub AND c.code = dt.cid WHERE c.vec_id <> dt.query_id GROUP BY 1, 2), r AS (SELECT query_id, vec_id, adc_dist2, CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc_dist2, vec_id) AS BIGINT) AS rn FROM scored) SELECT query_id, rn, vec_id, adc_dist2 FROM r WHERE rn <= 10 ORDER BY query_id, rn""",
    "events_path_topk" ->
      """WITH p AS (SELECT event_type AS t0, lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1, lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2 FROM events), c AS (SELECT t0 || '>' || t1 || '>' || t2 AS path, count(*) AS n FROM p WHERE t2 IS NOT NULL GROUP BY 1), r AS (SELECT path, n, CAST(row_number() OVER (ORDER BY n DESC, path) AS BIGINT) AS rn FROM c) SELECT rn, path, n FROM r WHERE rn <= 10 ORDER BY rn""",
    "join_asof_forward" ->
      s"""SELECT p.event_id, p.user_id, strftime(p.ts, $TS6) AS ts_s, c.value AS next_click_value, strftime(c.ts, $TS6) AS next_click_ts_s FROM (SELECT * FROM events WHERE event_type = 'purchase') p ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c ON p.user_id = c.user_id AND p.ts <= c.ts ORDER BY p.event_id""",
    "window_streaks" ->
      s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n FROM events GROUP BY 1, 2), f AS (SELECT event_type, hour, n, n >= 4 AS hot, row_number() OVER (PARTITION BY event_type ORDER BY hour) - row_number() OVER (PARTITION BY event_type, n >= 4 ORDER BY hour) AS grp FROM h) SELECT event_type, strftime(min(hour), $TS0) AS streak_start_s, strftime(max(hour), $TS0) AS streak_end_s, count(*) AS len_hours, CAST(sum(n) AS BIGINT) AS total_events FROM f WHERE hot GROUP BY event_type, grp ORDER BY event_type, streak_start_s""",
    // lift = N·n12/(n1·n2): monotone in PMI, no ln — ranking identical
    "text_token_lift" ->
      "WITH tk AS (SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS t FROM documents), df AS (SELECT t, count(*) AS n_t FROM tk GROUP BY 1 HAVING count(*) BETWEEN 2 AND 450), k AS (SELECT tk.doc_id, tk.t, df.n_t FROM tk JOIN df USING (t)), p AS (SELECT a.t AS t1, b.t AS t2, a.n_t AS n1, b.n_t AS n2, count(*) AS n_12 FROM k a JOIN k b ON a.doc_id = b.doc_id AND a.t < b.t GROUP BY 1, 2, 3, 4 HAVING count(*) >= 25), nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents), s AS (SELECT t1, t2, n1, n2, n_12, CAST(nd.n * n_12 AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS lift FROM p CROSS JOIN nd), r AS (SELECT *, CAST(row_number() OVER (ORDER BY lift DESC, t1, t2) AS BIGINT) AS rn FROM s) SELECT rn, t1, t2, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2, CAST(n_12 AS BIGINT) AS n_12, lift FROM r WHERE rn <= 50 ORDER BY rn",
    // z = (n·x − s1)/sqrt(n·s2 − s1²): exact-integer numerator/radicand,
    // one IEEE sqrt + one divide — the adaptive baseline hash-matches
    "window_rolling_zscore" ->
      "WITH h AS (SELECT event_type, epoch_us(date_trunc('hour', ts)) // 3600000000 AS hu, count(*) AS x FROM events GROUP BY 1, 2), w AS (SELECT event_type, hu, x, CAST(count(*) OVER fr AS BIGINT) AS n, CAST(sum(x) OVER fr AS BIGINT) AS s1, CAST(sum(x*x) OVER fr AS BIGINT) AS s2 FROM h WINDOW fr AS (PARTITION BY event_type ORDER BY hu RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)) SELECT event_type, hu, x, n, CASE WHEN n >= 12 AND n*s2 - s1*s1 > 0 THEN CAST(n*x - s1 AS DOUBLE) / sqrt(CAST(n*s2 - s1*s1 AS DOUBLE)) END AS rolling_z FROM w ORDER BY event_type, hu",
    "window_pct_change" ->
      s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n FROM events GROUP BY 1, 2), l AS (SELECT event_type, hour, n, lag(n, 1) OVER (PARTITION BY event_type ORDER BY hour) AS prev_n FROM h) SELECT event_type, strftime(hour, $TS0) AS hour_s, n, prev_n, CASE WHEN prev_n > 0 THEN CAST(n - prev_n AS DOUBLE) / prev_n END AS pct_change FROM l ORDER BY event_type, hour_s""",
    // fixed-point integer PageRank, 3 unrolled iterations — integer sums
    // are exact under any order, so an ITERATIVE algorithm hash-matches
    "graph_pagerank_types" ->
      """WITH e AS (SELECT event_type AS src, lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM events), ed AS (SELECT src, dst, count(*) AS n FROM e WHERE dst IS NOT NULL GROUP BY 1, 2), deg AS (SELECT src, CAST(sum(n) AS BIGINT) AS deg FROM ed GROUP BY 1), nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM ed UNION SELECT dst FROM ed)), nn AS (SELECT count(*) AS n FROM nodes), p0 AS (SELECT node, 1000000000000 // (SELECT n FROM nn) AS p FROM nodes), c1 AS (SELECT ed.dst AS node, sum((p0.p * ed.n) // deg.deg) AS inflow FROM ed JOIN p0 ON ed.src = p0.node JOIN deg ON ed.src = deg.src GROUP BY 1), p1 AS (SELECT nodes.node, (15 * (1000000000000 // (SELECT n FROM nn)) // 100) + (coalesce(c1.inflow, 0) * 85) // 100 AS p FROM nodes LEFT JOIN c1 USING (node)), c2 AS (SELECT ed.dst AS node, sum((p1.p * ed.n) // deg.deg) AS inflow FROM ed JOIN p1 ON ed.src = p1.node JOIN deg ON ed.src = deg.src GROUP BY 1), p2 AS (SELECT nodes.node, (15 * (1000000000000 // (SELECT n FROM nn)) // 100) + (coalesce(c2.inflow, 0) * 85) // 100 AS p FROM nodes LEFT JOIN c2 USING (node)), c3 AS (SELECT ed.dst AS node, sum((p2.p * ed.n) // deg.deg) AS inflow FROM ed JOIN p2 ON ed.src = p2.node JOIN deg ON ed.src = deg.src GROUP BY 1), p3 AS (SELECT nodes.node, (15 * (1000000000000 // (SELECT n FROM nn)) // 100) + (coalesce(c3.inflow, 0) * 85) // 100 AS p FROM nodes LEFT JOIN c3 USING (node)) SELECT node, CAST(p AS BIGINT) AS rank_pico, CAST(p AS DOUBLE) / 1e12 AS rank FROM p3 ORDER BY rank_pico DESC, node""",
    "events_session_stats" ->
      """WITH g AS (SELECT user_id, event_id, ts, event_type, value, epoch_us(ts) e_us, lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev_us FROM events), s AS (SELECT *, CASE WHEN prev_us IS NULL OR e_us - prev_us > 21600000000 THEN 1 ELSE 0 END new_sess FROM g), t AS (SELECT user_id, event_type, value, e_us, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) session_num FROM s) SELECT user_id, session_num, (max(e_us) - min(e_us)) // 1000000 AS duration_s, count(*) AS n_events, CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases, CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0 THEN 1 ELSE 0 END AS BIGINT) AS converted, CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value FROM t GROUP BY 1, 2 ORDER BY 1, 2""",
    // store = even doc_ids (dedup_incremental's convention); quality
    // spelling shared with text_quality_score
    "corpus_refresh_pipeline" ->
      """WITH store AS (SELECT md5(text) AS fp FROM documents WHERE doc_id % 2 = 0 GROUP BY 1), fresh AS (SELECT doc_id, text, n_chars, md5(text) AS fp FROM documents WHERE doc_id % 2 = 1), j AS (SELECT f.doc_id, f.text, f.n_chars, CASE WHEN s.fp IS NOT NULL THEN 1 END AS in_store, row_number() OVER (PARTITION BY f.fp ORDER BY f.doc_id) AS rn FROM fresh f LEFT JOIN store s ON f.fp = s.fp), sc AS (SELECT doc_id, in_store, rn, (CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 20 THEN 1.0 ELSE 0.0 END + CASE WHEN len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) > 0 THEN 1.0 ELSE 0.0 END + (1.0 - CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / greatest(n_chars, 1))) AS quality, CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens FROM j) SELECT doc_id, quality, n_tokens, CASE WHEN in_store IS NOT NULL THEN 'dup_store' WHEN rn > 1 THEN 'dup_batch' WHEN quality < 1.5 THEN 'low_quality' ELSE 'selected' END AS status FROM sc ORDER BY doc_id""",
    // same quality spelling as sample_upweight / text_quality_score
    "corpus_budget_select" ->
      """WITH s AS (SELECT doc_id, (CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 20 THEN 1.0 ELSE 0.0 END + CASE WHEN len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) > 0 THEN 1.0 ELSE 0.0 END + (1.0 - CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / greatest(n_chars, 1))) AS quality, CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens FROM documents), r AS (SELECT doc_id, quality, n_tokens, CAST(row_number() OVER (ORDER BY quality DESC, doc_id) AS BIGINT) AS rank, CAST(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens FROM s) SELECT rank, doc_id, quality, n_tokens, cum_tokens FROM r WHERE cum_tokens <= 20000 ORDER BY rank""",
  )
}
