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
    "join_asof_nearest"     -> ((s, d) => Joins.joinAsofNearest(events(s, d))),
    "join_semi_active_nodes"  -> ((s, d) => Joins.joinSemiActiveNodes(customer(s, d), orders(s, d))),
    "join_anti_unknown_nodes" -> ((s, d) => Joins.joinAntiUnknownNodes(customer(s, d), orders(s, d))),
    // §2.5 aggregations
    "agg_last_seen_per_node"-> ((s, d) => Aggs.aggLastSeenPerNode(events(s, d))),
    "agg_metrics_summary"   -> ((s, d) => Aggs.aggMetricsSummary(events(s, d))),
    "agg_count_by_type"     -> ((s, d) => Aggs.aggCountByType(events(s, d))),
    "agg_distinct_nodes"    -> ((s, d) => Aggs.aggDistinctNodes(events(s, d))),
    "agg_time_bucket"       -> ((s, d) => Aggs.aggTimeBucket(events(s, d))),
    "agg_rollup_node_day"   -> ((s, d) => Aggs.aggRollupNodeDay(events(s, d))),
    "agg_partial_final"     -> ((s, d) => Aggs.aggPartialFinal(events(s, d))),
    // §2.6 windows
    "window_latest_per_key" -> ((s, d) => Windows.windowLatestPerKey(events(s, d))),
    "window_gap_to_prev"    -> ((s, d) => Windows.windowGapToPrev(events(s, d))),
    "window_moving_avg"     -> ((s, d) => Windows.windowMovingAvg(events(s, d))),
    "window_rank_hottest"   -> ((s, d) => Windows.windowRankHottest(events(s, d))),
    // §2.7 sort/limit/topk
    "sort_by_time"          -> ((s, d) => SetSort.sortByTime(events(s, d))),
    "limit_head"            -> ((s, d) => SetSort.limitHead(events(s, d))),
    "topk_recent_per_node"  -> ((s, d) => SetSort.topkRecentPerNode(events(s, d))),
    // §2.8 set ops
    "union_multi_file"      -> ((s, d) => SetSort.unionMultiFile(events(s, d))),
    "except_missing_nodes"  -> ((s, d) => SetSort.exceptMissingNodes(events(s, d))),
    "intersect_common_times"-> ((s, d) => SetSort.intersectCommonTimes(events(s, d))),
  )

  // DuckDB spellings of the Det helpers (see Det.scala):
  private val DAVG = "CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value)"
  private val TS6 = "'%Y-%m-%d %H:%M:%S.%f'"
  private val TS0 = "'%Y-%m-%d %H:%M:%S'"

  def oracleSql: Map[String, String] = Map(
    "scan_parquet" ->
      s"""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, strftime(l_shipdate, $TS0) AS ship_ts FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, ship_ts""",
    "scan_csv_typed" ->
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
    "join_asof_nearest" ->
      s"""SELECT p.event_id, p.user_id, strftime(p.ts, $TS6) AS ts_s, c.value AS last_click_value, strftime(c.ts, $TS6) AS last_click_ts_s FROM (SELECT * FROM events WHERE event_type = 'purchase') p ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c ON p.user_id = c.user_id AND p.ts >= c.ts ORDER BY p.event_id""",
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
  )
}
