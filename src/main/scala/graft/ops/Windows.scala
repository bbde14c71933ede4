package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Det._

/** Window-function operators (SURVEY.md §2.6, W1–W4).
  *
  * One shuffle on the partition key each; ordering keys always include a
  * unique tiebreaker (event_id) so ranks and frames are deterministic.
  */
object Windows {

  /** W1: latest row per key — last-writer-wins (AIRWISEv0.py:253-254). */
  def windowLatestPerKey(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), fmtTs(col("ts")).as("ts_s"),
        col("event_type"), col("value"))
      .orderBy("user_id")
  }

  /** W2: time since previous message per node — offline-detection input
    * (AIRWISEv0.py:81-84). Gap computed on integer microseconds (exact). */
  def windowGapToPrev(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("e_us", unix_micros(col("ts")))
      .withColumn("gap_us", col("e_us") - lag(col("e_us"), 1).over(w))
      .select(col("event_id"), col("user_id"), fmtTs(col("ts")).as("ts_s"), col("gap_us"))
      .orderBy("event_id")
  }

  /** W3: trailing moving average over the last 6 samples per node
    * (smoothing ext of graphdata.py:98-112). Exact-decimal frame sum so the
    * result doesn't depend on how the engine maintains the sliding frame. */
  def windowMovingAvg(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-5, Window.currentRow)
    events
      .withColumn("moving_avg",
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 6))).over(w)
          .cast("double") / count(col("value")).over(w))
      .select(col("event_id"), col("user_id"), col("value"), col("moving_avg"))
      .orderBy("event_id")
  }

  /** W4: top readings per day — alert prioritization (AIRWISEv0.py:85-90). */
  def windowRankHottest(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("day"))
      .orderBy(col("value").desc, col("event_id"))
    events
      .withColumn("day", date_trunc("day", col("ts")))
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(fmtTsSec(col("day")).as("day_s"), col("rnk"), col("event_id"),
        col("user_id"), col("value"))
      .orderBy("day_s", "rnk", "event_id")
  }

  /** W6 (r4): per-hour busiest event classes — the batch dual (and
    * hash-match oracle anchor) of the streaming trending top-k
    * (`stream/Windowed.trendingTopK`). One (hour, type) count agg + a
    * top-k window on the hour key. */
  def windowTopkHourly(events: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("hour"))
      .orderBy(col("n").desc, col("event_type"))
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(fmtTsSec(col("hour")).as("hour_s"), col("rnk"),
        col("event_type"), col("n"))
      .orderBy("hour_s", "rnk")
  }

  /** W7 (r4): traffic anomaly detection — per event class, hours whose
    * event count deviates from that class's mean by more than `zCut`
    * standard deviations (the alert-threshold analytics behind the
    * reference's offline detector, generalized from "no packets" to "an
    * anomalous packet RATE"). Determinism: counts are integers, so the
    * per-class power sums are exact (DECIMAL(38,0)), and mean/var/z are a
    * fixed-order chain of correctly-rounded double ops — bit-identical
    * cross-engine, same pattern as `stat_corr_hourly`. Population
    * variance (÷ n), spelled identically in the oracle. */
  def windowZscoreHours(events: DataFrame, zCut: Double = 2.0): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("event_type"))
    val stats = hourly
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x").cast(dec)).over(w).cast("double"))
      .withColumn("sxx", sum((col("x") * col("x")).cast(dec)).over(w).cast("double"))
    val mean = col("sx") / col("n")
    val variance = col("sxx") / col("n") - mean * mean
    stats
      .withColumn("z", (col("x") - mean) / sqrt(variance))
      // variance > 0 guard: a zero/negative-epsilon variance makes z NaN,
      // and NaN comparison semantics differ between engines — exclude
      // degenerate classes identically on both sides
      .filter(variance > 0 && abs(col("z")) > zCut)
      .select(col("event_type"), fmtTsSec(col("hour")).as("hour_s"),
        col("x"), col("z"))
      .orderBy("event_type", "hour_s")
  }

  /** W5 (r3): equal-depth banding — ntile quartiles of value per event
    * class (the "which quartile is this reading in" dashboard column).
    * SQL-standard ntile over a TOTAL order (value, event_id) is fully
    * deterministic — earlier tiles take the remainder rows in every
    * engine — so it hash-matches across engines where percent-style
    * bucketing on ties would not. One window shuffle on the class key. */
  def windowNtileQuartile(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    events
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .select(col("event_id"), col("event_type"), col("value"), col("quartile"))
      .orderBy("event_id")
  }

  /** W6 (r4): relative standing — percent_rank and cume_dist of each
    * reading within its event class. Over a TOTAL order (value,
    * event_id) both are single int/int double divisions of rank counts
    * — exactly rounded, so they hash-match cross-engine where a
    * ties-allowed ordering would not. Shares one window shuffle on the
    * class key (same spec for both functions ⇒ one Window node). */
  def windowPercentRank(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    events
      .select(col("event_id"), col("event_type"), col("value"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("event_id")
  }

  /** W7 (r4): robust hourly anomaly flags via median absolute deviation
    * — the outlier detector that survives the outliers it is hunting
    * (z-scores inflate their own σ; MAD does not), over the same hourly
    * traffic counts as [[windowZscoreHours]]' mean/σ variant. Both
    * medians are the discrete form (value AT row ceil(n/2) in a total
    * order — see Aggs.discreteQuantiles) on INTEGER counts and integer
    * absolute deviations, so every number is exact in both engines and
    * the flag `dev > 3·mad` never sits on a rounding boundary.
    * Scale shape: the raw scan collapses to ≤ types×hours rows in the
    * first hash agg (persisted — everything downstream reuses it);
    * the two median passes and broadcast join-backs run on that tiny
    * frame, so 100 TB of events costs one aggregate + noise. */
  /** W10 (r4): CUSUM drift detection over hourly traffic — the classic
    * change-point statistic (a sustained level shift accumulates where
    * per-hour z/MAD flags only spikes): cusum_t = Σ_{i≤t}(n_i − mean).
    * Exactness: a running DOUBLE sum would be engine-fragile (Spark
    * accumulates frames sequentially, DuckDB may evaluate windowed sums
    * as a segment tree — different addition orders, different rounding),
    * so the running sum stays on INTEGER counts (exact under any
    * evaluation order) and the mean enters once per row through the
    * algebraic identity Σ(n_i − mean) = S_t − t·mean — a fixed 3-op
    * double chain (divide, multiply, subtract), correctly rounded
    * identically in both engines. One hash agg + one window, both on the
    * class key. */
  def windowCusum(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy(col("event_type"))
    val wRun = wAll.orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly
      .withColumn("s_t", sum(col("n")).over(wRun))
      .withColumn("t_idx", row_number().over(wAll.orderBy(col("hour"))).cast("long"))
      .withColumn("mean_n",
        sum(col("n")).over(wAll).cast("double") / count(lit(1)).over(wAll).cast("double"))
      .select(col("event_type"), fmtTsSec(col("hour")).as("hour_s"), col("n"),
        (col("s_t").cast("double") - col("t_idx").cast("double") * col("mean_n"))
          .as("cusum"))
      .orderBy("event_type", "hour_s")
  }

  /** W11 (r4): per-class min-max feature scaling — the normalization step
    * a feature-prep pipeline runs before training ((x−min)/(max−min) per
    * event class). min/max are SELECTIONS, not sums — exact under any
    * partitioning/merge order — and the per-row (subtract, subtract,
    * divide) chain is fixed-order correctly-rounded, so every scaled
    * value hash-matches. Both extrema share one unordered window spec ⇒
    * ONE Window node on the class key (plan-gated); degenerate classes
    * (max = min) pin to 0.5 identically in both engines instead of
    * dividing by zero. */
  def windowMinmaxScale(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
    events
      .withColumn("mn", min(col("value")).over(w))
      .withColumn("mx", max(col("value")).over(w))
      .select(col("event_id"), col("event_type"), col("value"),
        when(col("mx") > col("mn"),
          (col("value") - col("mn")) / (col("mx") - col("mn")))
          .otherwise(lit(0.5)).as("scaled"))
      .orderBy("event_id")
  }

  def windowMadHours(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      .persist()
    def discreteMedian(df: DataFrame, value: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("event_type")).orderBy(col(value), col("hour"))
      df.withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .groupBy(col("event_type"))
        .agg(max(when(col("rn") === ceil(col("nn") * 0.5), col(value))).as(out))
    }
    val med = discreteMedian(hourly, "n", "med")
    val dev = hourly.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("n") - col("med")))
    val mad = discreteMedian(dev, "dev", "mad")
    dev.join(broadcast(mad), Seq("event_type"))
      .select(col("event_type"), fmtTsSec(col("hour")).as("hour_s"), col("n"),
        col("med"), col("dev"), col("mad"),
        (col("dev") > lit(3) * col("mad")).as("is_anomaly"))
      .orderBy("event_type", "hour_s")
  }

  /** r4: high-traffic streaks — maximal runs of consecutive OBSERVED
    * hours at or above a count threshold per class (gaps-and-islands via
    * the row_number-difference trick: within a class, rn_all − rn_flagged
    * is constant exactly along an unbroken run of flagged rows). The
    * sustained-load view alarms care about: one 300-event hour is a
    * spike ([[windowZscoreHours]]), six consecutive ones are an episode.
    * All integers and selections; two row_numbers share the class-key
    * partitioning (one shuffle, two sorts) and the island agg reuses it. */
  def windowStreaks(events: DataFrame, threshold: Long = 4L): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    val wHot = Window.partitionBy(col("event_type"), col("hot")).orderBy(col("hour"))
    hourly
      .withColumn("hot", col("n") >= threshold)
      .withColumn("grp",
        row_number().over(wAll).cast("long") - row_number().over(wHot).cast("long"))
      .filter(col("hot"))
      .groupBy(col("event_type"), col("grp"))
      .agg(fmtTsSec(min(col("hour"))).as("streak_start_s"),
        fmtTsSec(max(col("hour"))).as("streak_end_s"),
        count(lit(1)).as("len_hours"), sum(col("n")).as("total_events"))
      .select(col("event_type"), col("streak_start_s"), col("streak_end_s"),
        col("len_hours"), col("total_events"))
      .orderBy("event_type", "streak_start_s")
  }

  /** r4: trailing-window adaptive z-score — the LIVE form of
    * [[windowZscoreHours]]: each hour judged against its own trailing
    * day's PRECEDING hours (the whole-range baseline absorbs the drift
    * it should be flagging; a ramp looks normal to a detector whose mean
    * already includes the ramp). Algebra keeps it bit-exact: with
    * trailing integer sums s1 = Σx, s2 = Σx² over n preceding hours,
    * z = (n·x − s1)/√(n·s2 − s1²) — numerator and radicand are EXACT
    * integers, so the whole score is two casts, one IEEE-exact sqrt and
    * one divide. Frame is RANGE on the epoch-hour index ending at 1
    * PRECEDING (the current hour must not damp its own baseline); null
    * below `minHours` of history or at zero variance — same CASE both
    * engines. One hash agg collapses the scan; the window runs on the
    * ≤ classes×hours frame. */
  def windowRollingZscore(events: DataFrame, windowHours: Int = 24,
                          minHours: Long = 12L): DataFrame = {
    val fr = Window.partitionBy(col("event_type")).orderBy(col("hu"))
      .rangeBetween(-windowHours.toLong, -1L)
    events
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hu"))
      .agg(count(lit(1)).as("x"))
      .withColumn("n", count(lit(1)).over(fr))
      .withColumn("s1", sum(col("x")).over(fr))
      .withColumn("s2", sum(col("x") * col("x")).over(fr))
      .withColumn("rad", col("n") * col("s2") - col("s1") * col("s1"))
      .select(col("event_type"), col("hu"), col("x"), col("n"),
        when(col("n") >= minHours && col("rad") > 0L,
          (col("n") * col("x") - col("s1")).cast("double") /
            sqrt(col("rad").cast("double"))).as("rolling_z"))
      .orderBy("event_type", "hu")
  }

  /** r4: hour-over-hour percent change per class — the growth-rate view
    * every traffic dashboard overlays ([[windowGapToPrev]]'s aggregate
    * cousin). Change rides integer counts: (n − prev) is exact, the
    * ratio is ONE correctly-rounded divide, null on the first hour and
    * when prev = 0 (identical CASE both engines — percent change from
    * zero is undefined, not infinity). One hash agg + one lag window on
    * the class key. */
  def windowPctChange(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .select(col("event_type"), fmtTsSec(col("hour")).as("hour_s"),
        col("n"), col("prev_n"),
        when(col("prev_n") > 0,
          (col("n") - col("prev_n")).cast("double") / col("prev_n"))
          .as("pct_change"))
      .orderBy("event_type", "hour_s")
  }

  /** r5c4: positional window profile — the remaining ANSI window catalogue
    * in one declared query: `cume_dist` (fraction of the partition at or
    * before this row), `nth_value` (the partition's 2nd value, null until
    * it enters the frame), and `lead` with an explicit default (the
    * sentinel form — the other lag/lead queries use the null form). The
    * ordering key (ts, event_id) is a total order, so the default
    * RANGE-to-current frame equals ROWS-to-current in both engines and
    * cume_dist is exactly rank/n — one correctly-rounded divide. One
    * shuffle on user_id; all three functions share the single sort. */
  def windowPositionProfile(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("value"),
        cume_dist().over(w).as("cume"),
        nth_value(col("value"), 2).over(w).as("second_value"),
        lead(col("value"), 2, -1.0).over(w).as("lead2_or_sentinel"))
      .orderBy("user_id", "event_id")
  }

  /** r5c8: the lag-feature frame — per (user, day): yesterday's value,
    * last week's value, day-over-day delta, and the trailing-7-row mean
    * and sample-std — the feature-engineering staple every tabular-ML
    * pipeline materializes before training (each column exists solo in
    * §2.6; a training table needs them TOGETHER in one pass, which is
    * exactly one exchange on user_id here — six window expressions, one
    * window spec). Rolling moments ride DECIMAL window sums (a bare
    * double `sum() OVER` is order-sensitive and DuckDB folds windows
    * with a segment tree — different addition order, last-ulp smear;
    * decimal is associative so both engines land identically — the
    * [[graft.Det.dsum]] contract applied to frames). Variance via the
    * computational formula in a fixed double chain, floored at 0 so
    * rounding can't produce sqrt(-ε) = NaN. */
  def mlLagFeatures(events: DataFrame): DataFrame = {
    val daily = events.filter(col("value").isNotNull)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(davg(col("value")).as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val w7 = w.rowsBetween(-6, Window.currentRow)
    val n = count(col("v")).over(w7)
    val s1 = sum(col("v").cast("decimal(28,6)")).over(w7).cast("double")
    val s2 = sum((col("v") * col("v")).cast("decimal(28,6)")).over(w7).cast("double")
    val variance = (s2 - s1 * s1 / n.cast("double")) / (n - lit(1)).cast("double")
    daily
      .withColumn("lag1", lag(col("v"), 1).over(w))
      .withColumn("lag7", lag(col("v"), 7).over(w))
      .withColumn("delta1", col("v") - col("lag1"))
      .withColumn("n_window", n)
      .withColumn("roll7_avg", s1 / n.cast("double"))
      .withColumn("roll7_std",
        when(n > 1, sqrt(greatest(variance, lit(0.0)))))
      .select(col("user_id"), fmtTsSec(col("day")).as("day_s"), col("v"),
        col("lag1"), col("lag7"), col("delta1"), col("n_window"),
        col("roll7_avg"), col("roll7_std"))
      .orderBy("user_id", "day_s")
  }

  /** r6: Hampel filter — the robust rolling-median despike every sensor
    * pipeline runs before analytics (a z-score despike chases its own
    * outliers because mean AND σ are contaminated; median/MAD are not —
    * the [[windowMadHours]] robustness argument applied to a rolling
    * per-row frame). Each row is judged against the median of its
    * ±`k`-row window and replaced by it when the deviation exceeds
    * `nSigmas` · 1.4826 · MAD.
    *
    * Exactness: values become integer CENTS (the `stat_benford` idiom);
    * the window arrives as a SORTED ARRAY (collect_list over a bounded
    * ±k frame — ≤ 2k+1 elements, map-side after the one user shuffle),
    * so both medians are pure integer order statistics: med2/mad2 carry
    * lower+upper ×2 (no halving, no interpolation function whose
    * rounding could differ between engines), and the outlier test
    * cross-multiplies — 2·|2x−med2| > nSigmas·1.4826·mad2 — leaving ONE
    * double product chain spelled identically in the oracle. Plan: one
    * shuffle on user_id, one window, map-side array math; the frame is
    * 11 elements regardless of data size. */
  def windowHampel(events: DataFrame, k: Int = 5, nSigmas: Double = 3.0): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-k, k)
    events
      .withColumn("cents",
        (col("value").cast(dec(28, 2)) * 100).cast(dec(38, 0)).cast("long"))
      .withColumn("warr", sort_array(collect_list(col("cents")).over(w)))
      .withColumn("wn", size(col("warr")))
      .withColumn("med2",
        expr("element_at(warr, cast((wn - 1) div 2 + 1 as int))") +
          expr("element_at(warr, cast(wn div 2 + 1 as int))"))
      .withColumn("darr",
        sort_array(transform(col("warr"), x => abs(x * 2 - col("med2")))))
      .withColumn("mad2",
        expr("element_at(darr, cast((wn - 1) div 2 + 1 as int))") +
          expr("element_at(darr, cast(wn div 2 + 1 as int))"))
      .withColumn("dev2", abs(col("cents") * 2 - col("med2")))
      .withColumn("is_outlier",
        (col("dev2") * 2).cast("double") > lit(1.4826) * col("mad2") * lit(nSigmas))
      .select(col("event_id"), col("user_id"), col("value"),
        when(col("is_outlier"), col("med2").cast("double") / 200.0)
          .otherwise(col("value")).as("filtered_value"),
        col("is_outlier"))
      .orderBy("event_id")
  }

  /** r6: running-peak drawdown per series — "how far below the best seen
    * so far", the decay/degradation detector (sensor drift, revenue
    * slumps, model-metric regressions) that pairs with [[windowCusum]]'s
    * mean-shift detector. Pure integer arithmetic: the running max rides
    * the one user-ordered window in CENTS, the drawdown is a subtraction,
    * and its share of the peak is integer parts-per-billion (the
    * `corpus_mix_report` ppb lesson) — nothing to round anywhere. One
    * shuffle on user_id, one growing-frame window (no second sort: the
    * frame reuses the same (ts, event_id) order). */
  def windowDrawdown(events: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("cents",
        (col("value").cast(dec(28, 2)) * 100).cast(dec(38, 0)).cast("long"))
      .withColumn("peak_c", max(col("cents")).over(w))
      .withColumn("drawdown_cents", col("peak_c") - col("cents"))
      .select(col("event_id"), col("user_id"), fmtTs(col("ts")).as("ts_s"),
        col("value"),
        (col("peak_c").cast("double") / 100.0).as("peak_value"),
        col("drawdown_cents"),
        when(col("peak_c") > 0,
          expr("CAST(drawdown_cents AS DECIMAL(38,0)) * 1000000000 DIV peak_c"))
          .as("drawdown_ppb"))
      .orderBy("event_id")
  }

  /** r7: rolling exact MEDIAN over the trailing 7 rows per user — the
    * robust companion to [[windowMovingAvg]] (one outlier drags a mean
    * for 7 rows; the median shrugs it off — the smoothing choice for
    * dirty sensor feeds, and the same center [[windowHampel]] screens
    * against, here emitted as the smoothed series itself). Exactness for
    * free: the median is an ORDER STATISTIC of the frame — sort the
    * collected frame values and take the lower middle (discrete, the
    * `agg_quantiles` contract) — values only, no arithmetic, so it
    * hash-matches any engine. Plan: ONE user-keyed window carries both
    * the collect_list frame and the row count; the per-row sort is a
    * 7-element in-memory sort (bounded by the frame, not the data). */
  def windowRollingMedian(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-6, Window.currentRow)
    events
      .withColumn("arr", sort_array(collect_list(col("value")).over(w)))
      .withColumn("k", size(col("arr")).cast("long"))
      .select(col("event_id"), col("user_id"), fmtTs(col("ts")).as("ts_s"),
        col("value"), col("k").as("n_window"),
        expr("element_at(arr, cast((k + 1) div 2 as int))").as("roll_median"))
      .orderBy("event_id")
  }

  /** r7: local-maximum peak detection on the hourly traffic series per
    * event class — "when did this feed SPIKE?", the alerting primitive
    * between [[windowStreaks]]' run-length view and
    * `stat_changepoint_cusum`'s single level shift: a peak is an interior
    * hour strictly above both neighbors (plateaus are not peaks — no
    * tie-break heuristics, so the predicate is pure integer comparison
    * and trivially engine-exact). Plan: the scan collapses in one
    * (type, hour) hash agg; the lag/lead window runs on the tiny
    * types×hours frame, partitioned by type. */
  def windowPeakDetect(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    events.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("next_n", lead(col("n"), 1).over(w))
      .filter(col("prev_n").isNotNull && col("next_n").isNotNull &&
        col("n") > col("prev_n") && col("n") > col("next_n"))
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        col("n"), col("prev_n"), col("next_n"))
      .orderBy("event_type", "hour_s")
  }

  /** r7: fast/slow SMA crossover signals on the densified hourly traffic
    * series per event class — the trend-flip detector (finance calls the
    * pair "golden/death cross"; an ops feed reads it as "sustained ramp
    * began/ended"). INTEGER END TO END: comparing two moving AVERAGES of
    * counts over windows of 3 and 24 is the same as comparing the
    * cross-multiplied SUMS (24·fastSum vs 3·slowSum) — no division ever
    * happens in the signal path, so the flip predicate is pure int64
    * comparison and engine-exact (the display averages divide only at
    * the edge, one fixed IEEE op each). Gaps are densified to zero-count
    * hours first (explode(sequence) off the per-type min/max — the
    * `stat_poisson_dispersion` grid pattern) because a silent feed IS
    * trend information. A signal fires only when both windows are full
    * (rn > slow). Plan: one (type, hour) hash agg collapses the scan;
    * grid join + windows run on the tiny types×hours frame. */
  def tsSmaCrossover(events: DataFrame, fast: Int = 3, slow: Int = 24): DataFrame = {
    val hourly = events.groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hu"))
      .agg(count(lit(1)).as("n"))
    val grid = hourly.groupBy(col("event_type"))
      .agg(min(col("hu")).as("mn"), max(col("hu")).as("mx"))
      .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("hu"))
    val dense = grid.join(hourly, Seq("event_type", "hu"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hu"))
    val wF = wOrd.rowsBetween(-(fast - 1), Window.currentRow)
    val wS = wOrd.rowsBetween(-(slow - 1), Window.currentRow)
    dense
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("fsum", sum(col("n")).over(wF))
      .withColumn("ssum", sum(col("n")).over(wS))
      .withColumn("diff",
        lit(slow.toLong) * col("fsum") - lit(fast.toLong) * col("ssum"))
      .withColumn("prev_diff", lag(col("diff"), 1).over(wOrd))
      .filter(col("rn") > slow &&
        ((col("diff") > 0 && col("prev_diff") <= 0) ||
         (col("diff") < 0 && col("prev_diff") >= 0)))
      .select(col("event_type"),
        fmtTsSec(timestamp_micros(col("hu") * lit(3600000000L))).as("hour_ts"),
        (col("fsum").cast("double") / fast).as("fast_avg"),
        (col("ssum").cast("double") / slow).as("slow_avg"),
        when(col("diff") > 0, lit("golden")).otherwise(lit("death")).as("signal"))
      .orderBy("event_type", "hour_ts")
  }

  /** r7b: RSI (relative strength index) over the trailing 14 same-user
    * deltas — the mean-reversion gauge completing the TA trio with
    * [[tsSmaCrossover]] (trend flips) and [[windowBollinger]] (band
    * breakouts): RSI > 70 overbought / < 30 oversold, read on sensor
    * data as "has this feed been ratcheting one way". INTEGER except the
    * last op: deltas are cent differences, gains/losses split by sign,
    * and RSI = 100·G/(G+L) — the textbook 100−100/(1+RS) algebraically
    * collapsed to ONE divide, so the whole window stack is int64 sums
    * and the single division is the only IEEE op (null when G+L = 0:
    * a flat window has no strength to index). One user-keyed window
    * stack (lag + two trailing sums + count), full windows only. */
  def windowRsi(events: DataFrame, n: Int = 14): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wN = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    events.filter(col("value").isNotNull)
      .withColumn("c",
        (col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)) * 100)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).cast("long"))
      .withColumn("d", col("c") - lag(col("c"), 1).over(wOrd))
      .withColumn("gain", when(col("d") > 0, col("d")).otherwise(lit(0L)))
      .withColumn("loss", when(col("d") < 0, -col("d")).otherwise(lit(0L)))
      .withColumn("nd", count(col("d")).over(wN))
      .withColumn("g", sum(col("gain")).over(wN))
      .withColumn("l", sum(col("loss")).over(wN))
      .filter(col("nd") === n)
      .select(col("user_id"), col("event_id"), fmtTs(col("ts")).as("ts_s"),
        col("value"), col("g").as("gain_cents"), col("l").as("loss_cents"),
        when(col("g") + col("l") > 0,
          lit(100.0) * col("g").cast("double") /
            (col("g") + col("l")).cast("double")).as("rsi"))
      .orderBy("user_id", "event_id")
  }

  /** r7: Bollinger-band breakout screen — flag readings outside
    * mean ± 2σ of the PRIOR 24 same-user readings (prior window: the
    * band a streaming monitor would have had at arrival time, and the
    * tested row never contaminates its own band — the [[windowHampel]]
    * contract with variance bands instead of MAD). The σ comparison
    * never computes σ: with cents c, prior-window sums S₁, S₂ and full
    * window size n, |v−μ| > 2σ  ⟺  (n·c − S₁)² > 4·(n·S₂ − S₁²) after
    * multiplying through by n² — all DECIMAL(38,0) integer arithmetic,
    * no sqrt, no division, engine-exact by construction. Only breakout
    * rows are emitted (the screen's output is its alerts); the display
    * mean divides at the edge via the split cast. Plan: one user-keyed
    * window stack (three aggregates, one frame), map-side predicate. */
  def windowBollinger(events: DataFrame, n: Int = 24): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-n, -1)
    events.filter(col("value").isNotNull)
      .withColumn("c",
        (col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)) * 100)
          .cast(dec))
      .withColumn("cnt", count(col("c")).over(w))
      .withColumn("s1", sum(col("c")).over(w))
      .withColumn("s2", sum(col("c") * col("c")).over(w))
      .filter(col("cnt") === n)
      .withColumn("dev", lit(n.toLong) * col("c") - col("s1"))
      .withColumn("var4",
        lit(4L) * (lit(n.toLong) * col("s2") - col("s1") * col("s1")))
      .filter(col("dev") * col("dev") > col("var4"))
      .select(col("user_id"), col("event_id"), fmtTs(col("ts")).as("ts_s"),
        col("value"),
        (graft.Det.decToDouble(col("s1")) / lit(n.toDouble) / lit(100.0))
          .as("mean_prior"),
        when(col("dev") > 0, lit("above")).otherwise(lit("below")).as("side"))
      .orderBy("user_id", "event_id")
  }

  /** r8: Average True Range over hourly value bars per event class — the
    * volatility gauge that pairs [[windowRsi]] (momentum) and
    * [[windowBollinger]] (band breakouts): TR = max(high−low, |high−prev
    * close|, |low−prev close|) captures gap moves a plain high−low range
    * misses; ATR is its n-bar mean. Bars come from the
    * [[graft.ops.Aggs.aggOhlcHourly]] recipe in integer CENTS (open/close
    * are row_number selections, high/low min/max selections — all exact);
    * TR is greatest/abs on integers, the rolling sum stays integer, and
    * the only arithmetic is the final /n/100 fixed divide chain. Plan:
    * one (class, hour) window+agg collapses the facts to bars, then one
    * class-key window over the tiny time-bounded bar frame. */
  def windowAtr(events: DataFrame, n: Int = 14): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val part = Window.partitionBy(col("event_type"), col("hr"))
    val wb = part.orderBy(col("ts"), col("event_id"))
    val bars = events.filter(col("value").isNotNull)
      .withColumn("hr", date_trunc("hour", col("ts")))
      .withColumn("c0",
        (col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)) * 100)
          .cast(dec).cast("long"))
      .withColumn("rn", row_number().over(wb))
      .withColumn("cnt", count(lit(1)).over(part))
      .groupBy(col("event_type"), col("hr"))
      .agg(max(col("c0")).as("h"), min(col("c0")).as("l"),
        max(when(col("rn") === col("cnt"), col("c0"))).as("cl"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wN = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    bars
      .withColumn("pc", lag(col("cl"), 1).over(wOrd))
      .withColumn("tr", when(col("pc").isNotNull,
        greatest(col("h") - col("l"),
          abs(col("h") - col("pc")), abs(col("l") - col("pc")))))
      .withColumn("ntr", count(col("tr")).over(wN))
      .withColumn("trs", sum(col("tr")).over(wN))
      .filter(col("ntr") === n)
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        col("tr").as("tr_cents"), col("trs").as("tr_sum_cents"),
        (col("trs").cast("double") / lit(n.toDouble) / lit(100.0)).as("atr"))
      .orderBy("event_type", "hour_s")
  }

  /** r9: stochastic oscillator %K/%D per user — the range-position read
    * completing the TA family's fourth face (RSI = momentum magnitude,
    * Bollinger = band breakout, ATR = range size; %K says WHERE in the
    * trailing range the value sits, the overbought/oversold screen):
    * %K = 100·(c − loN)/(hiN − loN) over the trailing n readings,
    * %D = the 3-reading smoothing of %K. The reference eyeballs exactly
    * this on its comparison plots (`graphdata.py:98-192` — "is the
    * reading near its recent high"); this is the queryable form.
    *
    * Exactness: hi/lo/close are SELECTIONS over integer cents (exact
    * under any merge order); %K is one integer-difference divide; %D is
    * the explicit lag chain (k₋₂ + k₋₁ + k)/3 — NOT a windowed avg over
    * doubles (a frame-sum of doubles is fold-order-sensitive; the lag
    * spelling fixes the add order textually in both engines). Warm-up
    * rows (fewer than n in frame) are filtered AFTER the lag chain, so
    * %D's first values smooth over the same partial-window %Ks in both
    * engines — mirrored exactly. Flat windows (hi = lo) yield null %K
    * (and propagate null into %D), not a 0/0. Plan: one user-keyed
    * window stack (count/max/min, one frame) + two lags on the same
    * sort — a single exchange, all map-side after it. */
  def windowStochastic(events: DataFrame, n: Int = 14): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wN = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    events.filter(col("value").isNotNull)
      .withColumn("c",
        (col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)) * 100)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).cast("long"))
      .withColumn("nd", count(col("c")).over(wN))
      .withColumn("hi", max(col("c")).over(wN))
      .withColumn("lo", min(col("c")).over(wN))
      .withColumn("k", when(col("hi") > col("lo"),
        lit(100.0) * (col("c") - col("lo")).cast("double") /
          (col("hi") - col("lo")).cast("double")))
      .withColumn("kd",
        (lag(col("k"), 2).over(wOrd) + lag(col("k"), 1).over(wOrd) + col("k")) /
          lit(3.0))
      .filter(col("nd") === n)
      .select(col("user_id"), col("event_id"), fmtTs(col("ts")).as("ts_s"),
        col("value"), col("hi").as("hi_cents"), col("lo").as("lo_cents"),
        col("k").as("pct_k"), col("kd").as("pct_d"))
      .orderBy("user_id", "event_id")
  }

  /** r9: Keltner channel per event class — the band read BETWEEN
    * [[windowBollinger]] (σ bands — widen on ANY volatility, including
    * gaps) and [[windowAtr]] (range size alone, no center): a trailing
    * center line of TYPICAL price with bands at the trailing mean RANGE,
    * the envelope that says "is this close outside what the recent bar
    * geometry supports". Deliberately Chester Keltner's ORIGINAL
    * formulation (SMA of typical price ± SMA of high−low range) rather
    * than the modern EMA±ATR variant: the original is ALL integer sums
    * (exact under any merge order — no per-row running EMA, whose
    * arbitrary-α form needs pow(), off the exactness recipe; the live
    * EMA fold is the stream-twin tier's territory). Per class-hour bar
    * (h, l, cl integer cents — the [[windowAtr]] bar build): 3·typical
    * = h+l+cl stays integer; trailing-n sums S_typ and S_rng are exact;
    * mid = S_typ/(3n·100), band = S_rng/(n·100), upper/lower one fixed
    * chain each. The breakout FLAGS clear denominators entirely:
    * close > upper ⟺ 3n·cl > S_typ + 3·S_rng — an exact integer
    * predicate, immune to the band doubles. SCALE: bars collapse to
    * class-hour cardinality before any window (the documented allowed
    * class); one exchange. */
  def windowKeltner(events: DataFrame, n: Int = 14): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val part = Window.partitionBy(col("event_type"), col("hr"))
    val wb = part.orderBy(col("ts"), col("event_id"))
    val bars = events.filter(col("value").isNotNull)
      .withColumn("hr", date_trunc("hour", col("ts")))
      .withColumn("c0",
        (col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)) * 100)
          .cast(dec).cast("long"))
      .withColumn("rn", row_number().over(wb))
      .withColumn("cnt", count(lit(1)).over(part))
      .groupBy(col("event_type"), col("hr"))
      .agg(max(col("c0")).as("h"), min(col("c0")).as("l"),
        max(when(col("rn") === col("cnt"), col("c0"))).as("cl"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wN = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    bars
      .withColumn("typ3", col("h") + col("l") + col("cl"))
      .withColumn("rng", col("h") - col("l"))
      .withColumn("nb", count(lit(1)).over(wN))
      .withColumn("st", sum(col("typ3").cast(dec)).over(wN).cast("long"))
      .withColumn("sr", sum(col("rng").cast(dec)).over(wN).cast("long"))
      .filter(col("nb") === n)
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        (col("st").cast("double") / lit(3.0 * n) / lit(100.0)).as("mid"),
        (col("st").cast("double") / lit(3.0 * n) / lit(100.0) +
          col("sr").cast("double") / lit(n.toDouble) / lit(100.0)).as("upper"),
        (col("st").cast("double") / lit(3.0 * n) / lit(100.0) -
          col("sr").cast("double") / lit(n.toDouble) / lit(100.0)).as("lower"),
        (lit(3L * n) * col("cl") > col("st") + lit(3L) * col("sr"))
          .as("above_upper"),
        (lit(3L * n) * col("cl") < col("st") - lit(3L) * col("sr"))
          .as("below_lower"))
      .orderBy("event_type", "hour_s")
  }

  /** r9: Donchian channel per event class — the band family's PURE
    * SELECTION member ([[windowBollinger]] = σ bands, [[windowKeltner]]
    * = mean-range bands, Donchian = the trailing n-bar high/low
    * envelope itself, the turtle-trader breakout rule): upper = highest
    * high and lower = lowest low of the PRIOR n bars (current bar
    * excluded — the breakout question is "did this bar escape the range
    * set BEFORE it"), mid = their midpoint. EXACTNESS: upper/lower are
    * selections over integer cents (exact under any merge order), the
    * breakout flags are integer comparisons of the bar's close against
    * them, and mid's halving plus the /100 rescale is one two-op fixed
    * chain — nothing here can drift, making this the cheapest band to
    * keep bit-identical cross-engine. Same class-hour bar build and
    * plan shape as [[windowAtr]]: bars collapse to class-hour
    * cardinality before the window, one exchange. */
  def windowDonchian(events: DataFrame, n: Int = 20): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val part = Window.partitionBy(col("event_type"), col("hr"))
    val wb = part.orderBy(col("ts"), col("event_id"))
    val bars = events.filter(col("value").isNotNull)
      .withColumn("hr", date_trunc("hour", col("ts")))
      .withColumn("c0",
        (col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)) * 100)
          .cast(dec).cast("long"))
      .withColumn("rn", row_number().over(wb))
      .withColumn("cnt", count(lit(1)).over(part))
      .groupBy(col("event_type"), col("hr"))
      .agg(max(col("c0")).as("h"), min(col("c0")).as("l"),
        max(when(col("rn") === col("cnt"), col("c0"))).as("cl"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wPrior = wOrd.rowsBetween(-n, -1)
    bars
      .withColumn("nb", count(lit(1)).over(wPrior))
      .withColumn("up", max(col("h")).over(wPrior))
      .withColumn("lo", min(col("l")).over(wPrior))
      .filter(col("nb") === n)
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        (col("up").cast("double") / lit(100.0)).as("upper"),
        (col("lo").cast("double") / lit(100.0)).as("lower"),
        ((col("up") + col("lo")).cast("double") / lit(2.0) / lit(100.0))
          .as("mid"),
        (col("cl") > col("up")).as("breakout_up"),
        (col("cl") < col("lo")).as("breakout_down"))
      .orderBy("event_type", "hour_s")
  }

  /** The class-hour OHLCV bar build shared by the r9 TA additions — the
    * [[windowAtr]] recipe plus a volume column: per (class, hour), high/
    * low/close in integer cents (close = the row_number-selected last
    * reading, high/low min/max selections — all exact under any merge
    * order) and vol = the reading count. One (class, hour) window+agg
    * collapses the fact scan to class-hour cardinality before anything
    * else touches it — the documented allowed frame for trailing-bar
    * windows. */
  private def classHourBarsV(events: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val part = Window.partitionBy(col("event_type"), col("hr"))
    val wb = part.orderBy(col("ts"), col("event_id"))
    events.filter(col("value").isNotNull)
      .withColumn("hr", date_trunc("hour", col("ts")))
      .withColumn("c0",
        (col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)) * 100)
          .cast(dec).cast("long"))
      .withColumn("rn", row_number().over(wb))
      .withColumn("cnt", count(lit(1)).over(part))
      .groupBy(col("event_type"), col("hr"))
      .agg(max(col("c0")).as("h"), min(col("c0")).as("l"),
        max(when(col("rn") === col("cnt"), col("c0"))).as("cl"),
        count(lit(1)).as("vol"))
  }

  /** r9: on-balance volume per event class — the TA family's first
    * VOLUME member (everything so far reads price geometry; OBV asks
    * whether volume CONFIRMS the move): each bar contributes its volume
    * signed by the close-to-close direction, and the running total is
    * the accumulation/distribution line — divergence between OBV slope
    * and price slope is the classic early-warning read. Here volume =
    * readings per class-hour bar, so OBV doubles as a load-vs-level
    * monitor: a rising value level on THINNING reports reads very
    * differently from one on a thickening stream. EXACTNESS: direction
    * is a three-way integer comparison of close cents, flow = dir·vol
    * and the cumulative sum are all integers — nothing can drift; the
    * only double is the /100 close rescale. SCALE: the one fact-scale
    * shuffle is the bar build's class-hour agg; the cumulative window
    * rides the span-bounded bar frame (class-key partitions). */
  def windowObv(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    classHourBarsV(events)
      .withColumn("pc", lag(col("cl"), 1).over(wOrd))
      .withColumn("dir",
        when(col("pc").isNull, 0L)
          .when(col("cl") > col("pc"), 1L)
          .when(col("cl") < col("pc"), -1L)
          .otherwise(0L))
      .withColumn("flow", col("dir") * col("vol"))
      .withColumn("obv", sum(col("flow"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        (col("cl").cast("double") / lit(100.0)).as("close"),
        col("vol"), col("flow").as("signed_flow"), col("obv"))
      .orderBy("event_type", "hour_s")
  }

  /** r9: Williams %R per event class — the stochastic oscillator's
    * mirror read ([[windowStochastic]] runs per USER on raw readings;
    * %R runs on the class-hour bars and measures distance from the
    * trailing HIGH instead of the low): %R = −100·(hiN − close)/(hiN −
    * loN) ∈ [−100, 0], the overbought/oversold screen in its bar-level
    * form (−20 ceiling = overbought, −80 floor = oversold). EXACTNESS:
    * hi/lo are selections over integer cents, the ratio is ONE fixed
    * integer-difference divide (the [[windowStochastic]] recipe), flat
    * windows (hi = lo) yield null — never 0/0. SCALE: same one-exchange
    * class-hour bar posture as [[windowDonchian]]. */
  def windowWilliamsR(events: DataFrame, n: Int = 14): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wN = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    classHourBarsV(events)
      .withColumn("nb", count(lit(1)).over(wN))
      .withColumn("hi", max(col("h")).over(wN))
      .withColumn("lo", min(col("l")).over(wN))
      .withColumn("wr", when(col("hi") > col("lo"),
        lit(-100.0) * (col("hi") - col("cl")).cast("double") /
          (col("hi") - col("lo")).cast("double")))
      .filter(col("nb") === n)
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        col("hi").as("hi_cents"), col("lo").as("lo_cents"),
        (col("cl").cast("double") / lit(100.0)).as("close"),
        col("wr").as("williams_r"))
      .orderBy("event_type", "hour_s")
  }

  /** r9: rolling VWAP per event class — the volume family's CENTER line
    * ([[windowObv]] reads volume's direction; VWAP is the volume-weighted
    * level the market actually transacted at, the institutional
    * fair-value anchor): VWAP_n = Σ(tp_i·vol_i)/Σvol_i over the trailing
    * n class-hour bars. Here vol = readings per bar, so VWAP doubles as
    * the report-weighted sensor level — hours with more reports pull the
    * anchor harder than thin ones, which a plain SMA ignores. EXACTNESS:
    * with T = 3·tp = h+l+cl (integer cents), money = T·vol and both
    * trailing sums stay integer (DECIMAL(38,0) accumulation); VWAP is
    * ONE fixed divide (/3/100 folded into the denominator), and the
    * above/below flag clears the denominator entirely — 3·cl·Σvol vs
    * Σ(T·vol) is an exact integer predicate immune to the double. SCALE:
    * one fact-scale exchange to class-hour bars ([[classHourBarsV]]);
    * the window rides the span-bounded bar frame. */
  def windowVwap(events: DataFrame, n: Int = 14): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wN = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    classHourBarsV(events)
      .withColumn("t3", col("h") + col("l") + col("cl"))
      .withColumn("money3", col("t3") * col("vol"))
      .withColumn("nb", count(lit(1)).over(wN))
      .withColumn("sm", sum(col("money3").cast(dec)).over(wN).cast("long"))
      .withColumn("sv", sum(col("vol").cast(dec)).over(wN).cast("long"))
      .filter(col("nb") === n)
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        (col("cl").cast("double") / lit(100.0)).as("close"),
        col("vol"), col("sm").as("money3_sum_cents"), col("sv").as("vol_sum"),
        (col("sm").cast("double") / (lit(300.0) * col("sv").cast("double")))
          .as("vwap"),
        (lit(3L) * col("cl") * col("sv") > col("sm")).as("above_vwap"))
      .orderBy("event_type", "hour_s")
  }

  /** r9: Money Flow Index per event class — [[windowRsi]] with volume in
    * the numerator (RSI weights every bar equally; MFI weights each move
    * by the volume that made it, so a thin-volume spike can't read as
    * conviction): raw money flow = tp·vol signed by the typical-price
    * direction, MFI = 100·ΣMF⁺/(ΣMF⁺ + ΣMF⁻) over the trailing n flows.
    * EXACTNESS: T = 3·tp and MF3 = T·vol stay integer; direction is an
    * integer comparison of T against its lag; the two trailing sums are
    * integer and MFI is ONE fixed divide — flat stretches (no signed
    * flow at all) yield null, never 0/0; unchanged bars contribute to
    * NEITHER sum (the textbook convention). Warm-up: rows emitted once
    * the frame holds n DIRECTED flows (the [[windowRsi]] n-diffs
    * contract). SCALE: same one-exchange bar posture as [[windowVwap]]. */
  def windowMfi(events: DataFrame, n: Int = 14): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wN = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    classHourBarsV(events)
      .withColumn("t3", col("h") + col("l") + col("cl"))
      .withColumn("pt3", lag(col("t3"), 1).over(wOrd))
      .withColumn("mfp", when(col("pt3").isNotNull && (col("t3") > col("pt3")),
        col("t3") * col("vol")).otherwise(
        when(col("pt3").isNotNull, lit(0L))))
      .withColumn("mfn", when(col("pt3").isNotNull && (col("t3") < col("pt3")),
        col("t3") * col("vol")).otherwise(
        when(col("pt3").isNotNull, lit(0L))))
      .withColumn("nf", count(col("mfp")).over(wN))
      .withColumn("sp", sum(col("mfp").cast(dec)).over(wN).cast("long"))
      .withColumn("sn", sum(col("mfn").cast(dec)).over(wN).cast("long"))
      .filter(col("nf") === n)
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        (col("cl").cast("double") / lit(100.0)).as("close"),
        col("vol"), col("sp").as("pos_flow3"), col("sn").as("neg_flow3"),
        when(col("sp") + col("sn") > 0,
          lit(100.0) * col("sp").cast("double") /
            (col("sp") + col("sn")).cast("double")).as("mfi"))
      .orderBy("event_type", "hour_s")
  }

  /** r9: Chande Momentum Oscillator per event class — the RSI family's
    * SYMMETRIC member: where RSI = 100·g/(g+l) compresses into [0,100]
    * around 50, CMO = 100·(sU−sD)/(sU+sD) is zero-centered in
    * [−100,100], making the sign itself the trend read and ±50 the
    * overbought/oversold lines. Runs on class-hour bar closes (RSI runs
    * per user on raw readings — different granularity, deliberately).
    * EXACTNESS: up/down moves are integer cent diffs of closes, the two
    * trailing sums integer, CMO one fixed divide; flat frames (sU+sD=0)
    * null. SCALE: one exchange to bars, class-keyed window after. */
  def windowChandeMomentum(events: DataFrame, n: Int = 14): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wN = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    classHourBarsV(events)
      .withColumn("pc", lag(col("cl"), 1).over(wOrd))
      .withColumn("up", when(col("pc").isNotNull,
        greatest(col("cl") - col("pc"), lit(0L))))
      .withColumn("dn", when(col("pc").isNotNull,
        greatest(col("pc") - col("cl"), lit(0L))))
      .withColumn("nd", count(col("up")).over(wN))
      .withColumn("su", sum(col("up").cast(dec)).over(wN).cast("long"))
      .withColumn("sd", sum(col("dn").cast(dec)).over(wN).cast("long"))
      .filter(col("nd") === n)
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        (col("cl").cast("double") / lit(100.0)).as("close"),
        col("su").as("up_sum_cents"), col("sd").as("down_sum_cents"),
        when(col("su") + col("sd") > 0,
          lit(100.0) * (col("su") - col("sd")).cast("double") /
            (col("su") + col("sd")).cast("double")).as("cmo"))
      .orderBy("event_type", "hour_s")
  }

  /** r9: Vortex Indicator per event class — the trend-CHANGE detector
    * pairing [[windowAtr]] (same true-range denominator, directional
    * numerators): VM⁺ = |high − prev low| captures upward bar-to-bar
    * reach, VM⁻ = |low − prev high| downward; VI⁺ = ΣVM⁺/ΣTR and VI⁻ =
    * ΣVM⁻/ΣTR over the trailing n bars, and their crossover is the
    * trend-flip signal. EXACTNESS: all three per-bar terms are integer
    * selections/abs-diffs over cents, the three trailing sums integer,
    * the two VIs one fixed divide each; the crossing FLAG clears the
    * shared denominator — ΣVM⁺ > ΣVM⁻ is an exact integer predicate.
    * Degenerate frames (ΣTR = 0: every bar flat AND gapless) null.
    * SCALE: the [[windowAtr]] plan — one exchange to class-hour bars,
    * span-bounded window after. */
  def windowVortex(events: DataFrame, n: Int = 14): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wN = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    classHourBarsV(events)
      .withColumn("ph", lag(col("h"), 1).over(wOrd))
      .withColumn("pl", lag(col("l"), 1).over(wOrd))
      .withColumn("pc", lag(col("cl"), 1).over(wOrd))
      .withColumn("vmp", when(col("pl").isNotNull, abs(col("h") - col("pl"))))
      .withColumn("vmm", when(col("ph").isNotNull, abs(col("l") - col("ph"))))
      .withColumn("tr", when(col("pc").isNotNull,
        greatest(col("h") - col("l"),
          abs(col("h") - col("pc")), abs(col("l") - col("pc")))))
      .withColumn("ntr", count(col("tr")).over(wN))
      .withColumn("svp", sum(col("vmp").cast(dec)).over(wN).cast("long"))
      .withColumn("svm", sum(col("vmm").cast(dec)).over(wN).cast("long"))
      .withColumn("str", sum(col("tr").cast(dec)).over(wN).cast("long"))
      .filter(col("ntr") === n)
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        col("svp").as("vm_plus_cents"), col("svm").as("vm_minus_cents"),
        col("str").as("tr_sum_cents"),
        when(col("str") > 0,
          col("svp").cast("double") / col("str").cast("double")).as("vi_plus"),
        when(col("str") > 0,
          col("svm").cast("double") / col("str").cast("double")).as("vi_minus"),
        (col("svp") > col("svm")).as("uptrend"))
      .orderBy("event_type", "hour_s")
  }

  /** r9: Aroon indicator per event class — the band family's TIME-axis
    * member ([[windowDonchian]] asks how far price is from the trailing
    * extremes; Aroon asks how LONG AGO the extremes were set — a trend
    * that keeps printing fresh highs has aroon_up pinned at 100 even
    * when the move is small): over the current + prior n bars, with
    * ps_up = bars since the highest high and ps_dn = bars since the
    * lowest low, aroon_up = 100·(n − ps_up)/n, aroon_down likewise, and
    * the oscillator their difference. EXACTNESS: the extreme's POSITION
    * is found by an integer max over the packed key (2³⁰ + h)·2²⁰ + rn
    * (resp. (2³⁰ − l)·2²⁰ + rn for the low) — lexicographic (value,
    * recency), so ties resolve to the most recent extreme, the standard
    * convention, deterministically in both engines; the 2³⁰ offset keeps
    * keys positive even for negative cents (pmod and DuckDB's % only
    * agree on positives), and the packing is exact while bar index < 2²⁰
    * and |cents| < 2³⁰ (a 119-year hourly series / a ±10.7 M-cent value
    * band — both decades of headroom over the fixture); everything after
    * is integer, the three outputs one fixed divide each. SCALE:
    * one exchange to class-hour bars; the packed-key maxes are plain
    * frame aggregates on the span-bounded bar frame. */
  def windowAroon(events: DataFrame, n: Int = 25): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wN = wOrd.rowsBetween(-n, Window.currentRow)
    val pack = lit(1L << 20)
    classHourBarsV(events)
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("nb", count(lit(1)).over(wN))
      .withColumn("hiKey", max((lit(1L << 30) + col("h")) * pack + col("rn"))
        .over(wN))
      .withColumn("loKey", max((lit(1L << 30) - col("l")) * pack + col("rn"))
        .over(wN))
      .withColumn("psUp", col("rn") - pmod(col("hiKey"), pack))
      .withColumn("psDn", col("rn") - pmod(col("loKey"), pack))
      .filter(col("nb") === n + 1)
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        col("psUp").as("bars_since_high"), col("psDn").as("bars_since_low"),
        (lit(100.0) * (lit(n.toLong) - col("psUp")).cast("double") /
          lit(n.toDouble)).as("aroon_up"),
        (lit(100.0) * (lit(n.toLong) - col("psDn")).cast("double") /
          lit(n.toDouble)).as("aroon_down"),
        (lit(100.0) * (col("psDn") - col("psUp")).cast("double") /
          lit(n.toDouble)).as("aroon_osc"))
      .orderBy("event_type", "hour_s")
  }

  /** r9: Commodity Channel Index per event class — the band family's
    * MEAN-DEVIATION member ([[windowBollinger]] scales by σ, CCI by the
    * mean ABSOLUTE deviation of typical price, the robust-dispersion
    * choice that doesn't square outliers into the denominator):
    * CCI = (tp − SMA_n(tp)) / (0.015 · MD_n). The textbook form is
    * double soup; this one clears every denominator first. With T =
    * 3·tp = h+l+cl (integer cents) and S = Σ_frame T: tp − SMA = (nT −
    * S)/(3n) and MD = Σ|nT_i − S|/(3n²), so CCI = n·(nT_c − S) /
    * (0.015·Σ|nT_i − S|) — an INTEGER numerator and an integer sum in
    * the denominator, one fixed double divide at the end, bit-identical
    * cross-engine. The per-row frame sum Σ|nT_i − S| needs each frame
    * member against the frame's OWN S — not expressible as a second
    * window — so the frame is carried as a collect_list and folded with
    * a codegen'd higher-order `aggregate` (n ≤ 20 longs per row, map-
    * side, no extra exchange). Flat frames (all T equal ⇒ Σ|·| = 0)
    * yield null, never 0/0. SCALE: one exchange to class-hour bars;
    * the list fold rides the span-bounded bar frame. */
  def windowCci(events: DataFrame, n: Int = 20): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wN = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    classHourBarsV(events)
      .withColumn("t3", col("h") + col("l") + col("cl"))
      .withColumn("nb", count(lit(1)).over(wN))
      .withColumn("s", sum(col("t3").cast(dec)).over(wN).cast("long"))
      .withColumn("lst", collect_list(col("t3")).over(wN))
      .withColumn("dc", lit(n.toLong) * col("t3") - col("s"))
      .withColumn("sabs", aggregate(
        transform(col("lst"), x => abs(lit(n.toLong) * x - col("s"))),
        lit(0L), (acc, x) => acc + x))
      .filter(col("nb") === n)
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        (col("t3").cast("double") / lit(3.0) / lit(100.0)).as("typical"),
        col("dc").as("dev_n2"), col("sabs").as("abs_dev_sum"),
        when(col("sabs") > 0,
          (lit(n.toLong) * col("dc")).cast("double") /
            (lit(0.015) * col("sabs").cast("double"))).as("cci"))
      .orderBy("event_type", "hour_s")
  }

  /** r9: Ulcer Index per event class — the drawdown family's RISK
    * SUMMARY ([[windowDrawdown]] emits the per-row depth; UI compresses
    * it to "how painful has the recent stretch been": the root-mean-
    * square of percentage drawdown from the running peak over the
    * trailing `n` bars). Squaring is the point — it weights DEEP
    * drawdowns superlinearly, so a series that dipped 10% once scores
    * far worse than one that wobbled 1% ten times, which a mean |dd|
    * (or [[windowAtr]]'s range read) cannot distinguish. The classic
    * use: denominator of the Martin ratio, the drawdown-world Sharpe.
    *
    * EXACTNESS: the running peak is an expanding integer-cents max (the
    * [[windowDrawdown]] dual, bar closes instead of raw readings); each
    * bar's drawdown fraction is quantized ONCE to integer parts-per-
    * million via integral divide (dd_ppm = (peak−cl)·10⁶ div peak —
    * deterministic in both engines, the Kruskal–Wallis micro-unit
    * recipe), and the trailing mean-of-squares is then pure integer
    * arithmetic (dd_ppm ≤ 10⁶ ⇒ Σdd² ≤ n·10¹² — long headroom for any
    * window that fits a row). One sqrt of one fixed divide at the end
    * (correctly rounded per IEEE-754 — safe). Bars whose expanding peak
    * is ≤ 0 (possible on signed readings) get a null dd and the window
    * requires n non-null members — never a negative-denominator div.
    * SCALE: the [[windowObv]] posture — one fact-scale exchange into
    * class-hour bars, then both windows (expanding peak, trailing RMS)
    * ride the span-bounded bar frame. */
  /** r9: Ichimoku Kinkō Hyō per event class — the TA tier's one-glance
    * EQUILIBRIUM system (every other band op reads a single statistic;
    * Ichimoku composes four so level, momentum, and forward support read
    * together): tenkan = 9-bar midpoint, kijun = 26-bar midpoint, senkou
    * A = their average PROJECTED 26 bars forward, senkou B = the 52-bar
    * midpoint likewise projected (A/B bound the "cloud" — forward
    * support/resistance from PAST consensus), chikou = the close 26 bars
    * ahead (the standard lagging-span read, null at the frame edge).
    * The actionable bit flags compare the close to the cloud.
    *
    * EXACTNESS: every line is a midpoint of integer-cents extrema — kept
    * DOUBLED (tenkan2 = hi₉+lo₉) so projections and averages stay
    * integers until ONE final rescale divide per column; the cloud flags
    * compare 4·close against the ×4-integer span values, so no float
    * ever decides a boolean. SCALE: the [[windowDonchian]] posture —
    * one exchange to class-hour bars, four trailing extrema windows +
    * two lags + one lead on the span-bounded bar frame. */
  def windowIchimoku(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    def mid2(n: Int) = {
      val w = wOrd.rowsBetween(-(n - 1), Window.currentRow)
      max(col("h")).over(w) + min(col("l")).over(w)
    }
    classHourBarsV(events)
      .withColumn("nb", count(lit(1))
        .over(wOrd.rowsBetween(-51, Window.currentRow)))
      .withColumn("tenkan2", mid2(9))
      .withColumn("kijun2", mid2(26))
      .withColumn("span_b2", mid2(52))
      .withColumn("sa4", lag(col("tenkan2") + col("kijun2"), 26).over(wOrd))
      .withColumn("sb4", lag(col("span_b2") * 2, 26).over(wOrd))
      .withColumn("chikou_c", lead(col("cl"), 26).over(wOrd))
      // full-history rows only: the 26-back projection SOURCE must itself
      // have a complete 52-bar window, so no line is a warmup partial
      .withColumn("nb_src", lag(col("nb"), 26).over(wOrd))
      .filter(col("nb_src") === 52)
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        (col("cl").cast("double") / lit(100.0)).as("close"),
        (col("tenkan2").cast("double") / lit(200.0)).as("tenkan"),
        (col("kijun2").cast("double") / lit(200.0)).as("kijun"),
        (col("sa4").cast("double") / lit(400.0)).as("senkou_a"),
        (col("sb4").cast("double") / lit(400.0)).as("senkou_b"),
        (col("chikou_c").cast("double") / lit(100.0)).as("chikou"),
        (col("cl") * 4 > greatest(col("sa4"), col("sb4"))).as("above_cloud"),
        (col("cl") * 4 < least(col("sa4"), col("sb4"))).as("below_cloud"))
      .orderBy("event_type", "hour_s")
  }

  /** r9: Kaufman Efficiency Ratio per event class — the trend-QUALITY
    * read none of the band/momentum ops give: ER = |net change over n
    * bars| / Σ|bar-to-bar changes| ∈ [0, 1] — 1 means every step moved
    * the same way (clean trend), →0 means the path churned sideways
    * for its distance (noise). The adaptive-smoothing kernel (KAMA
    * scales its α by ER) and the regime filter a crossover system
    * ([[tsSmaCrossover]]) is gated by in practice.
    *
    * EXACTNESS: net and volatility are integer-cents sums of absolute
    * differences; ER is ONE long/long divide; a flat window (vol = 0)
    * yields null, never 0/0. SCALE: the [[windowObv]] posture — one
    * exchange to class-hour bars, a lag and one trailing window sum on
    * the span-bounded bar frame. */
  def windowKaufmanEr(events: DataFrame, n: Int = 10): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wN = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    classHourBarsV(events)
      .withColumn("pc", lag(col("cl"), 1).over(wOrd))
      .withColumn("d", when(col("pc").isNotNull, abs(col("cl") - col("pc"))))
      .withColumn("nd", count(col("d")).over(wN))
      .withColumn("vol", sum(col("d")).over(wN))
      .withColumn("base", lag(col("cl"), n).over(wOrd))
      .filter(col("nd") === n && col("base").isNotNull)
      .withColumn("net", abs(col("cl") - col("base")))
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        (col("cl").cast("double") / lit(100.0)).as("close"),
        col("net").as("net_cents"), col("vol").as("vol_cents"),
        when(col("vol") > 0,
          col("net").cast("double") / col("vol").cast("double"))
          .as("efficiency_ratio"))
      .orderBy("event_type", "hour_s")
  }

  /** r9: Heikin-Ashi bars per event class — the TA tier's SMOOTHED bar
    * transform: ha_close = (o+h+l+c)/4 re-centers each bar on its body,
    * ha_open = midpoint of the PREVIOUS HA body — a recursion that
    * filters one-bar noise so consecutive same-color HA bars read as a
    * trend run (the practical use: trend-run length over HA bars is far
    * less choppy than over raw bars, feeding [[windowStreaks]]-style
    * reads). Requires the bar OPEN (first reading per class-hour), a
    * selection the shared bar build adds here.
    *
    * EXACTNESS: ha_close is an integer sum with ONE /400 divide;
    * ha_open is a float RECURSION — handled exactly like the
    * `events_survival_km` product: one textual IEEE chain folded over
    * the span-bounded bar list with per-row output via the appended
    * accumulator array, replayed in DuckDB by prefix-slice list_reduce
    * (bar cents are integers < 2^53, so double addition is exact and
    * the two engines' sums are bit-identical). ha_high/low are
    * greatest/least SELECTIONS over deterministic doubles. SCALE: one
    * exchange to class-hour bars; the O(V²) prefix replay rides the
    * span-bounded bar frame (the accepted hourly-fold bound). */
  def windowHeikinAshi(events: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val part = Window.partitionBy(col("event_type"), col("hr"))
    val wb = part.orderBy(col("ts"), col("event_id"))
    val bars = events.filter(col("value").isNotNull)
      .withColumn("hr", date_trunc("hour", col("ts")))
      .withColumn("c0",
        (col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)) * 100)
          .cast(dec).cast("long"))
      .withColumn("rn", row_number().over(wb))
      .withColumn("cnt", count(lit(1)).over(part))
      .groupBy(col("event_type"), col("hr"))
      .agg(max(when(col("rn") === 1, col("c0"))).as("o"),
        max(col("c0")).as("h"), min(col("c0")).as("l"),
        max(when(col("rn") === col("cnt"), col("c0"))).as("cl"))
    bars.groupBy(col("event_type"))
      .agg(Guards.boundedSeries(sort_array(collect_list(
        struct(col("hr"), col("o"), col("h"), col("l"), col("cl")))),
        "window_heikin_ashi").as("rs"))
      .withColumn("ha", expr(
        """aggregate(
             slice(rs, 2, size(rs) - 1),
             array(array(
               cast(element_at(rs, 1).o + element_at(rs, 1).cl as double) / 200.0d,
               cast(element_at(rs, 1).o + element_at(rs, 1).h +
                    element_at(rs, 1).l + element_at(rs, 1).cl as double) / 400.0d)),
             (acc, b) -> concat(acc, array(array(
               (element_at(acc, -1)[0] + element_at(acc, -1)[1]) / 2.0d,
               cast(b.o + b.h + b.l + b.cl as double) / 400.0d))))"""))
      .select(col("event_type"), posexplode(col("rs")), col("ha"))
      .withColumn("st", element_at(col("ha"), col("pos") + 1))
      .select(col("event_type"), fmtTsSec(col("col.hr")).as("hour_s"),
        (col("col.cl").cast("double") / lit(100.0)).as("close"),
        col("st")(0).as("ha_open"), col("st")(1).as("ha_close"),
        greatest((col("col.h").cast("double") / lit(100.0)),
          col("st")(0), col("st")(1)).as("ha_high"),
        least((col("col.l").cast("double") / lit(100.0)),
          col("st")(0), col("st")(1)).as("ha_low"),
        (col("st")(1) > col("st")(0)).as("ha_bull"))
      .orderBy("event_type", "hour_s")
  }

  /** r10: Wilder's directional system (+DI/−DI/DX/ADX, n = 14) per event
    * class — the TREND-STRENGTH member the TA tier still lacked: Aroon
    * ([[windowAroon]]) times the last extremes, Vortex ([[windowVortex]])
    * ratios windowed crossings; ADX is the canonical "is there a trend AT
    * ALL" dial (low ADX = the band/oscillator regime, high ADX = the
    * breakout regime — it's the standard regime SWITCH for every other
    * indicator in this tier). All four Wilder recursions (smoothed TR,
    * +DM, −DM, and ADX over the derived DX) advance together in ONE
    * aggregate-HOF fold over the span-bounded class-hour bars — the
    * `ts_macd` textual-expansion discipline (DX consumes the
    * just-updated smoothed DMs in the same step). Seeding: smoothed
    * sums and ADX start at 0 from the first bar (running-Wilder
    * convention, stated; no SMA warm-up — both engines replay the same
    * chain). DX simplifies to 100·|S⁺−S⁻|/(S⁺+S⁻): the shared S_TR
    * divisor of ±DI cancels. EXACTNESS: bar cents are exact integer
    * doubles; every update is a fixed IEEE chain DuckDB's `list_reduce`
    * replays in identical order. Plan: one exchange to class-hour bars,
    * one guarded fold per class, one row out per class. */
  def windowAdx(events: DataFrame): DataFrame = {
    val bh = "cast(b.h as double)"
    val bl = "cast(b.l as double)"
    val up = s"($bh - acc[0])"
    val dn = s"(acc[1] - $bl)"
    val pdm = s"(case when $up > $dn and $up > 0.0d then $up else 0.0d end)"
    val ndm = s"(case when $dn > $up and $dn > 0.0d then $dn else 0.0d end)"
    val tr = s"greatest(cast(b.h - b.l as double), abs($bh - acc[2]), abs($bl - acc[2]))"
    val sp = s"(acc[4] - acc[4] / 14.0d + $pdm)"
    val sn = s"(acc[5] - acc[5] / 14.0d + $ndm)"
    val dx = s"(case when ($sp + $sn) > 0.0d then 100.0d * abs($sp - $sn) / ($sp + $sn) else 0.0d end)"
    classHourBarsV(events)
      .groupBy(col("event_type"))
      .agg(Guards.boundedSeries(sort_array(collect_list(
        struct(col("hr"), col("h"), col("l"), col("cl")))),
        "window_adx").as("rs"))
      .withColumn("st", expr(
        s"""aggregate(
              slice(rs, 2, size(rs) - 1),
              array(cast(element_at(rs, 1).h as double),
                    cast(element_at(rs, 1).l as double),
                    cast(element_at(rs, 1).cl as double),
                    0.0d, 0.0d, 0.0d, 0.0d),
              (acc, b) -> array($bh, $bl, cast(b.cl as double),
                acc[3] - acc[3] / 14.0d + $tr,
                $sp, $sn,
                acc[6] + ($dx - acc[6]) / 14.0d))"""))
      .select(col("event_type"), size(col("rs")).cast("long").as("n_bars"),
        col("st")(3).as("smoothed_tr"),
        when(col("st")(3) > 0.0,
          lit(100.0) * col("st")(4) / col("st")(3)).as("plus_di"),
        when(col("st")(3) > 0.0,
          lit(100.0) * col("st")(5) / col("st")(3)).as("minus_di"),
        when(col("st")(4) + col("st")(5) > 0.0,
          lit(100.0) * abs(col("st")(4) - col("st")(5)) /
            (col("st")(4) + col("st")(5))).as("dx"),
        col("st")(6).as("adx"))
      .orderBy("event_type")
  }

  /** r10: Parabolic SAR (stop-and-reverse, Wilder) per event class — the
    * TA tier's first full STATE-MACHINE indicator: a trailing stop that
    * accelerates toward price while the trend holds and FLIPS sides when
    * the bar range crosses it. The fold state is the live machine:
    * (sar, extreme point, acceleration factor, direction, the prior two
    * bars' high/low for the classic clamp, reversal count). Declared
    * conventions (both engines replay the identical chain): seed long
    * from bar 1 (sar = low₁, ep = high₁, af = 0.02); af steps +0.02 on
    * each NEW extreme, capped 0.2; long SAR clamps ≤ the prior two lows
    * (short: ≥ the prior two highs); reversal on STRICT penetration
    * (low < sar / high > sar); on reversal SAR = the prior EP, af
    * resets, no same-bar re-reversal. EXACTNESS: bar cents are exact
    * integer doubles; af arithmetic (0.02 steps, 0.2 cap) is the same
    * IEEE add/compare chain in both engines, so every branch decision
    * is bit-reproducible — the fold is ONE textually-expanded
    * CASE-per-slot update (`ts_macd` discipline), replayed by DuckDB
    * `list_reduce`. One span-guarded fold per class, one row out. */
  def windowPsar(events: DataFrame): DataFrame = {
    val bh = "cast(b.h as double)"
    val bl = "cast(b.l as double)"
    val sr = "(acc[0] + acc[2] * (acc[1] - acc[0]))"
    val scL = s"least($sr, acc[5], acc[7])"
    val scS = s"greatest($sr, acc[4], acc[6])"
    val isL = "(acc[3] > 0.0d)"
    val rev = s"(case when $isL then (case when $bl < $scL then 1.0d else 0.0d end) else (case when $bh > $scS then 1.0d else 0.0d end) end)"
    classHourBarsV(events)
      .groupBy(col("event_type"))
      .agg(Guards.boundedSeries(sort_array(collect_list(
        struct(col("hr"), col("h"), col("l"), col("cl")))),
        "window_psar").as("rs"))
      .withColumn("st", expr(
        s"""aggregate(
              slice(rs, 2, size(rs) - 1),
              array(cast(element_at(rs, 1).l as double),
                    cast(element_at(rs, 1).h as double),
                    0.02d, 1.0d,
                    cast(element_at(rs, 1).h as double),
                    cast(element_at(rs, 1).l as double),
                    cast(element_at(rs, 1).h as double),
                    cast(element_at(rs, 1).l as double),
                    0.0d),
              (acc, b) -> array(
                case when $rev > 0.5d then acc[1] else (case when $isL then $scL else $scS end) end,
                case when $rev > 0.5d then (case when $isL then $bl else $bh end) else (case when $isL then greatest(acc[1], $bh) else least(acc[1], $bl) end) end,
                case when $rev > 0.5d then 0.02d else (case when $isL then (case when $bh > acc[1] then least(acc[2] + 0.02d, 0.2d) else acc[2] end) else (case when $bl < acc[1] then least(acc[2] + 0.02d, 0.2d) else acc[2] end) end) end,
                case when $rev > 0.5d then -acc[3] else acc[3] end,
                $bh, $bl, acc[4], acc[5],
                acc[8] + $rev))"""))
      .select(col("event_type"), size(col("rs")).cast("long").as("n_bars"),
        (col("st")(0) / lit(100.0)).as("sar"),
        (col("st")(1) / lit(100.0)).as("extreme_point"),
        col("st")(2).as("accel_factor"),
        col("st")(3).cast("long").as("direction"),
        col("st")(8).cast("long").as("n_reversals"))
      .orderBy("event_type")
  }

  /** r10: Chaikin accumulation/distribution line + oscillator per class —
    * the tier's money-flow PRESSURE read: each bar contributes its volume
    * weighted by WHERE the close sits in the bar's range (mfm =
    * (2·cl − h − l)/(h − l) ∈ [−1, 1]); the A/D line is the running sum
    * and the oscillator its EMA3 − EMA10 divergence (volume leading
    * price, the classic early-rotation signal; reads next to
    * [[windowObv]], which weights volume by DIRECTION only). All three
    * recursions (A/D sum, both EMAs of the just-updated A/D) advance in
    * ONE fold — running double sums are deliberately NOT window cumsums
    * (engines may sum window frames in different orders; the fold pins
    * ONE left-to-right IEEE chain both engines replay). mfm is one
    * integer-cents divide; flat bars (h = l) contribute zero by the
    * standard convention. One span-guarded fold per class, one row. */
  def windowChaikin(events: DataFrame): DataFrame = {
    val mfv = "(case when b.h > b.l then cast(2 * b.cl - b.h - b.l as double) / cast(b.h - b.l as double) * cast(b.vol as double) else 0.0d end)"
    val ad = s"(acc[0] + $mfv)"
    classHourBarsV(events)
      .groupBy(col("event_type"))
      .agg(Guards.boundedSeries(sort_array(collect_list(
        struct(col("hr"), col("h"), col("l"), col("cl"), col("vol")))),
        "window_chaikin").as("rs"))
      .withColumn("st", expr(
        s"""aggregate(
              slice(rs, 2, size(rs) - 1),
              array(
                case when element_at(rs, 1).h > element_at(rs, 1).l
                     then cast(2 * element_at(rs, 1).cl - element_at(rs, 1).h - element_at(rs, 1).l as double) / cast(element_at(rs, 1).h - element_at(rs, 1).l as double) * cast(element_at(rs, 1).vol as double)
                     else 0.0d end,
                case when element_at(rs, 1).h > element_at(rs, 1).l
                     then cast(2 * element_at(rs, 1).cl - element_at(rs, 1).h - element_at(rs, 1).l as double) / cast(element_at(rs, 1).h - element_at(rs, 1).l as double) * cast(element_at(rs, 1).vol as double)
                     else 0.0d end,
                case when element_at(rs, 1).h > element_at(rs, 1).l
                     then cast(2 * element_at(rs, 1).cl - element_at(rs, 1).h - element_at(rs, 1).l as double) / cast(element_at(rs, 1).h - element_at(rs, 1).l as double) * cast(element_at(rs, 1).vol as double)
                     else 0.0d end),
              (acc, b) -> array($ad,
                acc[1] + (2.0d / 4.0d) * ($ad - acc[1]),
                acc[2] + (2.0d / 11.0d) * ($ad - acc[2])))"""))
      .select(col("event_type"), size(col("rs")).cast("long").as("n_bars"),
        col("st")(0).as("ad_line"),
        col("st")(1).as("ad_ema3"), col("st")(2).as("ad_ema10"),
        (col("st")(1) - col("st")(2)).as("chaikin_osc"))
      .orderBy("event_type")
  }

  /** r10: Elder Ray (bull/bear power, EMA13 baseline) per class — the
    * simplest "who is in control at the margin" decomposition: bull
    * power = bar high − EMA13 (what buyers managed above consensus),
    * bear power = bar low − EMA13; divergence against the EMA slope is
    * the classic entry screen. One EMA recursion folded over the bars,
    * powers read off the LAST bar against the final EMA. Same exactness
    * contract as every fold (integer-cent bars, α spelled 2/14 in both
    * engines). */
  def windowElderRay(events: DataFrame): DataFrame =
    classHourBarsV(events)
      .groupBy(col("event_type"))
      .agg(Guards.boundedSeries(sort_array(collect_list(
        struct(col("hr"), col("h"), col("l"), col("cl")))),
        "window_elder_ray").as("rs"))
      .withColumn("ema", expr(
        """aggregate(
             slice(rs, 2, size(rs) - 1),
             cast(element_at(rs, 1).cl as double),
             (acc, b) -> acc + (2.0d / 14.0d) * (cast(b.cl as double) - acc))"""))
      .select(col("event_type"), size(col("rs")).cast("long").as("n_bars"),
        (col("ema") / lit(100.0)).as("ema13"),
        ((element_at(col("rs"), -1)("h") - col("ema")) / lit(100.0))
          .as("bull_power"),
        ((element_at(col("rs"), -1)("l") - col("ema")) / lit(100.0))
          .as("bear_power"))
      .orderBy("event_type")

  /** r10: Supertrend (ATR-band trailing stop, n = 14, multiplier 3) per
    * class — [[windowPsar]]'s volatility-adaptive sibling: PSAR
    * accelerates on time, Supertrend widens with the true range, so it
    * survives volatility bursts PSAR whipsaws through. The fold state is
    * again the live machine: (prev close, running-Wilder ATR, ratcheted
    * final upper/lower bands, direction, flip count). Declared
    * conventions (both engines replay the identical chain): ATR seeds 0
    * from bar 1 (the `window_adx` running-Wilder convention); bands
    * ratchet only while price respects them (upper only falls unless
    * the prior close broke it; lower mirror); the trend flips on STRICT
    * close-beyond-band. One CASE-per-slot textually-expanded update,
    * DuckDB `list_reduce` replay, one row per class. */
  def windowSupertrend(events: DataFrame): DataFrame = {
    val bh = "cast(b.h as double)"
    val bl = "cast(b.l as double)"
    val bc = "cast(b.cl as double)"
    val tr = s"greatest(cast(b.h - b.l as double), abs($bh - acc[0]), abs($bl - acc[0]))"
    val at = s"(acc[1] - acc[1] / 14.0d + $tr)"
    val hl2 = s"(($bh + $bl) / 2.0d)"
    val bu = s"($hl2 + 3.0d * $at)"
    val bo = s"($hl2 - 3.0d * $at)"
    val fu = s"(case when $bu < acc[2] or acc[0] > acc[2] then $bu else acc[2] end)"
    val fl = s"(case when $bo > acc[3] or acc[0] < acc[3] then $bo else acc[3] end)"
    val flip = s"(case when acc[4] > 0.0d then (case when $bc < $fl then 1.0d else 0.0d end) else (case when $bc > $fu then 1.0d else 0.0d end) end)"
    classHourBarsV(events)
      .groupBy(col("event_type"))
      .agg(Guards.boundedSeries(sort_array(collect_list(
        struct(col("hr"), col("h"), col("l"), col("cl")))),
        "window_supertrend").as("rs"))
      .withColumn("st", expr(
        s"""aggregate(
              slice(rs, 2, size(rs) - 1),
              array(cast(element_at(rs, 1).cl as double),
                    0.0d,
                    cast(element_at(rs, 1).h + element_at(rs, 1).l as double) / 2.0d,
                    cast(element_at(rs, 1).h + element_at(rs, 1).l as double) / 2.0d,
                    1.0d, 0.0d),
              (acc, b) -> array($bc, $at, $fu, $fl,
                case when $flip > 0.5d then -acc[4] else acc[4] end,
                acc[5] + $flip))"""))
      .select(col("event_type"), size(col("rs")).cast("long").as("n_bars"),
        (col("st")(1) / lit(100.0)).as("atr_wilder"),
        (col("st")(2) / lit(100.0)).as("final_upper"),
        (col("st")(3) / lit(100.0)).as("final_lower"),
        col("st")(4).cast("long").as("direction"),
        col("st")(5).cast("long").as("n_flips"))
      .orderBy("event_type")
  }

  def windowUlcer(events: DataFrame, n: Int = 14): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wAll = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wN = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    classHourBarsV(events)
      .withColumn("peak", max(col("cl")).over(wAll))
      .withColumn("ddp", when(col("peak") > 0,
        expr("CAST((peak - cl) AS DECIMAL(38,0)) * 1000000 DIV peak")
          .cast("long")))
      .withColumn("nd", count(col("ddp")).over(wN))
      .withColumn("ss",
        sum((col("ddp") * col("ddp")).cast(dec)).over(wN).cast("long"))
      .filter(col("nd") === n)
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        (col("cl").cast("double") / lit(100.0)).as("close"),
        (col("peak").cast("double") / lit(100.0)).as("peak_value"),
        col("ddp").as("dd_ppm"), col("ss").as("dd_sq_sum"),
        (sqrt(col("ss").cast("double") / lit(n.toDouble)) / lit(10000.0))
          .as("ulcer_pct"))
      .orderBy("event_type", "hour_s")
  }

  /** r10b: classic floor-trader pivot points per class — the TA tier's
    * first CALENDAR-anchored level set: yesterday's (H, L, C) fix today's
    * pivot/support/resistance grid, the levels the intraday indicators
    * (`window_stochastic`, `window_cci`) oscillate BETWEEN. Per (class,
    * day) bars (the [[classHourBarsV]] recipe at day grain), lagged one
    * OBSERVED day (a silent day inherits the prior fix — stated).
    * EXACTNESS: everything stays in integer THIRDS of a cent — p3 =
    * H+L+C, r1·3 = 2p3 − 3L, s1·3 = 2p3 − 3H, r2·3 = p3 + 3(H−L),
    * s2·3 = p3 − 3(H−L) — and each level is ONE /3/100 double chain;
    * the above_pivot flag compares 3·close > p3, an exact integer
    * predicate immune to the divides. SCALE: one fact-scale agg to
    * class-day bars; one lag window on the day-bounded frame. */
  def windowPivotPoints(events: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val part = Window.partitionBy(col("event_type"), col("day"))
    val wb = part.orderBy(col("ts"), col("event_id"))
    val bars = events.filter(col("value").isNotNull)
      .withColumn("day", date_trunc("day", col("ts")))
      .withColumn("c0",
        (col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)) * 100)
          .cast(dec).cast("long"))
      .withColumn("rn", row_number().over(wb))
      .withColumn("cnt", count(lit(1)).over(part))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("c0")).as("h"), min(col("c0")).as("l"),
        max(when(col("rn") === col("cnt"), col("c0"))).as("cl"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    def lvl(c: org.apache.spark.sql.Column) =
      c.cast("double") / lit(3.0) / lit(100.0)
    bars
      .withColumn("ph", lag(col("h"), 1).over(wOrd))
      .withColumn("pl", lag(col("l"), 1).over(wOrd))
      .withColumn("pcl", lag(col("cl"), 1).over(wOrd))
      .filter(col("ph").isNotNull)
      .withColumn("p3", col("ph") + col("pl") + col("pcl"))
      .select(col("event_type"), fmtTsSec(col("day")).as("day_s"),
        (col("cl").cast("double") / lit(100.0)).as("close"),
        lvl(col("p3")).as("pivot"),
        lvl(lit(2L) * col("p3") - lit(3L) * col("pl")).as("r1"),
        lvl(lit(2L) * col("p3") - lit(3L) * col("ph")).as("s1"),
        lvl(col("p3") + lit(3L) * (col("ph") - col("pl"))).as("r2"),
        lvl(col("p3") - lit(3L) * (col("ph") - col("pl"))).as("s2"),
        (lit(3L) * col("cl") > col("p3")).as("above_pivot"))
      .orderBy("event_type", "day_s")
  }

  /** r10b: Williams fractals per class — the tier's STRUCTURE detector:
    * a bar whose high strictly exceeds the two bars either side is a
    * fractal high (mirror for lows), the swing points every
    * support/resistance and breakout read hangs off. `window_peak_detect`
    * finds z-score anomalies in the raw series; fractals find the
    * GEOMETRIC turning points of the bar sequence, spikes or not.
    * EXACTNESS: two bounded frame selections (max of the 2 before / 2
    * after) and strict integer-cent comparisons — no arithmetic at all;
    * edge bars (fewer than 2 neighbors a side) are excluded by exact
    * frame counts. SCALE: the [[windowDonchian]] posture — one class-hour
    * agg, bounded ±2 frames on the bar sequence. */
  def windowFractal(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wPrev = wOrd.rowsBetween(-2, -1)
    val wNext = wOrd.rowsBetween(1, 2)
    classHourBarsV(events)
      .withColumn("np", count(lit(1)).over(wPrev))
      .withColumn("nn", count(lit(1)).over(wNext))
      .withColumn("hp", max(col("h")).over(wPrev))
      .withColumn("hn", max(col("h")).over(wNext))
      .withColumn("lp", min(col("l")).over(wPrev))
      .withColumn("ln", min(col("l")).over(wNext))
      .filter(col("np") === 2 && col("nn") === 2)
      .withColumn("kind",
        when(col("h") > col("hp") && col("h") > col("hn"), lit("high"))
          .when(col("l") < col("lp") && col("l") < col("ln"), lit("low")))
      .filter(col("kind").isNotNull)
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        col("kind"),
        (when(col("kind") === "high", col("h")).otherwise(col("l"))
          .cast("double") / lit(100.0)).as("level"))
      .orderBy("event_type", "hour_s", "kind")
  }

  /** r10b: Arms' Ease of Movement per class — price change per unit of
    * volume-adjusted range: EMV = (mid − prev_mid)·(H−L)/V. A big level
    * move on thin volume (high EMV) reads very differently from the same
    * move ground out against heavy reporting — the efficiency read
    * [[windowObv]]'s direction-only weighting can't express. EXACTNESS:
    * d2x = (H+L) − (prevH+prevL) is an exact integer (twice the midpoint
    * move in cents); EMV is ONE fixed chain (d2x/2)·((H−L)/100)/V per
    * bar — no sums of computed doubles anywhere; the easing flag
    * (d2x > 0 AND H > L) is pure integer. SCALE: one class-hour agg, one
    * lag window. */
  def windowEmv(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    classHourBarsV(events)
      .withColumn("ph", lag(col("h"), 1).over(wOrd))
      .withColumn("pl", lag(col("l"), 1).over(wOrd))
      .filter(col("ph").isNotNull)
      .withColumn("d2x", (col("h") + col("l")) - (col("ph") + col("pl")))
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        col("d2x").as("mid_move_x2_cents"), col("vol"),
        ((col("d2x").cast("double") / lit(2.0)) *
          ((col("h") - col("l")).cast("double") / lit(100.0)) /
          col("vol").cast("double")).as("emv"),
        (col("d2x") > 0 && col("h") > col("l")).as("easing_up"))
      .orderBy("event_type", "hour_s")
  }

  /** r10b: Elder's Force Index per class — the move×volume impulse:
    * FI1 = (close − prev_close)·volume, the instantaneous "how much
    * conviction was behind this bar", smoothed over 13 bars. The
    * smoothing here is the 13-bar SUM/mean, NOT the classic EMA-13 —
    * stated deviation, chosen because the sum keeps every intermediate an
    * EXACT INTEGER (cents × count), where an EMA would put a float
    * recursion under a window the engines could order differently (the
    * fold tier handles EMAs; this keeps the window tier window-exact).
    * SCALE: one class-hour agg, one lag + one 13-bar integer frame sum. */
  def windowForceIndex(events: DataFrame, n: Int = 13): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wN = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    classHourBarsV(events)
      .withColumn("pcl", lag(col("cl"), 1).over(wOrd))
      .withColumn("fi1", (col("cl") - col("pcl")) * col("vol"))
      .withColumn("nf", count(col("fi1")).over(wN))
      .withColumn("fsum", sum(col("fi1").cast(dec)).over(wN).cast("long"))
      .filter(col("nf") === n)
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        col("fi1").as("force_1"), col("fsum").as("force_sum_13"),
        (col("fsum").cast("double") / lit(n.toDouble) / lit(100.0))
          .as("force_avg"))
      .orderBy("event_type", "hour_s")
  }

  /** r10b: Ultimate Oscillator per class — Williams' three-horizon
    * buying-pressure blend: UO = 100·(4·ΣBP₇/ΣTR₇ + 2·ΣBP₁₄/ΣTR₁₄ +
    * ΣBP₂₈/ΣTR₂₈)/7 with BP = close − min(low, prev_close) and TR =
    * max(high, prev_close) − min(low, prev_close). The single-window
    * oscillators (`window_rsi`, `window_stochastic`) whipsaw when their
    * one horizon disagrees with the trend; UO's weighted three-horizon
    * vote is the classic fix — and unlike RSI it needs NO smoothing
    * recursion. EXACTNESS: BP and TR are integer-cent selections; all
    * six trailing sums are exact integer window sums; UO is one fixed
    * IEEE chain over three exact-integer ratios. SCALE: one class-hour
    * agg, one lag, three bounded frames. */
  def windowUltimateOsc(events: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    def fr(k: Int) = wOrd.rowsBetween(-(k - 1), Window.currentRow)
    classHourBarsV(events)
      .withColumn("pcl", lag(col("cl"), 1).over(wOrd))
      .filter(col("pcl").isNotNull)
      .withColumn("bp", col("cl") - least(col("l"), col("pcl")))
      .withColumn("tr", greatest(col("h"), col("pcl")) - least(col("l"), col("pcl")))
      .withColumn("nb", count(lit(1)).over(fr(28)))
      .withColumn("bp7", sum(col("bp").cast(dec)).over(fr(7)).cast("long"))
      .withColumn("tr7", sum(col("tr").cast(dec)).over(fr(7)).cast("long"))
      .withColumn("bp14", sum(col("bp").cast(dec)).over(fr(14)).cast("long"))
      .withColumn("tr14", sum(col("tr").cast(dec)).over(fr(14)).cast("long"))
      .withColumn("bp28", sum(col("bp").cast(dec)).over(fr(28)).cast("long"))
      .withColumn("tr28", sum(col("tr").cast(dec)).over(fr(28)).cast("long"))
      .filter(col("nb") === 28)
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        col("bp28").as("bp_sum_28"), col("tr28").as("tr_sum_28"),
        when(col("tr7") > 0 && col("tr14") > 0 && col("tr28") > 0,
          lit(100.0) * (lit(4.0) * col("bp7").cast("double") / col("tr7").cast("double") +
            lit(2.0) * col("bp14").cast("double") / col("tr14").cast("double") +
            col("bp28").cast("double") / col("tr28").cast("double")) / lit(7.0))
          .as("ultimate_osc"))
      .orderBy("event_type", "hour_s")
  }

  /** r10b: Relative Vigor Index per class — "do bars CLOSE the way they
    * RANGE?": conviction shows up as closes near the directional extreme
    * of each bar, so RVI = Σ₁₀ wma4(close − open) / Σ₁₀ wma4(high − low)
    * reads trend QUALITY where RSI reads only direction. Open is the
    * prior close (stated — hourly report bars have no session open; the
    * continuous-market convention). EXACTNESS: the (1,2,2,1) symmetric
    * 4-bar weights keep both numerator and denominator EXACT INTEGERS
    * (the /6 cancels in the ratio); the trailing 10-sums are integer
    * window sums; RVI is ONE divide. SCALE: the [[windowDonchian]]
    * class-hour bar posture. */
  def windowRvi(events: DataFrame, n: Int = 10): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wN = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    classHourBarsV(events)
      .withColumn("op", lag(col("cl"), 1).over(wOrd))
      .withColumn("co", col("cl") - col("op"))
      .withColumn("hl", col("h") - col("l"))
      .withColumn("num6",
        col("co") + lit(2L) * lag(col("co"), 1).over(wOrd) +
          lit(2L) * lag(col("co"), 2).over(wOrd) + lag(col("co"), 3).over(wOrd))
      .withColumn("den6",
        col("hl") + lit(2L) * lag(col("hl"), 1).over(wOrd) +
          lit(2L) * lag(col("hl"), 2).over(wOrd) + lag(col("hl"), 3).over(wOrd))
      .withColumn("nv", count(col("num6")).over(wN))
      .withColumn("snum", sum(col("num6").cast(dec)).over(wN).cast("long"))
      .withColumn("sden", sum(col("den6").cast(dec)).over(wN).cast("long"))
      .filter(col("nv") === n)
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        col("snum").as("vigor_num_x6"), col("sden").as("range_den_x6"),
        when(col("sden") > 0,
          col("snum").cast("double") / col("sden").cast("double")).as("rvi"))
      .orderBy("event_type", "hour_s")
  }

  /** r10b: Awesome Oscillator per class — Williams' momentum-of-midpoints:
    * AO = SMA₅(mid) − SMA₃₄(mid), the fast-vs-slow midpoint spread that
    * reads momentum without touching closes at all (robust to last-print
    * noise the close-based tier inherits). EXACTNESS: with s_k = Σ_k(h+l)
    * (exact integer window sums of twice the midpoint), AO·340 =
    * 34·s₅ − 5·s₃₄ is an EXACT INTEGER; the emitted ao is one /340/100
    * chain, and both flags (above zero, rising vs the prior bar) compare
    * the exact integers — immune to the divide. SCALE: the
    * [[windowDonchian]] posture; two bounded frames. */
  def windowAwesomeOsc(events: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val w5 = wOrd.rowsBetween(-4, Window.currentRow)
    val w34 = wOrd.rowsBetween(-33, Window.currentRow)
    classHourBarsV(events)
      .withColumn("m2", col("h") + col("l"))
      .withColumn("nb", count(lit(1)).over(w34))
      .withColumn("s5", sum(col("m2").cast(dec)).over(w5).cast("long"))
      .withColumn("s34", sum(col("m2").cast(dec)).over(w34).cast("long"))
      .filter(col("nb") === 34)
      .withColumn("ao340", lit(34L) * col("s5") - lit(5L) * col("s34"))
      .withColumn("pao", lag(col("ao340"), 1).over(wOrd))
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        col("ao340").as("ao_x340"),
        (col("ao340").cast("double") / lit(340.0) / lit(100.0)).as("ao"),
        (col("ao340") > 0).as("above_zero"),
        when(col("pao").isNotNull, col("ao340") > col("pao")).as("rising"))
      .orderBy("event_type", "hour_s")
  }

  /** r10b: Time Series Forecast (rolling 20-bar OLS endpoint) per class —
    * the REGRESSION member of the moving-average family: an SMA lags a
    * trend by (n−1)/2 bars by construction; TSF fits y = a + b·x over
    * the trailing bars and reads the fitted ENDPOINT, tracking trends
    * with no lag (the classic `linreg`/TSF indicator), plus the slope
    * (trend per bar) and the current bar's deviation from its own fit
    * (the one-bar residual the channel reads hang off).
    *
    * EXACTNESS — everything multiplies through by the determinant: with
    * x = the class-bar sequence index (consecutive integers, so
    * den = n·Σx² − (Σx)² = n²(n²−1)/12 exactly), num = n·Σxy − ΣxΣy,
    *   fit·(n·den) = Σy·den + num·(n·x_t − Σx)
    *   dev·(n·den) = n·den·cl_t − fit·(n·den)
    * are EXACT DECIMAL(38,0) integers off four integer window sums;
    * slope, tsf and dev are one fixed divide each, and the rising flag
    * compares the exact num against zero. SCALE: the [[windowDonchian]]
    * bar posture — one class-hour agg, one 20-bar frame. */
  def windowTsf(events: DataFrame, n: Int = 20): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wN = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    val nd = lit(n.toLong).cast(dec)
    classHourBarsV(events)
      .withColumn("x", row_number().over(wOrd).cast("long"))
      .withColumn("nb", count(lit(1)).over(wN))
      .withColumn("sx", sum(col("x").cast(dec)).over(wN))
      .withColumn("sy", sum(col("cl").cast(dec)).over(wN))
      .withColumn("sxy", sum((col("x") * col("cl")).cast(dec)).over(wN))
      .withColumn("sxx", sum((col("x") * col("x")).cast(dec)).over(wN))
      .filter(col("nb") === n)
      .withColumn("num", nd * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", nd * col("sxx") - col("sx") * col("sx"))
      .withColumn("fitn",
        col("sy") * col("den") + col("num") * (nd * col("x") - col("sx")))
      .withColumn("devn", nd * col("den") * col("cl") - col("fitn"))
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        (col("cl").cast("double") / lit(100.0)).as("close"),
        (graft.Det.decToDouble(col("num")) / graft.Det.decToDouble(col("den")) /
          lit(100.0)).as("slope"),
        (graft.Det.decToDouble(col("fitn")) /
          (lit(n.toDouble) * graft.Det.decToDouble(col("den"))) / lit(100.0))
          .as("tsf"),
        (graft.Det.decToDouble(col("devn")) /
          (lit(n.toDouble) * graft.Det.decToDouble(col("den"))) / lit(100.0))
          .as("deviation"),
        (col("num") > 0).as("rising"))
      .orderBy("event_type", "hour_s")
  }

  /** r10b: Detrended Price Oscillator per class — subtract the 20-bar SMA
    * from the close HALF A WINDOW BACK (shift = n/2 + 1), erasing trends
    * longer than the window so only the sub-window CYCLE remains: the
    * cycle-length read (`ts_seasonality_strength` asks "how strong is the
    * 24 h cycle"; DPO shows the cycle itself at bar grain, trend removed).
    * EXACTNESS: dpo·n = n·close_{t−11} − Σ₂₀close is an exact integer;
    * ONE /n/100 double chain; the positive-phase flag compares the same
    * integers. SCALE: one class-hour agg, one lag + one 20-bar integer
    * frame sum. */
  def windowDpo(events: DataFrame, n: Int = 20): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val shift = n / 2 + 1
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wN = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    classHourBarsV(events)
      .withColumn("nb", count(lit(1)).over(wN))
      .withColumn("s20", sum(col("cl").cast(dec)).over(wN).cast("long"))
      .withColumn("clb", lag(col("cl"), shift).over(wOrd))
      .filter(col("nb") === n && col("clb").isNotNull)
      .withColumn("dpon", lit(n.toLong) * col("clb") - col("s20"))
      .select(col("event_type"), fmtTsSec(col("hr")).as("hour_s"),
        col("dpon").as(s"dpo_x$n"),
        (col("dpon").cast("double") / lit(n.toDouble) / lit(100.0)).as("dpo"),
        (col("dpon") > 0).as("cycle_high_phase"))
      .orderBy("event_type", "hour_s")
  }
}
