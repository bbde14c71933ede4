package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Association / agreement / ordered-trend statistics (r10) — the cells of
  * the nonparametric grid the rank-test family (`ops/RankStats.scala`) and
  * the pair-test family (`ops/Inference.scala`) still left open:
  *
  *  - [[statSomersD]] — DIRECTIONAL ordinal association (Somers' D both
  *    orientations + Goodman–Kruskal gamma) on the paired hourly series:
  *    Kendall τ-b answers "are x and y associated?"; D_yx answers "how
  *    much does y respond per unit of x ORDER?" — the asymmetric reading
  *    a dose→response monitor actually wants.
  *  - [[statJonckheere]] — the Jonckheere–Terpstra ORDERED-alternative
  *    k-sample trend test: Kruskal–Wallis asks "do the hour-of-day groups
  *    differ at all?"; J-T asks "does traffic RISE with the hour of day?"
  *    — strictly more power when the alternative is monotone.
  *  - [[statPageTrend]] — Page's L, the ordered-alternative twin of the
  *    Friedman blocked design (blocks = hours, treatments = event
  *    classes): "does the within-hour class ordering trend with the
  *    declared class order?"
  *  - [[statMcNemar]] — paired binary marginal-homogeneity: of the users
  *    who did exactly one of {click, purchase}, is either side
  *    systematically favored? The A/B-on-the-same-units contingency test.
  *  - [[statCohenKappa]] — chance-corrected rater agreement between the
  *    declared `lang` label and the n-gram router's prediction
  *    ([[graft.ext.Text.textLangid]]): the single-number calibration
  *    verdict on top of `text_lang_confusion`'s full matrix.
  *
  * Reference anchor: the fleet-monitoring threshold screens
  * (`AIRWISEv0.py:73-103`) generalized to distribution/trend-level tests,
  * same as the rest of the stats tier.
  *
  * EXACTNESS: every statistic is assembled from exact integer counts
  * (contingency cells, doubled midranks — no fractional midrank ever
  * materializes), accumulated in DECIMAL(38,0), converted once through
  * [[graft.Det.decToDouble]]'s base-2^53 split, then finished in a short
  * fixed IEEE chain — the `stat_friedman` / `stat_wilcoxon_signed_rank`
  * discipline, so the DuckDB oracle hash-matches bit for bit.
  *
  * SCALE: no statistic here ever ranks or pairs raw rows. The frames are
  * the hourly series (time-span-bounded), the (hour-of-day × value-vocab)
  * grid (24 × vocabulary), the (class × hour) grid, per-user binary flags
  * (one hash agg over the fact table), and the langs² confusion cells.
  * Variances are quoted WITHOUT tie correction where stated — screening
  * statistics, not p-values (the `stat_friedman` convention).
  */
object Association {
  private val dec38 = DecimalType(38, 0)
  private val d2 = graft.Det.decToDouble _

  /** The paired hourly (x, y) = (clicks, purchases) series — the same
    * frame the Kendall/Spearman/sign tests consume. */
  private def pairedHourly(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))

  /** Somers' D (both orientations) + Goodman–Kruskal gamma over the
    * paired hourly click/purchase series. Same concordant/discordant/tie
    * pair counts as `stat_kendall_tau` (the hour-pair inequality join
    * over the time-bounded hourly frame — H(H−1)/2 pairs, ~1M for a
    * couple of months, never row-scaled), finished with the three
    * asymmetric normalizations instead of τ-b's symmetric one:
    *
    *   D_yx = (C−D)/(n0 − T_x)   (y the response: x-ties can't count)
    *   D_xy = (C−D)/(n0 − T_y)
    *   γ    = (C−D)/(C+D)        (ties dropped entirely)
    *
    * All counts exact longs; each ratio one double divide. One row out. */
  def statSomersD(events: DataFrame): DataFrame = {
    val hourly = pairedHourly(events)
    val nRow = hourly.agg(count(lit(1)).as("n_hours"))
    val pairs = hourly.as("a")
      .join(broadcast(hourly.as("b")), col("a.hour") < col("b.hour"))
      .agg(
        sum(when((col("a.x") - col("b.x")) * (col("a.y") - col("b.y")) > 0, 1L)
          .otherwise(0L)).as("n_concordant"),
        sum(when((col("a.x") - col("b.x")) * (col("a.y") - col("b.y")) < 0, 1L)
          .otherwise(0L)).as("n_discordant"),
        sum(when(col("a.x") === col("b.x"), 1L).otherwise(0L)).as("ties_x"),
        sum(when(col("a.y") === col("b.y"), 1L).otherwise(0L)).as("ties_y"))
    pairs.crossJoin(broadcast(nRow))
      .withColumn("n0",
        call_function("div", col("n_hours") * (col("n_hours") - 1), lit(2L)))
      .withColumn("cd",
        col("n_concordant").cast("double") - col("n_discordant").cast("double"))
      .select(col("n_hours"), col("n0").as("n_pairs"),
        col("n_concordant"), col("n_discordant"),
        col("ties_x"), col("ties_y"),
        when(col("n0") > col("ties_x"),
          col("cd") / (col("n0") - col("ties_x")).cast("double")).as("somers_d_yx"),
        when(col("n0") > col("ties_y"),
          col("cd") / (col("n0") - col("ties_y")).cast("double")).as("somers_d_xy"),
        when(col("n_concordant") + col("n_discordant") > 0,
          col("cd") / (col("n_concordant") + col("n_discordant")).cast("double"))
          .as("gamma"))
  }

  /** Jonckheere–Terpstra ordered-alternative trend test: ordered groups =
    * hour-of-day 0..23 (the dose), observations = the DENSIFIED per-(day,
    * hour-of-day) event counts (a day silent in an hour is a legitimate
    * zero observation — the `stat_friedman` densification argument), and
    *
    *   J = Σ_{g1<g2} [ #(x∈g1 < y∈g2) + ½·#(x∈g1 = y∈g2) ].
    *
    * NEVER pairwise: with cnt(g, v) the (group × value) contingency and
    * two bounded cumulative windows —
    *   less(g, v)       = Σ_{v'<v}  cnt(g, v')     (per-group, value order)
    *   prefLess(g, v)   = Σ_{g'<g} less(g', v)     (per-value, group order)
    *   prefEq(g, v)     = Σ_{g'<g} cnt(g', v)
    * — the doubled statistic is the exact integer
    *   2J = Σ_{g,v} cnt(g, v) · (2·prefLess(g, v) + prefEq(g, v)).
    * The grid is 24 × |value vocabulary| (the vocabulary saturates toward
    * the count RANGE, not the row count — the rank-test scale argument).
    *
    * Null moments (balanced by densification: n_g = n_days ∀g):
    *   4·E[J]  = N² − Σ n_g²                            (exact integer)
    *   72·Var  = N²(2N+3) − Σ n_g²(2n_g+3)  (ties IGNORED — stated; a
    *             screening statistic, the `stat_friedman` convention)
    * z finishes in one fixed IEEE chain off the exact integers. */
  def statJonckheere(events: DataFrame): DataFrame = {
    val cells = events.groupBy(
        date_trunc("day", col("ts")).as("day"),
        hour(col("ts")).cast("long").as("g"))
      .agg(count(lit(1)).as("n"))
    val days = cells.select(col("day")).distinct()
    val hods = cells.sparkSession.range(0, 24).select(col("id").as("g"))
    val obs = days.crossJoin(broadcast(hods))
      .join(cells, Seq("day", "g"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val cnt = obs.groupBy(col("g"), col("n").as("v"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val wLess = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wPref = Window.partitionBy(col("v")).orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // grid densified over the full vocabulary so BOTH windows see every
    // (g, v) cell (a vocab value absent from a group still accumulates
    // cross-group prefixes through it)
    val vocab = cnt.select(col("v")).distinct()
    val grid = vocab.crossJoin(broadcast(hods))
      .join(cnt, Seq("g", "v"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val contrib = grid
      .withColumn("less", coalesce(sum(col("cnt")).over(wLess), lit(0L)))
      .withColumn("prefLess", coalesce(sum(col("less")).over(wPref), lit(0L)))
      .withColumn("prefEq", coalesce(sum(col("cnt")).over(wPref), lit(0L)))
    val j2 = contrib.agg(
      sum(col("cnt").cast(dec38) *
        (lit(2L) * col("prefLess") + col("prefEq"))).as("j2"))
    val sizes = obs.groupBy(col("g")).agg(count(lit(1)).as("ng"))
      .agg(count(lit(1)).as("k"),
        sum(col("ng")).as("n_total"),
        sum(col("ng").cast(dec38) * col("ng")).as("sn2"),
        sum(col("ng").cast(dec38) * col("ng") *
          (lit(2L) * col("ng") + lit(3L))).as("sn23"))
    j2.crossJoin(broadcast(sizes))
      .withColumn("nt", col("n_total").cast(dec38))
      .withColumn("e4", col("nt") * col("nt") - col("sn2"))
      .withColumn("v72",
        col("nt") * col("nt") * (lit(2L) * col("nt") + lit(3L)) - col("sn23"))
      .select(
        col("k").as("n_groups"), col("n_total").as("n_obs"),
        col("j2").cast("long").as("j_x2"),
        (d2(col("j2")) / 2.0).as("j_stat"),
        (d2(col("e4")) / 4.0).as("e_j"),
        (d2(col("v72")) / 72.0).as("var_j"),
        when(col("v72") > 0,
          (d2(col("j2")) / 2.0 - d2(col("e4")) / 4.0) /
            sqrt(d2(col("v72")) / 72.0)).as("z_stat"))
  }

  /** Page's L trend test — the ordered-alternative reading of the
    * Friedman blocked design (blocks = hours, treatments = event classes,
    * treatment order = ALPHABETICAL class name, the declared convention):
    *   L = Σ_j w_j · R_j,  w_j = 1..k alphabetical, R_j = rank sum.
    * Rides [[RankStats.friedmanRankedGrid]]'s doubled-midrank grid
    * (2L = Σ w_j·R2_j stays an exact integer; the k-row weight window is
    * bounded by the class count). Null moments:
    *   4·E[L]   = n·k·(k+1)²                             (exact integer)
    *   144·Var  = n·k²·(k+1)·(k²−1)                      (exact integer)
    * One row out; ties uncorrected (stated — the Friedman convention). */
  def statPageTrend(events: DataFrame): DataFrame = {
    val ranked = RankStats.friedmanRankedGrid(events)
    val perClass = ranked.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("r2").cast(dec38)).as("rs2"))
    val wAlpha = Window.orderBy(col("event_type"))
    val weighted = perClass
      .withColumn("w", row_number().over(wAlpha).cast("long"))
    val totals = weighted.agg(
      count(lit(1)).as("k"),
      max(col("n_blocks")).as("nb"),
      sum(col("w").cast(dec38) * col("rs2")).as("l2"))
    totals
      .withColumn("kd", col("k").cast(dec38))
      .withColumn("nd", col("nb").cast(dec38))
      .withColumn("e4", col("nd") * col("kd") * (col("kd") + 1) * (col("kd") + 1))
      .withColumn("v144", col("nd") * col("kd") * col("kd") * (col("kd") + 1) *
        (col("kd") * col("kd") - 1))
      .select(col("k").as("n_classes"), col("nb").as("n_blocks"),
        col("l2").cast("long").as("l_x2"),
        (d2(col("l2")) / 2.0).as("page_l"),
        (d2(col("e4")) / 4.0).as("e_l"),
        (d2(col("v144")) / 144.0).as("var_l"),
        when(col("v144") > 0,
          (d2(col("l2")) / 2.0 - d2(col("e4")) / 4.0) /
            sqrt(d2(col("v144")) / 144.0)).as("z_stat"))
  }

  /** Quade test — the blocked rank ANOVA that WEIGHTS blocks by how much
    * information they carry: Friedman gives every hour one vote; Quade
    * multiplies each hour's within-block ranks by the midrank of the
    * hour's value RANGE across hours, so a busy hour with real spread
    * between classes outvotes a flat one (the standard higher-power
    * alternative for small k). Doubled midranks keep EVERYTHING integral:
    * with r2 = 2r (within-block, from [[RankStats.friedmanRankedGrid]])
    * and q2 = 2Q (block-range midranks across blocks, same identity),
    *   S4_bj = q2_b · (r2_bj − (k+1)) = 4·S_bj
    * is an exact integer, per-class sums S4_j and both sums of squares
    * accumulate in DECIMAL(38,0), and the statistic
    *   T = (n−1)·Σ_j S4_j² / (n·Σ_bj S4_bj² − Σ_j S4_j²)
    * finishes in one fixed IEEE chain off three exact integers (the 16s
    * cancel). Per-class rows carry S4_j (the effect direction) plus the
    * shared T. SCALE: everything rides the (class × hour) grid and the
    * hours frame — block-bounded, never row-scaled. */
  def statQuade(events: DataFrame): DataFrame = {
    val ranked = RankStats.friedmanRankedGrid(events)
    // block weights: doubled midranks of the per-hour value RANGE
    val wRk = Window.orderBy(col("rng"))
    val wTie = Window.partitionBy(col("rng"))
    val blocks = ranked.groupBy(col("hr"))
      .agg((max(col("n")) - min(col("n"))).as("rng"),
        count(lit(1)).as("k"))
      .withColumn("q2",
        lit(2L) * rank().over(wRk).cast("long") + count(lit(1)).over(wTie) - 1)
    val s4 = ranked.join(blocks.select(col("hr"), col("q2"), col("k")), Seq("hr"))
      .withColumn("s4", col("q2") * (col("r2") - (col("k") + 1)))
    val perClass = s4.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("s4").cast(dec38)).as("s4j"),
        sum(col("s4").cast(dec38) * col("s4")).as("a16c"))
    val totals = perClass.agg(
      count(lit(1)).as("k"),
      max(col("n_blocks")).as("nb"),
      sum(col("a16c")).as("a16"),
      sum(col("s4j") * col("s4j")).as("b16n"))
    perClass.crossJoin(broadcast(totals))
      .withColumn("den", col("nb").cast(dec38) * col("a16") - col("b16n"))
      .select(col("event_type"), col("n_blocks"), col("k"),
        col("s4j").cast("long").as("s4_j"),
        when(col("den") > 0,
          d2((col("nb") - 1).cast(dec38) * col("b16n")) / d2(col("den")))
          .as("quade_t"))
      .orderBy("event_type")
  }

  /** Turning-points (local extrema census) test for serial randomness on
    * the per-class OBSERVED hourly series (non-densified — the
    * `stat_runs_up_down` raw-sequence convention, stated; densifying
    * would flood the count quantization with zero-run ties): T = # of
    * interior hours where the two neighboring deltas have STRICTLY
    * opposite signs. Under i.i.d., E[T] = 2(n−2)/3 and
    * Var[T] = (16n−29)/90 — exact integer numerators, one fixed z
    * chain. The cheapest "is this series i.i.d. or does it trend/
    * oscillate" screen next to [[graft.ops.Aggs]]' runs tests: runs
    * tests count sign CHANGES of one delta stream; turning points count
    * sign ALTERNATIONS of adjacent deltas, which catches short
    * oscillation the median-runs screen misses. Plan: one (class, hour)
    * hash agg, two lag/lead windows on the hour-bounded frame, one agg. */
  def statTurningPoints(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    hourly
      .withColumn("pn", lag(col("n"), 1).over(w))
      .withColumn("nn", lead(col("n"), 1).over(w))
      .withColumn("tp",
        when(col("pn").isNotNull && col("nn").isNotNull &&
          (col("n") - col("pn")) * (col("nn") - col("n")) < 0, 1L)
          .otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("tp")).as("n_turning"))
      .withColumn("nd", col("n_hours").cast("double"))
      .select(col("event_type"), col("n_hours"), col("n_turning"),
        when(col("n_hours") >= 3,
          lit(2.0) * (col("nd") - 2.0) / 3.0).as("expected_tp"),
        when(lit(16.0) * col("nd") - 29.0 > 0,
          (col("n_turning").cast("double") -
            lit(2.0) * (col("nd") - 2.0) / 3.0) /
            sqrt((lit(16.0) * col("nd") - 29.0) / 90.0)).as("z_stat"))
      .orderBy("event_type")
  }

  /** Cox–Stuart trend test on the per-class observed hourly series — the
    * assumption-free "is the second half systematically above the
    * first?" screen: pair hour i with hour i + ⌈n/2⌉ (odd n drops the
    * middle, the standard convention), sign-test the pairs (ties drop).
    * Weaker than Mann–Kendall but O(n) with ONE equi-join — the cheap
    * pre-screen in front of the heavier trend machinery. z =
    * (pos − neg)/√(pos + neg), the `stat_sign_test` chain. Plan: one
    * (class, hour) hash agg, one class-bounded row_number window, one
    * self-equi-join on (class, shifted index). */
  def statCoxStuart(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("nh", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    val c = call_function("div", col("nh") + 1, lit(2L)) // ceil(n/2), integral
    val first = hourly.filter(col("rn") <= call_function("div", col("nh"), lit(2L)))
      .select(col("event_type"), (col("rn") + c).as("rn2"), col("n").as("x"))
    val second = hourly
      .select(col("event_type"), col("rn").as("rn2"), col("n").as("y"))
    first.join(second, Seq("event_type", "rn2"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("y") > col("x"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("y") < col("x"), 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("y") === col("x"), 1L).otherwise(0L)).as("n_tie"))
      .select(col("event_type"), col("n_pairs"), col("n_pos"), col("n_neg"),
        col("n_tie"),
        when(col("n_pos") + col("n_neg") > 0,
          (col("n_pos").cast("double") - col("n_neg").cast("double")) /
            sqrt(col("n_pos").cast("double") + col("n_neg").cast("double")))
          .as("z_stat"))
      .orderBy("event_type")
  }

  /** McNemar's paired-binary test on per-user (clicked?, purchased?)
    * flags: the discordant cells b (click only) and c (purchase only)
    * carry ALL the information about marginal asymmetry —
    *   χ² = (b−c)²/(b+c),  continuity-corrected (max(|b−c|−1, 0))²/(b+c).
    * One hash agg over the fact table to the per-user flags, one 1-row
    * rollup; everything exact until the final divide. */
  def statMcNemar(events: DataFrame): DataFrame = {
    val flags = events.groupBy(col("user_id")).agg(
      max(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicked"),
      max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchased"))
    flags.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("clicked") === 1 && col("purchased") === 1, 1L)
          .otherwise(0L)).as("n_both"),
        sum(when(col("clicked") === 1 && col("purchased") === 0, 1L)
          .otherwise(0L)).as("n_click_only"),
        sum(when(col("clicked") === 0 && col("purchased") === 1, 1L)
          .otherwise(0L)).as("n_purchase_only"),
        sum(when(col("clicked") === 0 && col("purchased") === 0, 1L)
          .otherwise(0L)).as("n_neither"))
      .withColumn("bc", col("n_click_only") + col("n_purchase_only"))
      .withColumn("d", col("n_click_only") - col("n_purchase_only"))
      .withColumn("dc", greatest(abs(col("d")) - 1, lit(0L)))
      .select(col("n_users"), col("n_both"), col("n_click_only"),
        col("n_purchase_only"), col("n_neither"),
        when(col("bc") > 0,
          (col("d") * col("d")).cast("double") / col("bc").cast("double"))
          .as("mcnemar_chi2"),
        when(col("bc") > 0,
          (col("dc") * col("dc")).cast("double") / col("bc").cast("double"))
          .as("mcnemar_chi2_cc"))
  }

  /** Cliff's delta — the ASSUMPTION-FREE effect size for the
    * weekend-vs-weekday load question, per event class: Mann–Whitney (and
    * its z) says WHETHER the two samples differ; δ = P(a > b) − P(a < b)
    * says by HOW MUCH on the dominance scale [−1, 1], readable without
    * any variance model. Samples are the per-hour event counts, split
    * weekday (isodow 1–5) vs weekend (6–7).
    *
    * NEVER pairwise (the [[statJonckheere]] discipline): on the per-class
    * value vocabulary, one cumulative window over the weekend counts
    * gives gt = Σ_v cntWd(v)·cumWe_lt(v) and lt = Σ_v cntWd(v)·cumWe_gt(v)
    * as exact DECIMAL(38,0) integers — work is the (class × count-vocab)
    * grid, which saturates toward the count RANGE, never the row count.
    * δ = (gt − lt)/(n_wd·n_we), one double divide per class. */
  def statCliffDelta(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      // Spark weekday: 0=Mon..6=Sun; oracle isodow: 1=Mon..7=Sun
      .withColumn("we", (weekday(col("hour")) >= 5).cast("int"))
    val cnt = hourly.groupBy(col("event_type"), col("n").as("v"))
      .agg(
        sum(when(col("we") === 0, 1L).otherwise(0L)).as("c_wd"),
        sum(when(col("we") === 1, 1L).otherwise(0L)).as("c_we"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("v"))
    val wAll = Window.partitionBy(col("event_type"))
    val scanned = cnt
      .withColumn("cum_we_lt",
        coalesce(sum(col("c_we")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("n_we", sum(col("c_we")).over(wAll))
      .withColumn("cum_we_gt", col("n_we") - col("cum_we_lt") - col("c_we"))
    scanned.groupBy(col("event_type"))
      .agg(
        sum(col("c_wd")).as("n_wd"),
        max(col("n_we")).as("n_we"),
        sum(col("c_wd").cast(dec38) * col("cum_we_lt")).as("gt"),
        sum(col("c_wd").cast(dec38) * col("cum_we_gt")).as("lt"))
      .select(col("event_type"), col("n_wd"), col("n_we"),
        col("gt").cast("long").as("n_gt"), col("lt").cast("long").as("n_lt"),
        when(col("n_wd") > 0 && col("n_we") > 0,
          (d2(col("gt")) - d2(col("lt"))) /
            (col("n_wd").cast("double") * col("n_we").cast("double")))
          .as("cliff_delta"))
      .orderBy("event_type")
  }

  /** Kendall's coefficient of concordance W — the AGREEMENT reading of the
    * Friedman design (blocks = hours as raters, treatments = event
    * classes): Friedman's Q says "do the classes differ"; W ∈ [0, 1] says
    * "how consistently do the hours rank them" — W ≈ 1 means every hour
    * sees the same class ordering (a stable workload mix), W ≈ 0 means the
    * mix churns hour to hour. Rides [[RankStats.friedmanRankedGrid]]'s
    * doubled-midrank grid: with d_j = R2_j − n(k+1) (exact integers),
    * W = 3·Σd²/(n²k(k²−1)) (the 12/4 collapses), and the Friedman relation
    * χ² = n(k−1)·W comes along free. Ties uncorrected (stated — the
    * `stat_friedman` screening convention). One row out. */
  def statKendallW(events: DataFrame): DataFrame = {
    val ranked = RankStats.friedmanRankedGrid(events)
    val perClass = ranked.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("r2").cast(dec38)).as("rs2"))
    perClass
      .agg(count(lit(1)).as("k"), max(col("n_blocks")).as("nb"),
        sum(col("rs2")).as("tot"),
        sum(col("rs2") * col("rs2")).as("srr"))
      .withColumn("kd", col("k").cast(dec38))
      .withColumn("nd", col("nb").cast(dec38))
      // Σ(R2_j − n(k+1))² = Σ R2² − 2n(k+1)ΣR2 + k·n²(k+1)²  (exact)
      .withColumn("sd2",
        col("srr") - lit(2L) * col("nd") * (col("kd") + 1) * col("tot") +
          col("kd") * col("nd") * col("nd") * (col("kd") + 1) * (col("kd") + 1))
      .select(col("k").as("n_classes"), col("nb").as("n_blocks"),
        col("sd2").cast("long").as("sum_dev2_x4"),
        when(col("k") > 1 && col("nb") > 0,
          lit(3.0) * d2(col("sd2")) /
            (d2(col("nd")) * d2(col("nd")) * d2(col("kd")) *
              (d2(col("kd")) * d2(col("kd")) - 1.0))).as("kendall_w"),
        when(col("k") > 1 && col("nb") > 0,
          d2(col("nd")) * (d2(col("kd")) - 1.0) *
            (lit(3.0) * d2(col("sd2")) /
              (d2(col("nd")) * d2(col("nd")) * d2(col("kd")) *
                (d2(col("kd")) * d2(col("kd")) - 1.0)))).as("chi2_stat"))
  }

  /** Chatterjee's ξ (xi) rank correlation on the paired hourly
    * click/purchase series — the MODERN dependence coefficient the
    * classical tier can't replicate: Pearson/Spearman/Kendall all measure
    * MONOTONE association (a V-shaped or periodic y-on-x relationship
    * scores ~0 on all three); ξ → 1 iff y is ANY measurable function of x,
    * so it catches "purchases are determined by clicks, just not
    * monotonically". Sequence order: ascending x, ties broken by hour
    * (the deterministic stand-in for the randomized tie-break, stated —
    * same screening convention as the uncorrected-tie tests).
    *
    * Exactness: with cum_le/cnt from the y-vocabulary (one bounded
    * window), r_i = #{y_j ≤ y_i} and l_i = #{y_j ≥ y_i} are exact longs;
    * the tie-general statistic
    *   ξ = 1 − n·Σ|r_{i+1} − r_i| / (2·Σ l_i(n − l_i))
    * is a ratio of two exact DECIMAL(38,0) integers, one double divide.
    * Frames: the hourly series (span-bounded) and its count vocabulary —
    * never row-scaled. */
  def statXiCorr(events: DataFrame): DataFrame = {
    val hourly = pairedHourly(events)
    val vocab = hourly.groupBy(col("y").as("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum_le",
        sum(col("cnt")).over(Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    val seq = hourly.join(vocab, col("y") === col("v"))
      .withColumn("nh", count(lit(1)).over(Window.partitionBy()))
      .withColumn("r", col("cum_le"))
      .withColumn("l", col("nh") - col("cum_le") + col("cnt"))
    val wSeq = Window.orderBy(col("x"), col("hour"))
    seq
      .withColumn("dr",
        abs(lead(col("r"), 1).over(wSeq) - col("r")))
      .agg(
        max(col("nh")).as("n_hours"),
        sum(coalesce(col("dr"), lit(0L)).cast(dec38)).as("sdr"),
        sum(col("l").cast(dec38) * (col("nh") - col("l"))).as("sln"))
      .select(col("n_hours"),
        col("sdr").cast("long").as("sum_rank_jump"),
        (lit(2L) * col("sln")).cast("long").as("den_x2"),
        when(col("sln") > 0,
          lit(1.0) - col("n_hours").cast("double") * d2(col("sdr")) /
            (lit(2.0) * d2(col("sln")))).as("xi_corr"))
  }

  /** Cochran–Armitage trend-in-proportions test across the hour-of-day
    * dose: of each hour-of-day's (click + purchase) traffic, does the
    * PURCHASE SHARE trend with the hour (0..23 as ordered scores)?
    * [[statJonckheere]] asks whether raw LEVEL rises with the hour; C–A
    * asks whether the conversion MIX does — the binomial-proportion trend
    * screen, one hash agg off the fact table.
    *
    * Exactness: with N, R (total/successes), Swn, Swr, Sw2n (weighted
    * sums, w = hour-of-day) all exact integers,
    *   A = N·Swr − R·Swn,   B = R·(N−R)·(N·Sw2n − Swn²)
    * are exact DECIMAL(38,0) and z = A·√N/√B finishes in one fixed IEEE
    * chain (magnitude bound: B ~ N³·w̄⁴ stays inside 38 digits while
    * N < ~10⁹ per fixture slice — the Jarque–Bera documented-not-enforced
    * class). 24-cell grid, 1-row output. */
  def statCochranArmitage(events: DataFrame): DataFrame = {
    val cells = events
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(hour(col("ts")).cast("long").as("g"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("r"))
    cells.agg(
        sum(col("n")).as("n_total"),
        sum(col("r")).as("n_success"),
        sum(col("g").cast(dec38) * col("n")).as("swn"),
        sum(col("g").cast(dec38) * col("r")).as("swr"),
        sum((col("g") * col("g")).cast(dec38) * col("n")).as("sw2n"))
      .withColumn("nn", col("n_total").cast(dec38))
      .withColumn("rr", col("n_success").cast(dec38))
      .withColumn("a", col("nn") * col("swr") - col("rr") * col("swn"))
      .withColumn("b",
        col("rr") * (col("nn") - col("rr")) *
          (col("nn") * col("sw2n") - col("swn") * col("swn")))
      .select(col("n_total"), col("n_success"),
        col("a").cast("long").as("trend_num"),
        when(col("b") > 0,
          d2(col("a")) * sqrt(col("n_total").cast("double")) / sqrt(d2(col("b"))))
          .as("z_stat"))
  }

  /** Cohen's kappa between the declared `lang` label and the n-gram
    * router's prediction ([[graft.ext.Text.textLangid]]) — the
    * chance-corrected scalar on top of `text_lang_confusion`'s matrix.
    * With exact integer N, diag = Σ agreements, and Σᵢ rowᵢ·colᵢ:
    *   κ = (N·diag − Σ rᵢcᵢ) / (N² − Σ rᵢcᵢ)
    * — numerator and denominator BOTH exact DECIMAL(38,0) integers, one
    * double divide at the end. Frames: per-doc predictor map, langs²
    * cells, ≤langs-row marginals. */
  def statCohenKappa(documents: DataFrame): DataFrame = {
    val cells = graft.ext.Text.textLangid(documents)
      .groupBy(col("true_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.agg(
      sum(col("n")).as("n_docs"),
      sum(when(col("true_lang") === col("pred_lang"), col("n"))
        .otherwise(0L)).as("n_agree"))
    val rows = cells.groupBy(col("true_lang").as("lbl"))
      .agg(sum(col("n")).as("r"))
    val cols = cells.groupBy(col("pred_lang").as("lbl"))
      .agg(sum(col("n")).as("c"))
    val src = rows.join(cols, Seq("lbl"))
      .agg(coalesce(sum(col("r").cast(dec38) * col("c")), lit(0L).cast(dec38))
        .as("src"))
    totals.crossJoin(broadcast(src))
      .withColumn("nn", col("n_docs").cast(dec38))
      .withColumn("num", col("nn") * col("n_agree") - col("src"))
      .withColumn("den", col("nn") * col("nn") - col("src"))
      .select(col("n_docs"), col("n_agree"),
        (d2(col("n_agree").cast(dec38)) / d2(col("nn"))).as("p_observed"),
        (d2(col("src")) / (d2(col("nn")) * d2(col("nn")))).as("p_expected"),
        when(col("den") > 0, d2(col("num")) / d2(col("den"))).as("kappa"))
  }
}
