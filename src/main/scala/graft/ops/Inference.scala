package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** r8: classical inference / effect-size statistics over the event stream —
  * the normality / outlier / association screens a data-quality pipeline
  * runs on top of the moment machinery (`stat_moments_per_type`) and the
  * hourly-traffic frames (`stat_corr_hourly`): Jarque–Bera (is the value
  * distribution even plausibly Gaussian — gating every t/F-test upstream),
  * Grubbs (single-outlier identification with the offending row),
  * Cohen's d (HOW different are two classes, where Welch only says
  * whether), paired sign test and Kendall τ-b (distribution-free
  * co-movement next to `stat_spearman_hourly`), and Ljung–Box (is the
  * hourly series white noise at all — the gate before trusting
  * `stat_autocorr_lag`'s point estimates). Reference anchor: the
  * heartbeat monitor's fixed-threshold screens (`AIRWISEv0.py:73-103`)
  * generalized to distribution-level testing, as `ops/RankStats.scala`.
  *
  * Exactness contract (the library's standard recipe): values quantize to
  * integer cents once, every sum accumulates in DECIMAL(38,0)/HUGEINT
  * (order-free), sums cross to double via the base-2^53 split
  * ([[graft.Det.decToDouble]]), and every remaining op is one fixed
  * IEEE chain mirrored verbatim in the DuckDB oracle — so even the
  * test statistics hash-match bit for bit. */
object Inference {

  private val dec = DecimalType(38, 0)
  private def d2(c: Column): Column = graft.Det.decToDouble(c)
  private def centsDec(v: Column): Column =
    (v.cast(DecimalType(28, 2)) * 100).cast(dec)

  /** Jarque–Bera normality test per event class: JB = n·(S²/6 + K²/24)
    * from the same exact central-moment chain as
    * [[Aggs.statMomentsPerType]] (integer power sums in cents; S and K
    * are unit-free so the cents scale cancels). Large JB ⇒ reject
    * normality ⇒ the Gaussian tests (`stat_welch_t`, `stat_anova_f`)
    * upstream are on thin ice and the rank family applies. One hash agg
    * on the class key; 5-row output.
    *
    * Magnitude bound (r9, ADVICE): the 4th-power cent sums accumulate in
    * DECIMAL(38,0), so the chain is exact only while n·max|c|⁴ < 10³⁸
    * (DuckDB's HUGEINT tops out at the same decade, ~1.7·10³⁸). In value
    * units: |value| ≤ 10⁴ keeps the chain exact to n ≈ 10¹⁴ rows;
    * |value| ~ 10⁶ (c ~ 10⁸) only to n ≈ 10⁶. Past the bound Spark
    * (non-ANSI) would NULL the sums silently while DuckDB hard-errors — a
    * silent-vs-loud cross-engine divergence, exactly the class this
    * library polices — so the bound is now ENFORCED: max|c| rides the
    * same agg for free and a violated bound raises loudly instead of
    * shipping plausible nulls. (The scale escape, if a corpus ever needs
    * it, is pre-centering the moments about a first-pass approximate
    * mean, which collapses the magnitudes; not shipped — no fixture or
    * realistic sensor range comes within 20 decades of the bound.) */
  def statJarqueBera(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull)
      .select(col("event_type"), centsDec(col("value")).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(abs(col("c"))).as("maxc"),
        d2(sum(col("c"))).as("s1"),
        d2(sum(col("c") * col("c"))).as("s2"),
        d2(sum(col("c") * col("c") * col("c"))).as("s3"),
        d2(sum(col("c") * col("c") * col("c") * col("c"))).as("s4"))
      // overflow guard: fires BEFORE any downstream math can consume a
      // silently-nulled sum (conservative double comparison — one decade
      // of margin below the 38-digit capacity)
      .withColumn("s4", when(
        pow(col("maxc").cast("double"), lit(4.0)) * col("n") >= lit(1e37),
        raise_error(format_string(
          "stat_jarque_bera: 4th-moment DECIMAL(38,0) sum would overflow " +
            "(n=%s, max|cents|=%s); pre-center the moments before testing " +
            "values of this magnitude", col("n"), col("maxc"))).cast("double")
      ).otherwise(col("s4")))
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("m2", col("s2") / col("n") - col("mean") * col("mean"))
      .withColumn("m3", col("s3") / col("n") -
        lit(3.0) * col("mean") * (col("s2") / col("n")) +
        lit(2.0) * col("mean") * col("mean") * col("mean"))
      .withColumn("m4", col("s4") / col("n") -
        lit(4.0) * col("mean") * (col("s3") / col("n")) +
        lit(6.0) * col("mean") * col("mean") * (col("s2") / col("n")) -
        lit(3.0) * col("mean") * col("mean") * col("mean") * col("mean"))
      .withColumn("skewness", when(col("m2") > 0,
        col("m3") / (col("m2") * sqrt(col("m2")))))
      .withColumn("kurtosis_excess", when(col("m2") > 0,
        col("m4") / (col("m2") * col("m2")) - lit(3.0)))
      .select(col("event_type"), col("n"), col("skewness"),
        col("kurtosis_excess"),
        when(col("m2") > 0,
          (col("skewness") * col("skewness") / lit(6.0) +
            col("kurtosis_excess") * col("kurtosis_excess") / lit(24.0)) *
            col("n")).as("jb_stat"))
      .orderBy("event_type")

  /** Grubbs single-outlier test per event class: G = max|x − x̄| / s, WITH
    * the offending row identified (`window_hampel` despikes; this names
    * the one reading to go look at). The max deviation is a SELECTION
    * over deterministic doubles (exact under any merge order); the
    * argmax row is pinned by the (dev DESC, event_id ASC) total order.
    * One class-key agg broadcast back + one class-key window. */
  def statGrubbs(events: DataFrame): DataFrame = {
    val sample = events.filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), col("value"),
        centsDec(col("value")).as("c"))
    val stats = sample.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        d2(sum(col("c"))).as("sd"),
        d2(sum(col("c") * col("c"))).as("s2d"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("mean", col("sd") / col("nd"))
      .withColumn("vars", when(col("n") >= 3,
        (col("s2d") - col("sd") * col("sd") / col("nd")) / (col("nd") - lit(1.0))))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("dev").desc, col("event_id"))
    sample.join(broadcast(stats), "event_type")
      .withColumn("dev", abs(col("c").cast("double") - col("mean")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n"),
        (col("mean") / lit(100.0)).as("mean_value"),
        when(col("vars") > 0, sqrt(col("vars")) / lit(100.0)).as("stddev"),
        col("event_id").as("outlier_event_id"),
        col("value").as("outlier_value"),
        when(col("vars") > 0, col("dev") / sqrt(col("vars"))).as("g_stat"))
      .orderBy("event_type")
  }

  /** Cohen's d between the click and purchase value distributions —
    * the effect-size companion to `stat_welch_t` (a significant t on
    * 10⁹ rows can be a meaningless 0.001σ shift; d says HOW big).
    * Pooled-variance form from the two classes' integer power sums:
    * d = (x̄₁ − x̄₂) / s_p, s_p² = (SS₁ + SS₂)/(n₁ + n₂ − 2). One
    * conditional-sum hash agg; 1-row output. */
  def statCohensD(events: DataFrame,
                  typeA: String = "click", typeB: String = "purchase"): DataFrame =
    events.filter(col("value").isNotNull &&
        col("event_type").isin(typeA, typeB))
      .select(col("event_type"), centsDec(col("value")).as("c"))
      .agg(
        sum(when(col("event_type") === typeA, 1L).otherwise(0L)).as("n_a"),
        d2(sum(when(col("event_type") === typeA, col("c")))).as("sa"),
        d2(sum(when(col("event_type") === typeA, col("c") * col("c")))).as("s2a"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L)).as("n_b"),
        d2(sum(when(col("event_type") === typeB, col("c")))).as("sb"),
        d2(sum(when(col("event_type") === typeB, col("c") * col("c")))).as("s2b"))
      .withColumn("nad", col("n_a").cast("double"))
      .withColumn("nbd", col("n_b").cast("double"))
      .withColumn("ma", col("sa") / col("nad"))
      .withColumn("mb", col("sb") / col("nbd"))
      .withColumn("sp2", when(col("n_a") >= 2 && col("n_b") >= 2,
        ((col("s2a") - col("sa") * col("sa") / col("nad")) +
          (col("s2b") - col("sb") * col("sb") / col("nbd"))) /
          (col("nad") + col("nbd") - lit(2.0))))
      .select(col("n_a").as("n_click"), col("n_b").as("n_purchase"),
        (col("ma") / lit(100.0)).as("mean_click"),
        (col("mb") / lit(100.0)).as("mean_purchase"),
        when(col("sp2") > 0, sqrt(col("sp2")) / lit(100.0)).as("pooled_sd"),
        when(col("sp2") > 0,
          (col("ma") - col("mb")) / sqrt(col("sp2"))).as("cohens_d"))

  /** r9: Hartley's F_max variance-homogeneity screen across ALL event
    * classes — the quick-read gate in front of [[Aggs.statAnovaF]]
    * (ANOVA assumes equal variances; Brown–Forsythe TESTS it via
    * median deviations; F_max is the one-number triage a dashboard
    * shows: the largest class variance over the smallest, with the two
    * offending classes NAMED so the follow-up is already scoped). Rule
    * of thumb: F_max ≳ 3 on balanced classes ⇒ don't trust pooled-
    * variance statistics; reach for Welch / the rank family.
    *
    * EXACTNESS: per-class variance rides the [[statCohensD]] spelling —
    * integer cents power sums in DECIMAL(38,0), base-2^53 split to
    * double, one fixed (s2 − s·s/n)/(n−1) chain — so each variance is a
    * deterministic double; the max/min classes are then SELECTED (a
    * struct max/min with the class name as tiebreaker — selection, not
    * arithmetic) and F_max is one final divide. Classes with n < 2 or
    * zero variance are excluded from the ratio (named-count column keeps
    * the exclusion visible). One hash agg to the 5-row class frame, one
    * 1-row reduce. */
  def statHartleyFmax(events: DataFrame): DataFrame = {
    val perClass = events.filter(col("value").isNotNull)
      .select(col("event_type"), centsDec(col("value")).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("k"),
        d2(sum(col("c"))).as("s"),
        d2(sum(col("c") * col("c"))).as("s2"))
      .withColumn("kd", col("k").cast("double"))
      .withColumn("v", when(col("k") >= 2,
        (col("s2") - col("s") * col("s") / col("kd")) /
          (col("kd") - lit(1.0))))
    perClass.filter(col("v") > 0)
      .agg(count(lit(1)).as("n_classes"),
        max(struct(col("v"), col("event_type"))).as("mx"),
        min(struct(col("v"), col("event_type"))).as("mn"))
      .select(col("n_classes"),
        col("mx.event_type").as("class_max"),
        (col("mx.v") / lit(10000.0)).as("var_max"),
        col("mn.event_type").as("class_min"),
        (col("mn.v") / lit(10000.0)).as("var_min"),
        (col("mx.v") / col("mn.v")).as("fmax"))
  }

  /** r9: generalized ESD (Rosner) outlier screen, k = 3 rounds per event
    * class — the MASKING-proof upgrade of [[statGrubbs]]: Grubbs tests
    * the single most extreme point, and two outliers sitting together
    * hide each other (each inflates the sd that judges the other); GESD
    * removes the most deviant point and RE-STUDENTIZES before judging
    * the next, so a cluster of outliers is peeled one per round. The
    * deliverable is the decision table (round, named value, R_i) — the
    * λ_i critical values need t-quantiles (off the exactness recipe, the
    * `ts_rescaled_range` precedent) and live client-side.
    *
    * EXACTNESS: each round is exact integer bookkeeping — deviations
    * compared as |n·c − S1| (the ×n clears the mean divide, DECIMAL(38,0)),
    * the removed point is a SELECTION (max deviation, ties to the
    * smaller value), and the next round's moments are the previous sums
    * MINUS the removed value (n−1, S1−c*, S2−c*²) — no recomputation, no
    * drift. SCALE (r13 OPT, guide §2.4/§5): the r12 spelling unrolled the
    * k rounds as chained joins over the contingency cells — a 143 KB plan
    * costing 5.74 s at sf0.1 on vocab-bounded frames. The key fact: for
    * fixed (n, S1), |n·c − S1| is convex in c, so the removed point is
    * ALWAYS an endpoint of the remaining distinct values — k rounds only
    * ever touch the k smallest ∪ k largest distinct cells per class. One
    * window pass therefore suffices: rank the cells from both ends, keep
    * rank ≤ k plus the per-class exact moments (window sums over the same
    * partition), collect that ≤2k-cells-per-class frame (class vocabulary
    * is bounded at any data scale — the ≤nCells-centroid precedent), and
    * peel the k rounds on the driver with BigInt (reproduces the
    * DECIMAL(38,0) sums bit for bit) + the same decToDouble/IEEE double
    * chain. The fact table is scanned exactly once; oracle re-verified
    * sf0.001/0.01/0.1. */
  def statGesdOutliers(events: DataFrame, k: Int = 3): DataFrame = {
    val spark = events.sparkSession
    val cells = events.filter(col("value").isNotNull)
      .select(col("event_type"),
        centsDec(col("value")).cast("long").as("c"))
      .groupBy(col("event_type"), col("c")).agg(count(lit(1)).as("mv"))
    val w = Window.partitionBy(col("event_type"))
    val extremes = cells
      .withColumn("n", sum(col("mv")).over(w))
      .withColumn("s1", sum(col("c").cast(dec) * col("mv")).over(w))
      .withColumn("s2", sum((col("c") * col("c")).cast(dec) * col("mv")).over(w))
      .withColumn("rna", row_number().over(w.orderBy(col("c"))))
      .withColumn("rnd", row_number().over(w.orderBy(col("c").desc)))
      .filter(col("rna") <= k || col("rnd") <= k)
      .select(col("event_type"), col("c"), col("mv"),
        col("n"), col("s1"), col("s2"))
      .collect()
    val d2l = graft.Det.decToDoubleLocal _
    case class R(cls: String, round: Long, n: Long, out: Double,
                 rstat: java.lang.Double)
    val out = scala.collection.mutable.ArrayBuffer.empty[R]
    extremes.groupBy(_.getString(0)).foreach { case (cls, rows) =>
      var cand = rows.map(r => (r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toBuffer
      var n = BigInt(rows.head.getLong(3))
      var s1 = BigInt(rows.head.getDecimal(4).toBigInteger)
      var s2 = BigInt(rows.head.getDecimal(5).toBigInteger)
      var i = 1
      while (i <= k && cand.nonEmpty) {
        // argmax |c·n − S1| over remaining cells = one of the two current
        // endpoints; ties to the smaller value (the struct-max contract)
        val lo = cand.head._1; val hi = cand.last._1
        val devLo = (BigInt(lo) * n - s1).abs
        val devHi = (BigInt(hi) * n - s1).abs
        val (cstar, adev) =
          if (devLo > devHi || (devLo == devHi && lo <= hi)) (lo, devLo)
          else (hi, devHi)
        if (n >= 3) {
          val nd = n.toLong.toDouble
          val madev = d2l(adev) / nd
          val sd2 = (d2l(s2) - d2l(s1) * d2l(s1) / nd) / (nd - 1.0)
          val rstat: java.lang.Double =
            if (sd2 > 0) madev / math.sqrt(sd2) else null
          out += R(cls, i.toLong, n.toLong, cstar.toDouble / 100.0, rstat)
        }
        if (i < k) {
          val idx = cand.indexWhere(_._1 == cstar)
          val (c0, mv0) = cand(idx)
          if (mv0 > 1) cand(idx) = (c0, mv0 - 1) else cand.remove(idx)
          n -= 1; s1 -= cstar; s2 -= BigInt(cstar) * cstar
        }
        i += 1
      }
    }
    val sorted = out.sortWith { (p, q) =>
      if (p.cls != q.cls) graft.Det.utf8NullsFirstLt(p.cls, q.cls)
      else p.round < q.round
    }
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("event_type", StringType, nullable = true),
      StructField("round_no", LongType, nullable = false),
      StructField("n_used", LongType, nullable = true),
      StructField("outlier_value", DoubleType, nullable = true),
      StructField("r_stat", DoubleType, nullable = true)))
    spark.createDataFrame(
      sorted.map(r => org.apache.spark.sql.Row(
        r.cls, r.round, r.n, r.out, r.rstat)).asJava,
      schema).orderBy("event_type", "round_no")
  }

  /** Paired sign test on the hourly (click, purchase) count series — the
    * assumption-free "is one feed systematically ahead of the other"
    * check under `stat_corr_hourly`'s frame: count hours where clicks
    * exceed purchases vs the reverse (ties dropped, the standard
    * convention); z = (pos − neg)/√(pos + neg). Pure integer counts +
    * one fixed chain; 1-row output. */
  def statSignTest(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .agg(count(lit(1)).as("n_hours"),
        sum(when(col("x") > col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("x") < col("y"), 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("x") === col("y"), 1L).otherwise(0L)).as("n_tie"))
      .select(col("n_hours"), col("n_pos"), col("n_neg"), col("n_tie"),
        when(col("n_pos") + col("n_neg") > 0,
          (col("n_pos").cast("double") - col("n_neg").cast("double")) /
            sqrt(col("n_pos").cast("double") + col("n_neg").cast("double")))
          .as("z_stat"))

  /** Kendall τ-b between the hourly click and purchase series — the
    * third rank-correlation face next to Pearson (`stat_corr_hourly`)
    * and Spearman (`stat_spearman_hourly`): concordant-vs-discordant
    * PAIR counting, the most outlier-robust of the three and the one
    * with a clean tie correction (τ-b). All counts integer; τ finishes
    * in one fixed two-sqrt chain.
    *
    * Scale posture: the pair join is hour-pairs over the HOURLY frame —
    * time-bounded, not data-scaled (the documented allowed class; same
    * argument as `stat_chi_square`'s dense-grid cross). The broadcast
    * inequality join is O(H²) in hours, independent of event volume;
    * for decade-scale hourly history [[statKendallTauMerge]] is the
    * shipped O(H log H) escape (r9, verdict #6) — identical output,
    * proven equal by `KendallMergeSpec` AND by sharing this query's
    * DuckDB oracle as the declared twin `stat_kendall_tau_merge`.
    * Threshold guidance: the pair join materializes H²/2 candidate rows
    * — fine to H ≈ 10⁴ hours (~14 months; 5·10⁷ pairs), past that call
    * the merge form (a century of hours is 8.8·10⁵ rows ⇒ 3.8·10¹¹
    * pairs for the join vs ~2·10⁷ comparisons for the merge). */
  def statKendallTau(events: DataFrame): DataFrame = {
    val hourly = kendallHourly(events)
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
      .select(col("n_hours"), col("n0").as("n_pairs"),
        col("n_concordant"), col("n_discordant"),
        col("ties_x"), col("ties_y"),
        when(col("n0") > col("ties_x") && col("n0") > col("ties_y"),
          (col("n_concordant").cast("double") - col("n_discordant").cast("double")) /
            (sqrt(col("n0").cast("double") - col("ties_x").cast("double")) *
              sqrt(col("n0").cast("double") - col("ties_y").cast("double"))))
          .as("tau_b"))
  }

  /** The shared hourly (x, y) series both Kendall forms consume. */
  private def kendallHourly(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))

  /** Mergesort counting STRICT inversions (y_i > y_j for i < j) in one
    * block; returns (inversions, ascending-sorted copy). O(m log m). */
  private[graft] def mergeCountInv(ys: Array[Long]): (Long, Array[Long]) = {
    if (ys.length < 2) return (0L, ys.clone())
    var inv = 0L
    var src = ys.clone(); var dst = new Array[Long](ys.length)
    var width = 1
    while (width < src.length) {
      var lo = 0
      while (lo < src.length) {
        val mid = math.min(lo + width, src.length)
        val hi = math.min(lo + 2 * width, src.length)
        var i = lo; var j = mid; var k = lo
        while (i < mid && j < hi) {
          if (src(i) <= src(j)) { dst(k) = src(i); i += 1 }
          else { dst(k) = src(j); j += 1; inv += (mid - i).toLong }
          k += 1
        }
        while (i < mid) { dst(k) = src(i); i += 1; k += 1 }
        while (j < hi) { dst(k) = src(j); j += 1; k += 1 }
        lo = hi
      }
      val t = src; src = dst; dst = t
      width *= 2
    }
    (inv, src)
  }

  private def mergeSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      if (a(i) <= b(j)) { out(k) = a(i); i += 1 } else { out(k) = b(j); j += 1 }
      k += 1
    }
    while (i < a.length) { out(k) = a(i); i += 1; k += 1 }
    while (j < b.length) { out(k) = b(j); j += 1; k += 1 }
    out
  }

  /** r9 (verdict #6): Kendall τ-b by MERGE-BASED INVERSION COUNTING —
    * the decade-scale escape [[statKendallTau]] documents, shipped.
    * Knight's O(H log H) algorithm, distributed:
    *
    * After sorting the hourly series by (x asc, y asc), a pair {i, j}
    * with strictly different x is DISCORDANT iff the y sequence has a
    * strict inversion at it — and pairs with equal x can never invert
    * (the y tie-break sorts them ascending), so the total strict
    * inversion count of the y sequence IS n_discordant. Tie pairs come
    * from three tiny per-key aggs (Σ t(t−1)/2 over x, y, and (x, y)
    * groups), and n_concordant = n0 − ties_x − ties_y + ties_xy − n_d
    * (every pair is exactly one of: concordant, discordant, x-tie-only,
    * y-tie-only, both-tie). τ-b then finishes in the pair-join form's
    * identical double chain, so equal integers ⇒ bit-equal output.
    *
    * Plan: phase 1 range-exchanges the H-row hourly frame on (x, y)
    * (`repartitionByRange` + in-partition sort — the `graft.Dist`
    * two-phase-scan shape) and counts each block's internal inversions
    * in parallel (mapPartitions, the documented sequential-kernel
    * class); phase 2 is ONE bounded task over the ≤ nRanges block
    * summaries: blocks concatenate in range order into the full sorted
    * sequence, so cross-block inversions fall out of a cumulative
    * two-pointer merge over the pre-sorted block arrays (O(H·nRanges)
    * comparisons, ~2·10⁷ even for a century of hours). Nothing is ever
    * O(H²); no driver-side data. Output schema identical to
    * [[statKendallTau]] — same oracle SQL, hash-match. */
  def statKendallTauMerge(events: DataFrame, nRanges: Int = 32): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourly = kendallHourly(events)

    def tiePairs(keys: Seq[String], name: String): DataFrame =
      hourly.groupBy(keys.map(col): _*).agg(count(lit(1)).as("t"))
        .agg(coalesce(sum(call_function("div",
          col("t") * (col("t") - 1), lit(2L))), lit(0L)).as(name))

    val nRow = hourly.agg(count(lit(1)).as("n_hours"))

    // phase 1: per-range local inversion counts + sorted y blocks
    val blocks = hourly.select(col("x"), col("y"))
      .repartitionByRange(nRanges, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val ys = it.map(_.getLong(1)).toArray
        val (inv, sorted) = mergeCountInv(ys)
        Iterator.single((pid, inv, sorted))
      }

    // phase 2: one bounded task folds blocks in range order
    val invRow = blocks.repartition(1).sortWithinPartitions(col("_1"))
      .mapPartitions { it =>
        var total = 0L
        var acc = Array.emptyLongArray
        it.foreach { case (_, localInv, ys) =>
          total += localInv
          var ai = 0; var bi = 0
          while (bi < ys.length) { // both ascending: ai only moves forward
            while (ai < acc.length && acc(ai) <= ys(bi)) ai += 1
            total += (acc.length - ai).toLong
            bi += 1
          }
          acc = mergeSorted(acc, ys)
        }
        Iterator.single(total)
      }.toDF("n_discordant")

    nRow.crossJoin(invRow)
      .crossJoin(tiePairs(Seq("x"), "ties_x"))
      .crossJoin(tiePairs(Seq("y"), "ties_y"))
      .crossJoin(tiePairs(Seq("x", "y"), "ties_xy"))
      .withColumn("n0",
        call_function("div", col("n_hours") * (col("n_hours") - 1), lit(2L)))
      .withColumn("n_concordant",
        col("n0") - col("ties_x") - col("ties_y") + col("ties_xy") - col("n_discordant"))
      .select(col("n_hours"), col("n0").as("n_pairs"),
        col("n_concordant"), col("n_discordant"),
        col("ties_x"), col("ties_y"),
        when(col("n0") > col("ties_x") && col("n0") > col("ties_y"),
          (col("n_concordant").cast("double") - col("n_discordant").cast("double")) /
            (sqrt(col("n0").cast("double") - col("ties_x").cast("double")) *
              sqrt(col("n0").cast("double") - col("ties_y").cast("double"))))
          .as("tau_b"))
  }

  /** Ljung–Box portmanteau test per event class: is the hourly count
    * series white noise at all? Q = n(n+2)·Σ_{k≤m} r_k²/(n−k) over the
    * DENSIFIED series (gaps are real zero-traffic hours — skipping them,
    * as `stat_autocorr_lag` documents it does, biases a whiteness test).
    * The grid is never materialized: on a zero-filled series every
    * autocovariance term involving a gap hour vanishes, so
    * Σ x_t·x_{t+k} is an equi-join of OBSERVED rows on the shifted hour
    * key, and the edge corrections (Σ over the first/last k grid slots)
    * are conditional sums against the per-class [mn, mx] bounds —
    * algebraic densification, all integer. r_k = (P_k − x̄(2S−T_k−H_k) +
    * (n−k)x̄²) / (S₂ − x̄S); the m per-class r² terms re-accumulate in
    * pico-unit DECIMAL(38,0) (the `stat_kruskal_wallis` pattern) so lag
    * order cannot matter. Plan: one (class, hour) agg, one 6× fan-out
    * equi-join on the tiny hourly frame, two class-key aggs. */
  def statLjungBox(events: DataFrame, m: Int = 6): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hu"))
      .agg(count(lit(1)).as("c"))
    val bounds = hourly.groupBy(col("event_type"))
      .agg(min(col("hu")).as("mn"), max(col("hu")).as("mx"),
        sum(col("c").cast(dec)).as("ss"),
        sum(col("c").cast(dec) * col("c")).as("ss2"))
    val lagArr = array((1 to m).map(l => lit(l.toLong)): _*)
    val pk = hourly
      .select(col("event_type"), col("hu"), col("c"), explode(lagArr).as("lag"))
      .withColumn("hu2", col("hu") + col("lag"))
      .join(hourly.select(col("event_type"), col("hu").as("hu2"),
        col("c").as("y")), Seq("event_type", "hu2"))
      .groupBy(col("event_type"), col("lag"))
      .agg(sum(col("c").cast(dec) * col("y")).as("sp"))
    val ht = hourly.join(broadcast(bounds.select("event_type", "mn", "mx")),
        "event_type")
      .select(col("event_type"), col("hu"), col("c"), col("mn"), col("mx"),
        explode(lagArr).as("lag"))
      .groupBy(col("event_type"), col("lag"))
      .agg(
        sum(when(col("hu") > col("mx") - col("lag"), col("c")).otherwise(0L)
          .cast(dec)).as("st"),
        sum(when(col("hu") < col("mn") + col("lag"), col("c")).otherwise(0L)
          .cast(dec)).as("sh"))
    val terms = ht
      .join(pk, Seq("event_type", "lag"), "left")
      .join(broadcast(bounds), "event_type")
      .withColumn("n", col("mx") - col("mn") + 1)
      .withColumn("nd", col("n").cast("double"))
      .withColumn("kd", col("lag").cast("double"))
      .withColumn("pd", d2(coalesce(col("sp"), lit(0L).cast(dec))))
      .withColumn("td", d2(col("st")))
      .withColumn("hd", d2(col("sh")))
      .withColumn("sd", d2(col("ss")))
      .withColumn("s2d", d2(col("ss2")))
      .withColumn("mean", col("sd") / col("nd"))
      .withColumn("den", col("s2d") - col("mean") * col("sd"))
      .withColumn("num", col("pd") -
        col("mean") * ((col("sd") - col("td")) + (col("sd") - col("hd"))) +
        (col("nd") - col("kd")) * col("mean") * col("mean"))
      .withColumn("rk",
        when(col("den") > 0 && col("n") > col("lag"), col("num") / col("den")))
      .withColumn("termq",
        floor(col("rk") * col("rk") / (col("nd") - col("kd")) *
          lit(1000000000000.0) + lit(0.5)).cast(dec))
    terms.groupBy(col("event_type"))
      .agg(max(col("n")).as("n_hours"), count(col("termq")).as("m_used"),
        d2(sum(col("termq"))).as("tsum"),
        max(when(col("lag") === 1L, col("rk"))).as("r1"))
      .select(col("event_type"), col("n_hours"), lit(m.toLong).as("m_lags"),
        col("r1"),
        when(col("m_used") === m,
          col("n_hours").cast("double") *
            (col("n_hours").cast("double") + lit(2.0)) *
            (col("tsum") / lit(1000000000000.0))).as("q_stat"))
      .orderBy("event_type")
  }

  /** r9: Dickey–Fuller unit-root screen per event class — the
    * stationarity gate for the trend/forecast tier: [[Aggs.statMannKendall]]
    * asks "is there a monotone trend", [[statLjungBox]] asks "is it white
    * noise"; DF asks the question between them — "does the level mean-revert
    * at all, or is this a random walk" (forecasting a unit-root series with
    * [[Aggs.statHoltForecast]] extrapolates noise). The regression form with
    * drift: Δy_t = a + φ·y_{t−1} + ε over CONSECUTIVE observed hours (a gap
    * breaks the pair — Δ across a gap is not a one-step difference; same
    * observed-series contract as `stat_autocorr_lag`, documented there), and
    * DF = φ/se(φ), tested against the −2.86 asymptotic 5% critical value
    * (the constant-only table). φ ≈ 0 ⇒ random walk; φ « 0 ⇒ mean-reverting.
    *
    * Exactness: pairs are integer (y_{t−1}, Δy); the five power sums
    * accumulate in DECIMAL(38,0) (order-free), cross to double via the
    * base-2^53 split, and the OLS t chain is one fixed IEEE sequence
    * mirrored verbatim in the oracle — n·SSE is computed as
    * n·syy − sy² − φ·(n·sxy − sx·sy) so no intermediate ever divides by n
    * before the final ratio. Plan: one (class, hour) hash agg collapses the
    * scan, one self-equi-join on the +1 hour key (hour-frame-sized, never
    * events-sized), one class-key agg; 5-row output. */
  def statDickeyFuller(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000 - 473352").as("hu"))
      .agg(count(lit(1)).as("y"))
    val pairs = hourly.as("p")
      .join(hourly.as("c"),
        col("p.event_type") === col("c.event_type") &&
          col("c.hu") === col("p.hu") + 1)
      .select(col("p.event_type").as("event_type"), col("p.y").as("yl"),
        (col("c.y") - col("p.y")).as("dy"))
    val sums = pairs.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_pairs"),
      d2(sum(col("yl").cast(dec))).as("sx"),
      d2(sum(col("dy").cast(dec))).as("sy"),
      d2(sum((col("yl") * col("dy")).cast(dec))).as("sxy"),
      d2(sum((col("yl") * col("yl")).cast(dec))).as("sxx"),
      d2(sum((col("dy") * col("dy")).cast(dec))).as("syy"))
    val nd = col("n_pairs").cast("double")
    val det = nd * col("sxx") - col("sx") * col("sx")
    val nb = nd * col("sxy") - col("sx") * col("sy")
    val phi = nb / det
    val sseN = nd * col("syy") - col("sy") * col("sy") - phi * nb
    sums
      .withColumn("phi", when(det > 0, phi))
      .withColumn("df_stat",
        when(det > 0 && col("n_pairs") > 2 && sseN > 0,
          col("phi") / sqrt(sseN / ((nd - lit(2.0)) * det))))
      .select(col("event_type"), col("n_pairs"), col("phi"), col("df_stat"),
        when(col("df_stat").isNotNull,
          when(col("df_stat") < lit(-2.86), 1L).otherwise(0L))
          .as("stationary_5pct"))
      .orderBy("event_type")
  }

  /** r9: Durbin–Watson autocorrelation-of-residuals diagnostic per event
    * class — the validity check ON [[Aggs.statRegressionHourly]]'s own fit:
    * DW = Σ(e_t − e_{t−1})²/Σe_t² ≈ 2 means the linear-trend residuals are
    * independent (the fit's standard errors are trustworthy); DW → 0 means
    * positive serial correlation (the series drifts around the line and the
    * regression is over-confident — reach for [[statDickeyFuller]]).
    *
    * Exactness — the INTEGER-RESIDUAL trick: the OLS solution over integer
    * (x, y) has rational coefficients with the common denominator
    * D = n·sxx − sx², so D·e_t = D·y_t − Na − Nb·x_t (Na = sy·sxx − sx·sxy,
    * Nb = n·sxy − sx·sy) is an exact DECIMAL(38,0) integer — both DW sums
    * run over integers (D² cancels in the ratio) and the single final
    * divide is engine-exact. Magnitude bound (the Jarque–Bera class,
    * documented not enforced: D ~ n²·x̄², so (D·e)² stays inside 38 digits
    * while n·max(y)·x_span < ~10¹⁷ — decades of headroom for hourly
    * counts). Numerator pairs are CONSECUTIVE observed hours (gap breaks
    * the pair), denominator is all observed hours — the standard treatment,
    * same contract as [[statDickeyFuller]]. Plan: one (class, hour) agg,
    * one 5-row broadcast of the sums, one +1-hour self-equi-join on the
    * hour frame, two class-key aggs. */
  def statDurbinWatson(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000 - 473352").as("x"))
      .agg(count(lit(1)).as("y"))
    val sums = hourly.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_hours"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("y").cast(dec)).as("sy"),
      sum((col("x") * col("y")).cast(dec)).as("sxy"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"))
    val withRes = hourly.join(broadcast(sums), "event_type")
      .withColumn("det",
        col("n_hours").cast(dec) * col("sxx") - col("sx") * col("sx"))
      .filter(col("det") > 0 && col("n_hours") > 2)
      .withColumn("de",
        col("det") * col("y").cast(dec) -
          (col("sy") * col("sxx") - col("sx") * col("sxy")) -
          (col("n_hours").cast(dec) * col("sxy") - col("sx") * col("sy")) * col("x").cast(dec))
    val den = withRes.groupBy(col("event_type")).agg(
      max(col("n_hours")).as("n_hours"),
      sum(col("de") * col("de")).as("den"))
    val num = withRes.as("p")
      .join(withRes.as("c"),
        col("p.event_type") === col("c.event_type") &&
          col("c.x") === col("p.x") + 1)
      .select(col("p.event_type").as("event_type"),
        (col("c.de") - col("p.de")).as("dd"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("dd") * col("dd")).as("num"))
    den.join(num, Seq("event_type"), "left")
      .select(col("event_type"), col("n_hours"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        when(d2(col("den")) > 0, d2(coalesce(col("num"), lit(0).cast(dec))) / d2(col("den")))
          .as("dw"))
      .orderBy("event_type")
  }

  /** r9: Engle–Granger cointegration screen between the hourly click and
    * purchase series — the long-run counterpart of [[statGranger]]: two
    * individually drifting series can still be chained to a COMMON
    * stochastic trend (demand), and a pipeline that models their ratio is
    * only sound if they are. Step 1 regresses y on x (with intercept);
    * step 2 runs the [[statDickeyFuller]] regression on the residuals —
    * residuals that mean-revert ⇒ cointegrated. Tested against the
    * Engle–Granger 2-variable 5% asymptotic critical value −3.34 (more
    * negative than plain DF's −2.86 because the residuals come from a
    * fitted line).
    *
    * Exactness — the two tricks COMPOSE: [[statDurbinWatson]]'s
    * integer-residual scaling (D·e_t = D·y_t − Na − Nb·x_t, one exact
    * DECIMAL(38,0) integer per hour) feeds [[statDickeyFuller]]'s ADF
    * chain unchanged, because the DF statistic is scale-invariant — the
    * common denominator D multiplies both the regressand and regressor of
    * the residual regression, so φ and its t are IDENTICAL on D·e and e,
    * with no divide until the final chain. β itself divides the exact
    * integers Nb/D once at the edge. Magnitude bound (documented, the
    * Jarque–Bera class): the residual power sums square D·e, so the chain
    * holds while n·(D·max|e|)² < 10³⁸ — hourly-count magnitudes clear it
    * by ~10 decades. Plan: one hourly agg, one 1-row sums broadcast, one
    * +1-hour self-join on the residual frame, one 5-sum agg; 1-row
    * output. */
  def statCointegration(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(expr("unix_micros(date_trunc('hour', ts)) div 3600000000 - 473352").as("hu"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    val sums = hourly.agg(
      count(lit(1)).as("n_hours"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("y").cast(dec)).as("sy"),
      sum((col("x") * col("y")).cast(dec)).as("sxy"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"))
    val res = hourly.crossJoin(broadcast(sums))
      .withColumn("det",
        col("n_hours").cast(dec) * col("sxx") - col("sx") * col("sx"))
      .filter(col("det") > 0 && col("n_hours") > 3)
      .withColumn("de",
        col("det") * col("y").cast(dec) -
          (col("sy") * col("sxx") - col("sx") * col("sxy")) -
          (col("n_hours").cast(dec) * col("sxy") - col("sx") * col("sy")) * col("x").cast(dec))
    val pairs = res.as("p")
      .join(res.as("c"), col("c.hu") === col("p.hu") + 1)
      .select(col("p.n_hours").as("n_hours"),
        col("p.det").as("det0"),
        (col("p.n_hours").cast(dec) * col("p.sxy") - col("p.sx") * col("p.sy")).as("nb0"),
        col("p.de").as("el"), (col("c.de") - col("p.de")).as("dd"))
    val s = pairs.groupBy(col("n_hours"), col("det0"), col("nb0")).agg(
      count(lit(1)).as("n_pairs"),
      d2(sum(col("el"))).as("sl"),
      d2(sum(col("dd"))).as("sd"),
      d2(sum(col("el") * col("dd"))).as("sld"),
      d2(sum(col("el") * col("el"))).as("sll"),
      d2(sum(col("dd") * col("dd"))).as("sdd"))
    val nd = col("n_pairs").cast("double")
    val det = nd * col("sll") - col("sl") * col("sl")
    val nb = nd * col("sld") - col("sl") * col("sd")
    val phi = nb / det
    val sseN = nd * col("sdd") - col("sd") * col("sd") - phi * nb
    s
      .withColumn("beta", d2(col("nb0")) / d2(col("det0")))
      .withColumn("phi", when(det > 0, phi))
      .withColumn("adf_stat",
        when(det > 0 && col("n_pairs") > 2 && sseN > 0,
          col("phi") / sqrt(sseN / ((nd - lit(2.0)) * det))))
      .select(col("n_hours"), col("n_pairs"), col("beta"), col("phi"),
        col("adf_stat"),
        when(col("adf_stat").isNotNull,
          when(col("adf_stat") < lit(-3.34), 1L).otherwise(0L))
          .as("cointegrated_5pct"))
  }

  /** r9: Granger causality (lag 1, both directions) between the hourly
    * click and purchase series — the step past correlation the whole
    * co-movement tier ([[Aggs.statCorrHourly]], `stat_spearman_hourly`,
    * [[statKendallTau]]) stops short of: does knowing LAST hour's clicks
    * improve the prediction of THIS hour's purchases beyond purchases'
    * own history? F = (SSE_r − SSE_u)·(n−3)/SSE_u comparing the
    * restricted AR(1) fit against the unrestricted fit with the cross
    * lag added, tested against the F(1, ∞) 5% critical value 3.84;
    * both directions from ONE pass (feedback loops show up as both
    * flags set).
    *
    * Exactness: triples (this-hour, last-hour) come from one +1-hour
    * self-equi-join on the hourly frame (consecutive observed hours, the
    * [[statDickeyFuller]] contract); the 14 moment sums accumulate in
    * DECIMAL(38,0), cross via the 2^53 split, and both F statistics are
    * one fixed IEEE chain over n-scaled centered moments (Â = n·Σab −
    * Σa·Σb — no divide before the closed-form 2×2 solve, whose
    * determinant arithmetic is textually mirrored in the oracle). The
    * restricted-model denominators double as the guards: a constant
    * series or collinear lags null the statistic rather than 0/0. Plan:
    * one (hour) hash agg, one hour-frame self-join, one 14-sum agg;
    * 1-row output. */
  def statGranger(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hu"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    val tri = hourly.as("p")
      .join(hourly.as("c"), col("c.hu") === col("p.hu") + 1)
      .select(col("c.x").as("cx"), col("c.y").as("cy"),
        col("p.x").as("px"), col("p.y").as("py"))
    def s2(a: String, b: String) =
      d2(sum((col(a) * col(b)).cast(dec))).as(s"s_$a$b")
    val sums = tri.agg(
      count(lit(1)).as("n_pairs"),
      d2(sum(col("cx").cast(dec))).as("s_cx"),
      d2(sum(col("cy").cast(dec))).as("s_cy"),
      d2(sum(col("px").cast(dec))).as("s_px"),
      d2(sum(col("py").cast(dec))).as("s_py"),
      s2("cx", "cx"), s2("cy", "cy"), s2("px", "px"), s2("py", "py"),
      s2("cx", "px"), s2("cx", "py"), s2("cy", "px"), s2("cy", "py"),
      s2("px", "py"))
    val nd = col("n_pairs").cast("double")
    def a(sab: Column, sa: Column, sb: Column): Column = nd * sab - sa * sb
    // F for target t with own lag o and cross lag g (n-scaled centered
    // moments; the 2×2 normal-equation solve in closed form)
    def f(ayy: Column, ayl: Column, axl: Column,
          byl: Column, bxl: Column, bylxl: Column): Column = {
      val det = byl * bxl - bylxl * bylxl
      val b = (ayl * bxl - axl * bylxl) / det
      val c = (byl * axl - bylxl * ayl) / det
      val sseR = ayy - (ayl * ayl) / byl
      val sseU = ayy - b * ayl - c * axl
      when(byl > 0 && det > 0 && sseU > 0 && col("n_pairs") > 3,
        (sseR - sseU) * (nd - lit(3.0)) / sseU)
    }
    val bxx = a(col("s_pxpx"), col("s_px"), col("s_px"))
    val byy = a(col("s_pypy"), col("s_py"), col("s_py"))
    val bxy = a(col("s_pxpy"), col("s_px"), col("s_py"))
    sums
      .withColumn("f_x_to_y", f(
        a(col("s_cycy"), col("s_cy"), col("s_cy")),
        a(col("s_cypy"), col("s_cy"), col("s_py")),
        a(col("s_cypx"), col("s_cy"), col("s_px")),
        byy, bxx, bxy))
      .withColumn("f_y_to_x", f(
        a(col("s_cxcx"), col("s_cx"), col("s_cx")),
        a(col("s_cxpx"), col("s_cx"), col("s_px")),
        a(col("s_cxpy"), col("s_cx"), col("s_py")),
        bxx, byy, bxy))
      .select(col("n_pairs"), col("f_x_to_y"), col("f_y_to_x"),
        when(col("f_x_to_y").isNotNull,
          when(col("f_x_to_y") > lit(3.84), 1L).otherwise(0L))
          .as("x_causes_y_5pct"),
        when(col("f_y_to_x").isNotNull,
          when(col("f_y_to_x") > lit(3.84), 1L).otherwise(0L))
          .as("y_causes_x_5pct"))
  }

  /** r10b: the per-class hourly (x = re-centered hour index, y = count)
    * series with observed-sequence position rn and length nh — the shared
    * frame of the structural-break tier ([[statChowTest]],
    * [[statGoldfeldQuandt]], [[statKpss]]). */
  private def indexedHourly(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("x"))
    events
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000 - 473352").as("x"))
      .agg(count(lit(1)).as("y"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("nh",
        count(lit(1)).over(Window.partitionBy(col("event_type"))))
  }

  /** r10b: segment OLS sums for [[statChowTest]]/[[statGoldfeldQuandt]] —
    * exact DECIMAL(38,0) power sums per (class, segment), crossed to
    * double once. The SSE chain (n·syy − sy² − nb²/det)/n runs entirely
    * off these — no residual ever materializes. */
  private def segSums(seg: DataFrame): DataFrame =
    seg.groupBy(col("event_type"), col("seg")).agg(
      count(lit(1)).as("m"),
      d2(sum(col("x").cast(dec))).as("sx"),
      d2(sum(col("y").cast(dec))).as("sy"),
      d2(sum((col("x") * col("y")).cast(dec))).as("sxy"),
      d2(sum((col("x") * col("x")).cast(dec))).as("sxx"),
      d2(sum((col("y") * col("y")).cast(dec))).as("syy"))

  /** n·SSE of the OLS fit y = a + bx off one segment's moment sums —
    * the [[statDickeyFuller]] chain: no divide before the final ratio. */
  private def sseTimesN(m: Column, sx: Column, sy: Column, sxy: Column,
                        sxx: Column, syy: Column): Column = {
    val det = m * sxx - sx * sx
    val nb = m * sxy - sx * sy
    (m * syy - sy * sy - nb * nb / det) / m
  }

  /** Chow structural-break test per event class — [[statDickeyFuller]]
    * asks "does the level mean-revert"; Chow asks "did the TREND LINE
    * ITSELF change at the midpoint" (a deploy, a fleet change): fit
    * y = a + bx on the full hourly series and on each half (split at the
    * midpoint of the OBSERVED sequence, the `stat_cox_stuart` convention),
    * F = ((SSE_p − SSE_1 − SSE_2)/2) / ((SSE_1+SSE_2)/(n−4)), tested
    * against the F(2, ∞) 5% critical value 3.00.
    *
    * Exactness: per-segment integer power sums in DECIMAL(38,0) (pooled
    * sums are the segment sums' exact integer additions), one fixed IEEE
    * SSE chain per segment mirrored in the oracle. Plan: one (class,
    * hour) hash agg, one class-bounded row_number window, one (class,
    * seg) agg, one ≤2-row-per-class conditional rollup; k rows out. */
  def statChowTest(events: DataFrame): DataFrame = {
    val seg = indexedHourly(events)
      .withColumn("seg",
        when(col("rn") * 2 <= col("nh"), 1L).otherwise(2L))
    val perSeg = segSums(seg)
    def pick(c: String, s: Int) =
      max(when(col("seg") === s, col(c))).as(s"${c}$s")
    val wide = perSeg.groupBy(col("event_type")).agg(
      sum(col("m")).as("n_hours"),
      pick("m", 1), pick("sx", 1), pick("sy", 1), pick("sxy", 1),
      pick("sxx", 1), pick("syy", 1),
      pick("m", 2), pick("sx", 2), pick("sy", 2), pick("sxy", 2),
      pick("sxx", 2), pick("syy", 2))
    val m1 = col("m1").cast("double")
    val m2 = col("m2").cast("double")
    val mp = col("n_hours").cast("double")
    val sse1 = sseTimesN(m1, col("sx1"), col("sy1"), col("sxy1"), col("sxx1"), col("syy1"))
    val sse2 = sseTimesN(m2, col("sx2"), col("sy2"), col("sxy2"), col("sxx2"), col("syy2"))
    val sseP = sseTimesN(mp,
      col("sx1") + col("sx2"), col("sy1") + col("sy2"),
      col("sxy1") + col("sxy2"), col("sxx1") + col("sxx2"),
      col("syy1") + col("syy2"))
    val det1 = m1 * col("sxx1") - col("sx1") * col("sx1")
    val det2 = m2 * col("sxx2") - col("sx2") * col("sx2")
    wide
      .withColumn("f_stat",
        when(col("m1") >= 3 && col("m2") >= 3 && det1 > 0 && det2 > 0 &&
          sse1 + sse2 > 0,
          ((sseP - sse1 - sse2) / lit(2.0)) /
            ((sse1 + sse2) / (mp - lit(4.0)))))
      .select(col("event_type"), col("n_hours"),
        col("m1").cast("long").as("n_first"),
        col("m2").cast("long").as("n_second"),
        col("f_stat"),
        when(col("f_stat").isNotNull,
          when(col("f_stat") > lit(3.0), 1L).otherwise(0L)).as("break_5pct"))
      .orderBy("event_type")
  }

  /** Goldfeld–Quandt heteroskedasticity screen per event class — the
    * variance twin of [[statChowTest]]: same split machinery, but the
    * question is "did the NOISE level grow with time" (a fleet whose
    * late-period residual variance dwarfs the early period violates every
    * constant-variance assumption upstream). Standard middle-fifth
    * exclusion: low segment rn ≤ ⌊2n/5⌋, high segment rn > n − ⌊2n/5⌋;
    * F = (SSE_hi/df)/(SSE_lo/df) with df = m − 2 (equal m by
    * construction). Screening statistic, no critical value quoted (the
    * F(m−2, m−2) df depends on m; the `stat_hartley_fmax` convention).
    * Same exact-sums SSE chain as Chow; k rows out. */
  def statGoldfeldQuandt(events: DataFrame): DataFrame = {
    val keep = call_function("div", col("nh") * 2, lit(5L))
    val seg = indexedHourly(events)
      .withColumn("seg",
        when(col("rn") <= keep, 1L)
          .when(col("rn") > col("nh") - keep, 2L))
      .filter(col("seg").isNotNull)
    val perSeg = segSums(seg)
    def pick(c: String, s: Int) =
      max(when(col("seg") === s, col(c))).as(s"${c}$s")
    val wide = perSeg.groupBy(col("event_type")).agg(
      pick("m", 1), pick("sx", 1), pick("sy", 1), pick("sxy", 1),
      pick("sxx", 1), pick("syy", 1),
      pick("m", 2), pick("sx", 2), pick("sy", 2), pick("sxy", 2),
      pick("sxx", 2), pick("syy", 2))
    val m1 = col("m1").cast("double")
    val m2 = col("m2").cast("double")
    val sse1 = sseTimesN(m1, col("sx1"), col("sy1"), col("sxy1"), col("sxx1"), col("syy1"))
    val sse2 = sseTimesN(m2, col("sx2"), col("sy2"), col("sxy2"), col("sxx2"), col("syy2"))
    val det1 = m1 * col("sxx1") - col("sx1") * col("sx1")
    val det2 = m2 * col("sxx2") - col("sx2") * col("sx2")
    wide
      .select(col("event_type"),
        col("m1").cast("long").as("n_low"),
        col("m2").cast("long").as("n_high"),
        when(col("m1") >= 3 && col("m2") >= 3 && det1 > 0 && det2 > 0 &&
          sse1 > 0,
          (sse2 / (m2 - lit(2.0))) / (sse1 / (m1 - lit(2.0))))
          .as("gq_f"))
      .orderBy("event_type")
  }

  /** KPSS level-stationarity test per event class — [[statDickeyFuller]]'s
    * REVERSED-null twin (DF's null is a unit root, KPSS's null is
    * stationarity; a series rejecting BOTH is the genuinely ambiguous
    * case the pair exists to expose):
    *   η = Σ_t S_t² / (n² σ̂²_lrv),  S_t = Σ_{i≤t}(y_i − ȳ),
    * with the Bartlett long-run variance at the fixed lag l = 4
    * (σ̂² = (γ0 + 2Σ_{s≤4}(1 − s/5)γ_s)/n), tested against the level-case
    * 5% critical value 0.463. Lags are POSITION lags over the observed
    * sequence (the rank-sequence convention, stated — a gap does not
    * break the partial-sum recursion the way it breaks a one-step
    * difference).
    *
    * Exactness — everything multiplies through by n and 5:
    * ne_t = n·y_t − Σy is an exact DECIMAL(38,0) integer, the partial
    * sums nS_t accumulate exactly (one class-bounded cumulative window),
    * D = 5γ0ⁿ + 2Σ(5−s)γ_sⁿ (γⁿ = sums of ne products) is exact, and
    * η = 5·Σ(nS)² / (n·D) is ONE double divide (magnitude bound: Σ(nS)²
    * ~ n³·(n·ȳ)² stays inside 38 digits to ~10⁵ hours — a decade of
    * hourly history; the Jarque–Bera documented-not-enforced class).
    * Plan: one (class, hour) hash agg, one cumulative + four lag windows
    * on the class-bounded hourly frame, one class agg; k rows out. */
  def statKpss(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("x"))
    val hourly = events
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000 - 473352").as("x"))
      .agg(count(lit(1)).as("y"))
      .withColumn("nh", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .withColumn("sy", sum(col("y").cast(dec)).over(Window.partitionBy(col("event_type"))))
      .withColumn("ne", col("nh").cast(dec) * col("y") - col("sy"))
      .withColumn("ns",
        sum(col("ne")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val lagged = hourly
      .withColumn("ne1", lag(col("ne"), 1).over(w))
      .withColumn("ne2", lag(col("ne"), 2).over(w))
      .withColumn("ne3", lag(col("ne"), 3).over(w))
      .withColumn("ne4", lag(col("ne"), 4).over(w))
    val zero = lit(0L).cast(dec)
    val agg = lagged.groupBy(col("event_type")).agg(
      max(col("nh")).as("n_hours"),
      sum(col("ns") * col("ns")).as("num"),
      sum(col("ne") * col("ne")).as("g0"),
      sum(coalesce(col("ne1"), zero) * col("ne")).as("g1"),
      sum(coalesce(col("ne2"), zero) * col("ne")).as("g2"),
      sum(coalesce(col("ne3"), zero) * col("ne")).as("g3"),
      sum(coalesce(col("ne4"), zero) * col("ne")).as("g4"))
    agg
      .withColumn("den",
        lit(5L) * col("g0") + lit(2L) *
          (lit(4L) * col("g1") + lit(3L) * col("g2") +
            lit(2L) * col("g3") + col("g4")))
      .withColumn("kpss_eta",
        when(col("den") > 0 && col("n_hours") > 4,
          lit(5.0) * d2(col("num")) /
            (col("n_hours").cast("double") * d2(col("den")))))
      .select(col("event_type"), col("n_hours"), col("kpss_eta"),
        when(col("kpss_eta").isNotNull,
          when(col("kpss_eta") < lit(0.463), 1L).otherwise(0L))
          .as("level_stationary_5pct"))
      .orderBy("event_type")
  }
}
