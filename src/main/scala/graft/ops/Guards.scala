package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** r10 (VERDICT r9 #5): the shared LOUD SPAN BUDGET for the fold/bar
  * tier. A family of operators (`ts_macd`, `ts_ewm_stats`,
  * `stat_holt_winters`, `events_survival_km`, `ts_ses_grid`, …) collects
  * one ARRAY PER CLASS — the observed hourly bars, or a densified
  * `sequence(mn, mx)` hour grid — justified by "span-bounded": the array
  * grows with the TIME SPAN, not the row count, so it is safe at any
  * data scale *for a sane span*. The hazard the budget closes: a decade
  * of hourly history is ~87.6 k elements (fine), but nothing stopped a
  * CORRUPT timestamp (an epoch-zero row, a year-9999 row) or a silent
  * minute-bar refactor from inflating the grid 100–1000× — the array
  * materializes per class inside one task and eats the executor quietly,
  * the exact failure mode the r9 sf1 experiment proved kills the whole
  * context (`graph_link_jaccard`).
  *
  * Mechanics: the guard is IN-PLAN (`when(size ≤ budget, arr)
  * .otherwise(raise_error(...))` — no extra pre-flight job, no change to
  * any under-budget result, hash-neutral by construction), so it rides
  * every existing plan unchanged and fails ACTIONABLY, naming the
  * operator and the fix, instead of OOMing an executor. For densified
  * grids the length is checked BEFORE `sequence()` materializes the
  * array (the budget wraps the length scalar the sequence is built
  * from), so an epoch-zero row cannot allocate a 490 k-slot array even
  * transiently. Default budget 10⁶ elements/class ≈ 114 years of hourly
  * bars ≈ 16 MB of struct entries — far past any sane contract, well
  * short of an OOM. `SpanGuardSpec` proves both the passthrough and the
  * loud trip (via a deliberately corrupt 18th-century timestamp). */
object Guards {
  /** Per-class series-length budget: ~114 years of hourly bars. */
  val SpanBudget = 1000000L

  private def msg(op: String, what: String, n: Column, budget: Long) =
    concat(lit(s"$op: $what "), n.cast("string"),
      lit(s" exceeds the $budget span budget - aggregate coarser bars or " +
        "bound the history (filter the time range) before the per-class fold"))

  /** Wrap a collected per-class series: passthrough under budget, loud
    * actionable failure past it. */
  def boundedSeries(arr: Column, op: String,
      budget: Long = SpanBudget): Column =
    when(size(arr) <= lit(budget.toInt), arr)
      .otherwise(raise_error(msg(op, "per-class series length", size(arr), budget)))

  /** Guard a dense grid LENGTH (mx − mn + 1 slots) before `sequence()`
    * materializes it — trips on corrupt-timestamp spans without ever
    * allocating the oversized array. */
  def boundedSpanLen(len: Column, op: String,
      budget: Long = SpanBudget): Column =
    when(len <= lit(budget), len)
      .otherwise(raise_error(msg(op, "dense grid span", len, budget))
        .cast("long"))
}
