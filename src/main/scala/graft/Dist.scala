package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed replacements for partition-less window shapes (SURVEY §7.4).
  *
  * A bare `row_number()/sum() OVER (ORDER BY …)` executes as ONE sorted
  * partition in Spark — a single-task funnel the moment the frame scales
  * with the data. The helpers here realize the same total-order semantics
  * with ONE range exchange of the data frame: sort-within-partitions gives
  * each row a local offset via `monotonically_increasing_id` (pid ≪ 33 +
  * row offset — NO window, so Spark does not re-shuffle the frame on the
  * partition-id key, which a `Window.partitionBy(__pid)` would force), and
  * an exclusive prefix over the per-partition counts (one row per range
  * partition — bounded by `spark.sql.shuffle.partitions`, never by the
  * data) lifts local offsets to global ranks. The pattern family is proven
  * in `corpus_budget_select` (`ext/CorpusPrep.scala`); `stat_gini_revenue`
  * and `events_rfm_scores` ride this helper (r5 verdict #4).
  *
  * Correctness does not depend on where the sampled range boundaries land:
  * the order must be TOTAL (callers append a tiebreak key), so every
  * boundary placement yields the same global ranks — `InvarianceSpec`
  * proves the derived ranks partitioning-independent even though the raw
  * ids are not.
  */
object Dist {
  /** Appends `rankCol`: the global 1-based row number of each row under the
    * total order `order` — bit-identical to
    * `row_number() OVER (ORDER BY order)` — without a global sort and
    * without any window over the data frame. The only window left behind
    * is the exclusive count-prefix over the per-partition stats frame
    * (`__pid`-ordered, ≤ shuffle-partitions rows).
    *
    * `parted` is persisted (MEMORY_AND_DISK) before fan-out: the stats
    * agg and the rank join reference it under different column prunings,
    * which makes the two subtrees canonically different — Catalyst (and
    * AQE at runtime) then re-evaluates the whole upstream per branch
    * (measured: 2 fact scans on `stat_gini_revenue`, zero
    * ReusedExchange), and if any upstream value were nondeterministic
    * the two evaluations could land different range boundaries —
    * silently wrong ranks (r6 advice). The cache makes single evaluation
    * STRUCTURAL: both branches read one InMemoryRelation (BlockManager
    * computes each block once), so boundaries and `__mid`s are frozen
    * facts. The frame being ranked is a reduced/aggregated frame by
    * contract; ContextCleaner reclaims the entry once the query's plan
    * is unreachable. */
  def rankByRange(df: DataFrame, rankCol: String, order: Column*): DataFrame = {
    val parted = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__pc"), min(col("__mid")).as("__m0"))
      .withColumn("__base", coalesce(
        sum(col("__pc")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__m0"), col("__base"))
    parted.join(broadcast(base), "__pid")
      .withColumn(rankCol,
        (col("__base") + (col("__mid") - col("__m0")) + lit(1L)).cast("long"))
      .drop("__pid", "__mid", "__m0", "__base")
  }

  /** SQL-standard `ntile(k)` from a global rank: with n rows, the first
    * n mod k tiles hold ⌈n/k⌉ rows, the rest ⌊n/k⌋ — the exact remainder
    * distribution Spark's and DuckDB's `ntile` both implement, so a tile
    * computed from [[rankByRange]]'s rank hash-matches the window spelling.
    * Pure integer arithmetic; `rn` and `n` must be positive longs.
    * (CaseWhen evaluates lazily, so the ⌊n/k⌋ = 0 divide is unreachable
    * when n < k — every row then sits in the first branch, tile = rn.) */
  def ntileOf(rn: Column, n: Column, k: Int): Column = {
    def idiv(a: Column, b: Column) = call_function("div", a, b) // IntegralDivide
    val q = idiv(n, lit(k))  // floor bucket size
    val r = n % k            // first r buckets get q+1 rows
    val headRows = r * (q + lit(1))
    when(rn <= headRows, idiv(rn + q, q + lit(1)))
      .otherwise(r + idiv(rn - headRows + q - lit(1), q))
      .cast("long")
  }
}
