package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Det._

/** Sort / limit / top-k (SURVEY.md §2.7) and set operations (§2.8). */
object SetSort {

  /** O1: global sort on time before output (cleandata.py:29).
    *
    * Sorts on the NATIVE (ts, event_id) int64 keys, rendering the string
    * form in the projection above: `yyyy-MM-dd HH:mm:ss.SSSSSS` is
    * fixed-width and lexicographically order-preserving, so the total
    * order is provably identical to sorting the rendered string — but the
    * range-sort comparator is an 8-byte long instead of a 26-char string
    * (the plan you want carrying 100 TB through a range exchange). */
  def sortByTime(events: DataFrame): DataFrame =
    events.orderBy(col("ts"), col("event_id"))
      .select(col("event_id"), fmtTs(col("ts")).as("ts_s"),
        col("user_id"), col("event_type"), col("value"))

  /** O2: single-row probe (fetchone, AIRWISEv0.py:319-320). Native-key
    * order (see [[sortByTime]]); orderBy+limit collapses to
    * TakeOrderedAndProject, so no global sort materializes. */
  def limitHead(events: DataFrame): DataFrame =
    events.orderBy(col("ts"), col("event_id"))
      .limit(1)
      .select(col("event_id"), fmtTs(col("ts")).as("ts_s"), col("user_id"))

  /** O3: most-recent-N readings per node (dashboard ext of AIRWISEv0.py:258). */
  def topkRecentPerNode(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("user_id"), col("rn"), col("event_id"),
        fmtTs(col("ts")).as("ts_s"), col("value"))
      .orderBy("user_id", "rn")
  }

  /** U1: union N inputs into one frame (cleandata.py:11-19). */
  def unionMultiFile(events: DataFrame): DataFrame = {
    val a = events.filter(col("event_type") === "click")
    val b = events.filter(col("event_type") === "error")
    a.unionByName(b)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy("event_id")
  }

  /** U2: configured-but-silent keys (dict keys minus heartbeat keys,
    * AIRWISEv0.py:80-91): users who never purchased. */
  def exceptMissingNodes(events: DataFrame): DataFrame =
    events.select(col("user_id")).distinct()
      .except(events.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct())
      .orderBy("user_id")

  /** U3: time range where both sources have data (graphdata.py:98-104). */
  def intersectCommonTimes(events: DataFrame): DataFrame = {
    def hours(tpe: String): DataFrame =
      events.filter(col("event_type") === tpe)
        .select(date_trunc("hour", col("ts")).as("hour")).distinct()
    hours("click").intersect(hours("purchase"))
      .select(fmtTsSec(col("hour")).as("hour_s"))
      .orderBy("hour_s")
  }

  private def userHours(events: DataFrame, tpe: String): DataFrame =
    events.filter(col("event_type") === tpe)
      .select(col("user_id"), fmtTsSec(date_trunc("hour", col("ts"))).as("hour_s"))

  /** U4: multiset difference — per-(user, hour) click occurrences minus
    * error occurrences, MULTIPLICITY KEPT (max(m−n, 0) copies survive):
    * the bag form of U2 for occurrence accounting, where DISTINCT-based
    * EXCEPT silently conflates "5 clicks, 1 error" with "1 click, 1
    * error". Same hash shuffle as except; counts ride the aggregation. */
  def exceptAllClickErrorHours(events: DataFrame): DataFrame =
    userHours(events, "click").exceptAll(userHours(events, "error"))
      .orderBy("user_id", "hour_s")

  /** U5: multiset intersection — min(m, n) copies per (user, hour): hours
    * where a user both clicked and purchased, weighted by the smaller
    * occurrence count. */
  def intersectAllClickPurchaseHours(events: DataFrame): DataFrame =
    userHours(events, "click").intersectAll(userHours(events, "purchase"))
      .orderBy("user_id", "hour_s")

  /** r5c4: schema-evolution union — the read path every long-lived lake
    * table needs: file generations written before a column existed (or
    * after one was dropped) must union with current ones, nulls filling
    * the gaps BY NAME, never by position (positional union silently
    * misaligns when a middle column appears). Simulated here with two
    * generations split at a cutoff: gen-1 carries `value` but predates
    * `schema_ver`; gen-2 dropped `value` and added `schema_ver`.
    * `unionByName(allowMissingColumns = true)` is the Spark spelling
    * (DuckDB: UNION ALL BY NAME); the per-generation census proves which
    * columns each generation actually populated. Pure counts ⇒
    * hash-match; the union adds no shuffle (both legs stay partition-
    * local under the same scan). */
  def unionSchemaEvolve(events: DataFrame,
                        cutoff: String = "2024-01-16 00:00:00"): DataFrame = {
    val cut = lit(cutoff).cast("timestamp")
    val gen1 = events.filter(col("ts") < cut)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val gen2 = events.filter(col("ts") >= cut)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .withColumn("schema_ver", lit(2L))
    gen1.unionByName(gen2, allowMissingColumns = true)
      .groupBy(coalesce(col("schema_ver"), lit(1L)).as("schema_ver"))
      .agg(count(lit(1)).as("n_rows"), count(col("value")).as("n_value_present"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("schema_ver")
  }
}
