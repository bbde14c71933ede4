package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Det._

/** Filter / predicate operators (SURVEY.md §2.3, P1–P6).
  *
  * All plain Catalyst predicates — they push down to the parquet scan
  * (visible as PushedFilters in .explain) and cost nothing at scale.
  */
object Filters {

  /** P1: single-type slice (`type == "telemetry"`, AIRWISEv0.py:112-114). */
  def filterEqType(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy("event_id")

  /** P2: per-key slice (`df[df.node == NODE_1]`, graphdata.py:90-91). */
  def filterByNode(events: DataFrame): DataFrame =
    events.filter(col("user_id") === 42L)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")

  /** P3: route on field presence (`'battery_level' in payload`,
    * AIRWISEv0.py:126). */
  def filterFieldPresent(events: DataFrame): DataFrame =
    events.filter(get_json_object(col("props"), "$.k").isNotNull)
      .select(col("event_id"), col("props"))
      .orderBy("event_id")

  /** P4: drop rows with null key column (cleandata.py:24). The nullable
    * column is derived (value<100 → NULL) to mirror coerce-then-dropna. */
  def dropNullRows(events: DataFrame): DataFrame =
    events
      .withColumn("maybe_value",
        when(col("value") < 100, lit(null)).otherwise(col("value")))
      .na.drop(Seq("maybe_value"))
      .select(col("event_id"), col("maybe_value"))
      .orderBy("event_id")

  /** P5: "older than N minutes" predicate (AIRWISEv0.py:76-84). "now" is the
    * table's max ts (deterministic), not the wall clock. The 1-row agg is
    * broadcast — no shuffle of the fact side. */
  def filterTimeThreshold(events: DataFrame): DataFrame = {
    val mx = events.agg(max(col("ts")).as("mx"))
    events.join(broadcast(mx))
      .filter(col("ts") < col("mx") - expr("INTERVAL 100 MINUTES"))
      .select(col("event_id"), fmtTs(col("ts")).as("ts_s"))
      .orderBy("event_id")
  }

  /** P6: bounded value-range view (graphdata.py:156 ylim ≙ range slice). */
  def filterRangeClip(events: DataFrame): DataFrame =
    events.filter(col("value").between(0, 15))
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy("event_id")
}
