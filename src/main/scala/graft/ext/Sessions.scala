package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Det._

/** X6: batch sessionization — the deterministic oracle form of the
  * streaming session_window (SURVEY.md §2.9 T9, AIRWISEv0.py:81-96 gap
  * logic). */
object Sessions {

  /** Split each user's event stream into sessions at gaps > `gapMinutes`;
    * emit one row per session with bounds and size. Single shuffle on
    * user_id; the cumulative-sum session id is the standard lag+sum trick. */
  def eventsSessionize(events: DataFrame, gapMinutes: Int = 360): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60 * 1000000
    events
      .withColumn("e_us", unix_micros(col("ts")))
      .withColumn("new_sess",
        when(lag(col("e_us"), 1).over(w).isNull ||
          col("e_us") - lag(col("e_us"), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("session_num",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_num"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_num"),
        fmtTs(col("session_start")).as("session_start_s"),
        fmtTs(col("session_end")).as("session_end_s"),
        col("n_events"))
      .orderBy("user_id", "session_num")
  }
}
