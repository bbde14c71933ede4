package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowing on the live stream (SURVEY.md §2.9 T7/T8/T9).
  *
  * The reference keeps both the device timestamp and arrival time
  * (AIRWISEv0.py:134-135); here the device timestamp is the event-time
  * axis with a watermark bounding state, which is what makes these
  * aggregations runnable forever on an unbounded stream.
  */
object Windowed {

  /** T8: tumbling-window downsample of the metric stream (batch A5's
    * streaming form). Works on batch frames too (unified semantics). */
  def downsample(packets: DataFrame, every: String = "10 minutes",
                 watermark: String = "30 minutes"): DataFrame =
    packets
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), every).as("w"), col("node"))
      .agg(avg(col("metric")).as("avg_metric"), count(lit(1)).as("n"))
      .select(col("w.start").as("bucket_start"), col("node"),
        col("avg_metric"), col("n"))

  /** T8 (sliding variant): overlapping windows from the same primitive. */
  def slidingDownsample(packets: DataFrame, length: String = "10 minutes",
                        slide: String = "5 minutes",
                        watermark: String = "30 minutes"): DataFrame =
    packets
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), length, slide).as("w"), col("node"))
      .agg(avg(col("metric")).as("avg_metric"), count(lit(1)).as("n"))
      .select(col("w.start").as("bucket_start"), col("node"),
        col("avg_metric"), col("n"))

  /** T9: online-episode segmentation — gaps > threshold split sessions
    * (the dual of the offline alert, AIRWISEv0.py:81-96), via the built-in
    * session_window. */
  def onlineEpisodes(packets: DataFrame, gap: String = "100 minutes",
                     watermark: String = "200 minutes"): DataFrame =
    packets
      .withWatermark("event_ts", watermark)
      .groupBy(session_window(col("event_ts"), gap).as("s"), col("node"))
      .agg(count(lit(1)).as("n_packets"))
      .select(col("s.start").as("episode_start"), col("s.end").as("episode_end"),
        col("node"), col("n_packets"))
}
