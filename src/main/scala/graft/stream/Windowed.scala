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

  /** T13 (r4): streaming "trending" top-k — per tumbling window, the k
    * busiest keys. Window functions (rank) are not allowed mid-stream, so
    * the rank runs in foreachBatch over each micro-batch's FINALIZED
    * windows (append mode + watermark ⇒ a window is emitted exactly once,
    * complete), which is the standard shape: stream does the heavy
    * windowed count with bounded state, the per-window top-k is a
    * tiny batch computation on the emitted rows. The batch dual
    * (`window_topk_hourly` in SparkEntry) is the oracle-checked form. */
  def trendingTopK(packets: DataFrame, every: String = "10 minutes",
                   watermark: String = "30 minutes", k: Int = 3)
                  (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    val counts = packets
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), every).as("w"), col("node"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket_start"), col("node"), col("n"))
    counts.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val wr = Window.partitionBy(col("bucket_start"))
          .orderBy(col("n").desc, col("node"))
        sink(batch
          .withColumn("rnk", row_number().over(wr).cast("long"))
          .filter(col("rnk") <= k))
      }
      .start()
  }

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
