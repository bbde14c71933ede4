package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream correlation (T-family extension): join two LIVE streams
  * on key + time proximity — the streaming form of the reference's
  * offline cross-table correlation (graphdata.py:98-192 overlays
  * environment and battery series per node; the daemons write them to
  * separate tables and analytics joins them later). Doing it in-flight
  * means the correlated record exists the moment both halves arrived.
  *
  * Scale mechanics: both sides carry a watermark and the join predicate
  * bounds event-time distance, so Spark can expire buffered state for
  * rows whose match window has passed — state is O(rate × window), not
  * O(stream). Without both the watermarks AND the interval condition the
  * engine must buffer a whole side forever; this operator exists to pin
  * the bounded-state form.
  */
object StreamJoin {

  /** Inner-join environment readings with battery readings from the same
    * node whose timestamps are within `toleranceMin` minutes. Works
    * identically on batch frames (Spark's unified semantics) — the spec
    * drives both. Expected columns: env(node, env_ts, temperature),
    * bat(b_node, bat_ts, battery_level). */
  def envBatteryWithin(env: DataFrame, bat: DataFrame,
                       toleranceMin: Int = 5,
                       watermark: String = "10 minutes"): DataFrame = {
    val envW = env.withWatermark("env_ts", watermark)
    val batW = bat.withWatermark("bat_ts", watermark)
    envW.join(batW,
      col("node") === col("b_node") &&
        col("bat_ts") >= col("env_ts") - expr(s"INTERVAL $toleranceMin MINUTES") &&
        col("bat_ts") <= col("env_ts") + expr(s"INTERVAL $toleranceMin MINUTES"))
      .select(col("node"), col("env_ts"), col("bat_ts"),
        col("temperature"), col("battery_level"))
  }
}
