package graft.stream

import org.apache.spark.sql.streaming.Trigger

/** Env-injectable runtime configuration — the Spark form of the reference's
  * container env file (DockerImageForFIREsmartDB/connectionSpecs.env:1-14,
  * read by FIREsmart_upload.py at startup): offline threshold, sink
  * locations, trigger cadence and JDBC connection come from `GRAFT_*`
  * variables instead of code edits, so the same image deploys against any
  * environment.
  *
  * Knobs (all optional, with the in-code defaults as fallback):
  *   - GRAFT_OFFLINE_THRESHOLD_SEC — heartbeat silence before OFFLINE
  *     (reference THRESHOLD, AIRWISEv0.py:20)
  *   - GRAFT_SINK_DIR / GRAFT_CHECKPOINT_DIR — parquet sink + checkpoint
  *   - GRAFT_TRIGGER_INTERVAL_SEC — micro-batch cadence; unset = drain
  *     available data and stop (Trigger.AvailableNow)
  *   - GRAFT_JDBC_URL / GRAFT_JDBC_USER / GRAFT_JDBC_PASSWORD — the
  *     relational sink (reference DB_HOST/DB_USER/DB_PASS)
  */
final case class GraftConfig(
    offlineThresholdMs: Long,
    sinkDir: String,
    checkpointDir: String,
    triggerIntervalSec: Option[Long],
    jdbcUrl: Option[String],
    jdbcUser: Option[String],
    jdbcPassword: Option[String]) {

  /** Streaming trigger implied by the config: fixed cadence when an
    * interval is set, one-shot drain otherwise. */
  def trigger: Trigger = triggerIntervalSec
    .map(s => Trigger.ProcessingTime(s * 1000L))
    .getOrElse(Trigger.AvailableNow())

  /** JDBC connection properties (user/password when provided). */
  def jdbcProperties: java.util.Properties = {
    val p = new java.util.Properties()
    jdbcUser.foreach(p.setProperty("user", _))
    jdbcPassword.foreach(p.setProperty("password", _))
    p
  }
}

object GraftConfig {

  /** Parse from an env map (defaults to the process env; tests inject). */
  def fromEnv(env: collection.Map[String, String] = sys.env): GraftConfig =
    GraftConfig(
      offlineThresholdMs = env.get("GRAFT_OFFLINE_THRESHOLD_SEC")
        .map(_.trim.toLong * 1000L).getOrElse(Heartbeat.OfflineThresholdMs),
      sinkDir = env.getOrElse("GRAFT_SINK_DIR", "graft_out"),
      checkpointDir = env.getOrElse("GRAFT_CHECKPOINT_DIR", "graft_ckpt"),
      triggerIntervalSec = env.get("GRAFT_TRIGGER_INTERVAL_SEC").map(_.trim.toLong),
      jdbcUrl = env.get("GRAFT_JDBC_URL"),
      jdbcUser = env.get("GRAFT_JDBC_USER"),
      jdbcPassword = env.get("GRAFT_JDBC_PASSWORD"))
}
