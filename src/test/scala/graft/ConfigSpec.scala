package graft

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{TestGroupState, Trigger}
import graft.stream.{GraftConfig, Heartbeat}
import graft.stream.Heartbeat.{NodeState, Packet}

/** Env-var config surface (reference connectionSpecs.env parity): every
  * knob parses, defaults hold, and a non-default threshold actually drives
  * the heartbeat timeout. */
class ConfigSpec extends SparkSpec {

  test("defaults: reference threshold, AvailableNow trigger, no jdbc") {
    val cfg = GraftConfig.fromEnv(Map.empty[String, String])
    assert(cfg.offlineThresholdMs == Heartbeat.OfflineThresholdMs)
    assert(cfg.trigger == Trigger.AvailableNow())
    assert(cfg.jdbcUrl.isEmpty)
    assert(cfg.jdbcProperties.isEmpty)
  }

  test("env overrides parse: threshold, sinks, trigger, jdbc") {
    val cfg = GraftConfig.fromEnv(Map(
      "GRAFT_OFFLINE_THRESHOLD_SEC" -> "5",
      "GRAFT_SINK_DIR" -> "/data/out",
      "GRAFT_CHECKPOINT_DIR" -> "/data/ckpt",
      "GRAFT_TRIGGER_INTERVAL_SEC" -> "30",
      "GRAFT_JDBC_URL" -> "jdbc:derby:memory:cfg;create=true",
      "GRAFT_JDBC_USER" -> "ingest",
      "GRAFT_JDBC_PASSWORD" -> "secret"))
    assert(cfg.offlineThresholdMs == 5000L)
    assert(cfg.sinkDir == "/data/out")
    assert(cfg.checkpointDir == "/data/ckpt")
    assert(cfg.trigger == Trigger.ProcessingTime(30000L))
    assert(cfg.jdbcUrl.contains("jdbc:derby:memory:cfg;create=true"))
    assert(cfg.jdbcProperties.getProperty("user") == "ingest")
    assert(cfg.jdbcProperties.getProperty("password") == "secret")
  }

  test("non-default threshold drives the heartbeat timeout machinery") {
    val cfg = GraftConfig.fromEnv(Map("GRAFT_OFFLINE_THRESHOLD_SEC" -> "7"))
    val st = TestGroupState.create[NodeState](Optional.empty(),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty(),
      hasTimedOut = false)
    Heartbeat.update(cfg.offlineThresholdMs,
      Heartbeat.retireFor(cfg.offlineThresholdMs))(1L, Iterator(Packet(1L, 500L)), st).toList
    // TestGroupState records the armed duration as an absolute timestamp
    // relative to batchProcessingTimeMs: 1000 + 7s from config
    assert(st.getTimeoutTimestampMs.isPresent)
    assert(st.getTimeoutTimestampMs.get == 8000L)
    assert(st.get == NodeState(500L, alertSent = false))
  }
}
