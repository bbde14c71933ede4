package graft.model

import org.apache.spark.sql.types._

/** Schemas mirroring the reference's wire format and fact tables
  * (FIXTURES.md §A; DDL at reference EUREKATables.sh:33,52, envelope shape
  * from captured payloads at AIRWISEv1.py:46-54).
  *
  * Everything nullable: the wire is schema-on-read — missing JSON fields
  * must surface as SQL NULLs, not errors (AIRWISEv0.py:132-135).
  */
object Schemas {

  /** Meshtastic JSON envelope. `payload` is a loose struct covering the
    * union of all packet-type payloads; absent fields read as NULL. */
  val payload: StructType = StructType(Seq(
    // env telemetry (v0, AIRWISEv0.py:146-150)
    StructField("barometric_pressure", DoubleType),
    StructField("gas_resistance", DoubleType),
    StructField("iaq", IntegerType),
    StructField("relative_humidity", DoubleType),
    StructField("temperature", DoubleType),
    // power telemetry (AIRWISEv1.py:48)
    StructField("air_util_tx", DoubleType),
    StructField("battery_level", DoubleType),
    StructField("channel_utilization", DoubleType),
    StructField("uptime_seconds", LongType),
    StructField("voltage", DoubleType),
    // text (v1, AIRWISEv1.py:52-54)
    StructField("text", StringType),
    // nodeinfo (AIRWISEv0.py:248-251)
    StructField("id", StringType),
    StructField("longname", StringType)))

  val envelope: StructType = StructType(Seq(
    StructField("channel", IntegerType),
    StructField("from", LongType),
    StructField("hop_start", IntegerType),
    StructField("hops_away", IntegerType),
    StructField("id", LongType),
    StructField("payload", payload),
    StructField("rssi", IntegerType),
    StructField("sender", StringType),
    StructField("snr", DoubleType),
    StructField("timestamp", LongType),
    StructField("to", LongType),
    StructField("type", StringType)))

  /** airwise_data (v0 environmental telemetry, EUREKATables.sh:33). */
  val airwiseData: StructType = StructType(Seq(
    StructField("node", LongType),
    StructField("topic_id", StringType),
    StructField("longname", StringType),
    StructField("pressure", DoubleType),
    StructField("gas", DoubleType),
    StructField("iaq", IntegerType),
    StructField("humidity", DoubleType),
    StructField("temperature", DoubleType),
    StructField("timestamp_node", LongType),
    StructField("pst_time", StringType)))

  /** battery_data (EUREKATables.sh:52) — note the reference drops
    * timestamp_node at insert time (AIRWISEv0.py:134 vs :172). */
  val batteryData: StructType = StructType(Seq(
    StructField("node", LongType),
    StructField("topic_id", StringType),
    StructField("longname", StringType),
    StructField("voltage", DoubleType),
    StructField("battery_level", DoubleType),
    StructField("pst_time", StringType)))

  /** airwise_datav1 — nullable superset of both writer generations
    * (AIRWISEv1.py:233 14-col vs AIRWISEv0v1comb.py:272 12-col). */
  val airwiseDataV1: StructType = StructType(Seq(
    StructField("node", LongType),
    StructField("topic_id", StringType),
    StructField("longname", StringType),
    StructField("temperature", DoubleType),
    StructField("humidity", DoubleType),
    StructField("pressure", DoubleType),
    StructField("gas", DoubleType),
    StructField("pm1_0", DoubleType),
    StructField("pm2_5", DoubleType),
    StructField("pm10", DoubleType),
    StructField("bus_voltage", DoubleType),
    StructField("current_mA", DoubleType),
    StructField("timestamp_node", LongType),
    StructField("pst_time", StringType)))

  /** Node dimension seed (AIRWISEv0.py:41-49): node -> (topic_id, longname). */
  val nodeDimSeed: Seq[(Long, String, String)] = Seq(
    (1127718912L, "!433c7000", "Farm1"),
    (1127718913L, "!433c7001", "Farm2"),
    (1127718914L, "!433c7002", "Farm3"),
    (1127718915L, "!433c7003", "Farm4"),
    (1127718916L, "!433c7004", "Farm5"),
    (1127718917L, "!433c7005", "Farm6"))
}
