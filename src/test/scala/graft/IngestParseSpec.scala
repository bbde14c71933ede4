package graft

import org.apache.spark.sql.functions._
import graft.stream.Ingest
import graft.model.Schemas

/** Parser null-semantics from SURVEY.md §1.3, using the golden payloads
  * preserved in the reference's comments (AIRWISEv1.py:46-54) plus the
  * malformed variants every parser must tolerate. */
class IngestParseSpec extends SparkSpec {
  import spark.implicits._

  // golden packets (shapes from reference comments, FIXTURES.md §A1)
  val telemetryEnv =
    """{"channel":0,"from":1127718912,"id":1,"payload":{"barometric_pressure":1013.2,"gas_resistance":120000.5,"iaq":51,"relative_humidity":40.2,"temperature":21.5},"sender":"!433c7000","timestamp":1760748340,"to":-1,"type":"telemetry"}"""
  val telemetryBattery =
    """{"channel":0,"from":1127718912,"id":2,"payload":{"air_util_tx":1.2,"battery_level":92,"channel_utilization":3.4,"uptime_seconds":5000,"voltage":4.01},"sender":"!433c7000","timestamp":1760748350,"to":-1,"type":"telemetry"}"""
  val textV1 =
    """{"channel":0,"from":1127718913,"id":3,"payload":{"text":"23.35,41.69,985.34,185623.00,1.00,1.00,1.00,4.98,148.62\n"},"sender":"!433c7001","timestamp":1760748360,"to":-1,"type":"text"}"""
  val nodeinfo =
    """{"channel":0,"from":1127718914,"id":4,"payload":{"id":"!433c7002","longname":"Farm3"},"sender":"!433c7002","timestamp":1760748370,"to":-1,"type":"nodeinfo"}"""
  val missingFields = // telemetry with sparse payload -> NULL columns
    """{"from":1127718915,"payload":{"temperature":19.0},"timestamp":1760748380,"type":"telemetry"}"""
  val badJson = "not json at all {"
  val wrongType =
    """{"from":1127718912,"payload":{},"timestamp":1760748390,"type":"position"}"""
  val shortText = // <9 fields -> dropped (IndexError path, AIRWISEv1.py:149-157)
    """{"from":1127718913,"payload":{"text":"1.0,2.0,3.0"},"timestamp":1760748400,"type":"text"}"""
  val badFloatText = // non-float field -> dropped (ValueError, AIRWISEv1.py:138-140)
    """{"from":1127718913,"payload":{"text":"1.0,2.0,x,4.0,5.0,6.0,7.0,8.0,9.0"},"timestamp":1760748410,"type":"text"}"""

  def routed = {
    val raw = Seq(telemetryEnv, telemetryBattery, textV1, nodeinfo, missingFields,
      badJson, wrongType, shortText, badFloatText).toDF("value")
    Ingest.routePackets(Ingest.parseEnvelope(raw))
  }
  val arrival = to_timestamp(lit("2026-01-01 00:00:00"))

  test("malformed JSON is dropped, stream continues") {
    assert(routed.count() == 8) // badJson gone, everything else survives
    assert(routed.filter(col("route") === "drop").count() == 1) // wrongType
  }

  test("routing matches reference packet classification") {
    val m = routed.groupBy("route").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("environment" -> 2, "battery" -> 1, "v1_text" -> 3,
      "nodeinfo" -> 1, "drop" -> 1))
  }

  test("v0 env parse: missing payload fields surface as NULLs, row kept") {
    val env = Ingest.parseEnvironment(routed, arrival)
    val sparse = env.filter(col("node") === 1127718915L).collect().head
    assert(sparse.getAs[Any]("pressure") == null)
    assert(sparse.getAs[Double]("temperature") == 19.0)
    assert(sparse.getAs[Long]("timestamp_node") == 1760748380L)
    assert(sparse.getAs[String]("pst_time").startsWith("2025-12-31 16:00:00"))
  }

  test("battery row drops timestamp_node (reference insert shape)") {
    val bat = Ingest.parseBattery(routed, arrival)
    assert(!bat.columns.contains("timestamp_node"))
    val r = bat.collect().head
    assert(r.getAs[Double]("voltage") == 4.01)
    assert(r.getAs[Double]("battery_level") == 92.0)
  }

  test("v1 text parse: golden 9-tuple lands; short and non-float rows drop") {
    val v1 = Ingest.parseV1Text(routed, arrival).collect()
    assert(v1.length == 1)
    val r = v1.head
    assert(r.getAs[Long]("node") == 1127718913L)
    assert(r.getAs[Double]("temperature") == 23.35)
    assert(r.getAs[Double]("current_mA") == 148.62)
  }

  test("unknown node enrichment keeps row with NULL dim columns") {
    val dim = Schemas.nodeDimSeed.toDF("node", "topic_id", "longname")
      .filter(col("node") =!= 1127718915L)
    val env = Ingest.parseEnvironment(routed, arrival)
      .drop("topic_id", "longname")
    val enriched = Ingest.enrich(env, dim)
    assert(enriched.count() == 2)
    val unknown = enriched.filter(col("node") === 1127718915L).collect().head
    assert(unknown.getAs[String]("longname") == null)
    val known = enriched.filter(col("node") === 1127718912L).collect().head
    assert(known.getAs[String]("longname") == "Farm1")
  }
}
