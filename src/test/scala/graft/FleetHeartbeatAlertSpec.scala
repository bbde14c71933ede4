package graft

import java.nio.file.Files

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.stream.{Alerts, Heartbeat, Ingest}
import graft.stream.Heartbeat.{NodeEvent, Packet}

/** r11 (VERDICT r10 #6): the reference's ACTUAL production loop, end to
  * end — a FLEET of MQTT gateways (AIRWISEv0.py:365-375's subscription,
  * times N) feeding per-node heartbeat state (node_heartbeats,
  * AIRWISEv0.py:27/258), offline detection on the silence threshold
  * (checker thread, AIRWISEv0.py:73-103), and edge-latched alert delivery
  * (node_alerts latch + ntfy POST, AIRWISEv0.py:30/85-96/51-68). Each seam
  * is spec'd alone (MqttFleetSpec, HeartbeatSpec, HttpAlertSpec); this is
  * the integration: three real mini-brokers, one WEDGED gateway, and the
  * exactly-once guarantee held across a forced monitor restart.
  *
  * Topology note: the transport query (fleet source → parquet heartbeat
  * log) and the monitor query (file stream → keyed state → alert sink)
  * are SEPARATE streaming queries, which is also the production shape —
  * restarting the monitor must not re-handshake every gateway, and the
  * landed heartbeat log is the replayable source of truth the monitor's
  * checkpoint indexes into. The reconnect test restarts ONLY the monitor:
  * its flatMapGroupsWithState latch must come back from the checkpoint,
  * so the already-alerted node alerts no second time. */
class FleetHeartbeatAlertSpec extends SparkSpec {
  import spark.implicits._

  test("3 gateways, one wedged: OFFLINE once, no dup across restart, ONLINE on recovery") {
    val brokers = Seq.fill(3)(new MiniMqttBroker)
    val gateways = brokers.map(b => s"127.0.0.1:${b.port}").mkString(",")
    val dir = Files.createTempDirectory("graft_fleet_e2e").toString
    val nodes = Seq(100L, 101L, 102L) // node i reports through gateway i

    // ---- transport query: fleet -> parquet heartbeat log (never restarted;
    // the mini-broker serves exactly one subscriber for its lifetime)
    val raw = Ingest.mqttFleetSource(spark, gateways, "msh/#")
    val hb = raw.select(
      get_json_object(col("value"), "$.from").cast("long").as("node"),
      unix_millis(col("arrival")).as("ts_ms"))
      .filter(col("node").isNotNull)
    val qTransport = hb.writeStream.format("parquet")
      .option("path", s"$dir/hb").option("checkpointLocation", s"$dir/ckptA")
      .start()

    // ---- monitor query factory (restartable against the same checkpoint)
    val sink = new Alerts.MemorySink
    def startMonitor(): StreamingQuery = {
      val packets = spark.readStream
        .schema("node LONG, ts_ms LONG").parquet(s"$dir/hb").as[Packet]
      // retireMs pinned far out: this test must observe the ONLINE
      // recovery, not the TTL eviction (RETIRED is HeartbeatSpec's case)
      Heartbeat.monitor(packets, offlineMs = 3000L, retireMs = 600000L)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckptB")
        .foreachBatch { (batch: Dataset[NodeEvent], _: Long) =>
          batch.orderBy(col("at_ms"), col("node"), col("event"))
            .collect().foreach(sink.deliver)
        }
        .start()
    }

    def delivered(): Seq[NodeEvent] = {
      val it = sink.delivered.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[NodeEvent]
      while (it.hasNext) buf += it.next()
      buf.toSeq
    }
    def countOf(node: Long, event: String): Int =
      delivered().count(e => e.node == node && e.event == event)

    // pump heartbeats for the two healthy gateways; gateway 1 wedges after
    // its first packet (queue goes silent — the socket stays up, exactly a
    // hung daemon)
    @volatile var pumping = true
    val pump = new Thread(() => {
      while (pumping) {
        brokers(0).publish("msh/hb", s"""{"from":${nodes(0)}}""")
        brokers(2).publish("msh/hb", s"""{"from":${nodes(2)}}""")
        Thread.sleep(400)
      }
    }, "hb-pump")
    pump.setDaemon(true)

    var qMon: StreamingQuery = null
    try {
      assert(brokers.forall(_.awaitSubscriber(30000)), "all gateways handshake")
      brokers(1).publish("msh/hb", s"""{"from":${nodes(1)}}""") // last words
      pump.start()
      qMon = startMonitor()

      // --- the wedged gateway's node goes OFFLINE exactly once
      val deadline = System.currentTimeMillis() + 120000
      while (countOf(nodes(1), "OFFLINE") < 1 &&
        System.currentTimeMillis() < deadline) Thread.sleep(250)
      assert(countOf(nodes(1), "OFFLINE") == 1,
        s"exactly one OFFLINE for the wedged node; got ${delivered()}")
      assert(countOf(nodes(0), "OFFLINE") == 0 && countOf(nodes(2), "OFFLINE") == 0,
        s"pumped nodes must stay online; got ${delivered()}")

      // --- forced reconnect: let the alert's epoch commit (two further
      // batch ids), then restart the monitor from its checkpoint
      val alertBatch = Option(qMon.lastProgress).map(_.batchId).getOrElse(0L)
      while (Option(qMon.lastProgress).forall(_.batchId < alertBatch + 2) &&
        System.currentTimeMillis() < deadline) Thread.sleep(250)
      qMon.stop()
      qMon = startMonitor()

      // the restored latch must suppress a duplicate OFFLINE: wait out two
      // more silence thresholds with the monitor live again
      val settle = System.currentTimeMillis() + 7000
      while (System.currentTimeMillis() < settle) Thread.sleep(250)
      assert(countOf(nodes(1), "OFFLINE") == 1,
        s"latch must survive the restart (exactly-once); got ${delivered()}")

      // --- recovery: the wedged gateway speaks again -> exactly one ONLINE
      brokers(1).publish("msh/hb", s"""{"from":${nodes(1)}}""")
      while (countOf(nodes(1), "ONLINE") < 1 &&
        System.currentTimeMillis() < deadline) Thread.sleep(250)
      assert(countOf(nodes(1), "ONLINE") == 1,
        s"exactly one recovery ONLINE; got ${delivered()}")
      assert(countOf(nodes(1), "OFFLINE") == 1, "still no duplicate OFFLINE")
      // healthy nodes emitted no transitions at all (edge-triggered)
      assert(delivered().forall(_.node == nodes(1)),
        s"only the wedged node transitions; got ${delivered()}")
    } finally {
      pumping = false
      if (qMon != null) qMon.stop()
      qTransport.stop()
      brokers.foreach(_.close())
    }
  }
}
