package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, LinkedBlockingQueue, TimeUnit}

import graft.model.Schemas
import graft.sources.MqttCodec
import graft.stream.Ingest

/** Test-scope MQTT 3.1.1 mini-broker: accepts ONE subscriber, performs the
  * CONNECT/SUBSCRIBE handshake, then delivers queued QoS-0 PUBLISH packets.
  * Built on the SAME [[MqttCodec]] as the production subscriber, so the
  * spec exercises both directions of the codec against each other. */
private class MiniMqttBroker {
  import MqttCodec._

  private val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
  val port: Int = server.getLocalPort
  private val queue = new LinkedBlockingQueue[(String, Array[Byte])]
  private val subscribed = new CountDownLatch(1)
  @volatile private var closed = false

  private val thread = new Thread(() => {
    var sock: Socket = null
    try {
      sock = server.accept()
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
      val conn = readPacket(in)
      assert(conn.ptype == CONNECT, s"expected CONNECT, got ${conn.ptype}")
      writePacket(out, CONNACK, 0, Array[Byte](0, 0)) // session-present=0, rc=0
      val sub = readPacket(in)
      assert(sub.ptype == SUBSCRIBE, s"expected SUBSCRIBE, got ${sub.ptype}")
      writePacket(out, SUBACK, 0, Array[Byte](sub.body(0), sub.body(1), 0))
      subscribed.countDown()
      // delivery loop: the subscriber only ever sends DISCONNECT/PINGREQ
      // after the handshake, so one poll loop suffices
      while (!closed) {
        val msg = queue.poll(50, TimeUnit.MILLISECONDS)
        if (msg != null)
          writePacket(out, PUBLISH, 0, publishBody(msg._1, msg._2))
      }
    } catch {
      case _: Throwable if closed => ()
    } finally {
      if (sock != null) { try sock.close() catch { case _: Throwable => () } }
    }
  }, "mini-mqtt-broker")
  thread.setDaemon(true)
  thread.start()

  /** Blocks until a subscriber completed the handshake (or times out). */
  def awaitSubscriber(ms: Long): Boolean = subscribed.await(ms, TimeUnit.MILLISECONDS)

  def publish(topic: String, payload: String): Unit =
    queue.put((topic, payload.getBytes(UTF_8)))

  def close(): Unit = {
    closed = true
    try server.close() catch { case _: Throwable => () }
  }
}

/** S3, the reference's actual entry point (AIRWISEv0.py:365-375): a live
  * MQTT subscription feeding the IDENTICAL ingest plan as the
  * socket/MemoryStream paths — real broker handshake, real streaming query,
  * routed epoch-idempotent parquet out. */
class MqttIngestSpec extends SparkSpec {
  import spark.implicits._

  test("mqtt transport feeds the identical ingest plan end-to-end") {
    val dir = Files.createTempDirectory("graft_mqtt").toString
    val broker = new MiniMqttBroker
    val dim = Schemas.nodeDimSeed.toDF("node", "topic_id", "longname")
    val q = Ingest.runIngestMqtt(spark, "127.0.0.1", broker.port,
      "msh/2/json/#", dim, s"$dir/out", s"$dir/ckpt")
    try {
      assert(broker.awaitSubscriber(30000), "subscriber completed MQTT handshake")
      broker.publish("msh/2/json/LongFast/!433e1f28",
        """{"from":1127718912,"payload":{"barometric_pressure":1013.2,"gas_resistance":120000.5,"iaq":51,"relative_humidity":40.2,"temperature":21.5},"timestamp":1760748340,"type":"telemetry"}""")
      broker.publish("msh/2/json/LongFast/!433e1f28",
        """{"from":1127718912,"payload":{"battery_level":92,"voltage":4.01},"timestamp":1760748350,"type":"telemetry"}""")
      broker.publish("msh/2/json/LongFast/!433e1f28", "garbage that is not json")

      val deadline = System.currentTimeMillis() + 60000
      def envRows() =
        try spark.read.parquet(s"$dir/out/airwise_data").count()
        catch { case _: Throwable => 0L }
      def batRows() =
        try spark.read.parquet(s"$dir/out/battery_data").count()
        catch { case _: Throwable => 0L }
      while ((envRows() < 1 || batRows() < 1) &&
        System.currentTimeMillis() < deadline) Thread.sleep(250)
      assert(envRows() == 1, "environment telemetry routed")
      assert(batRows() == 1, "battery telemetry routed")
      val env = spark.read.parquet(s"$dir/out/airwise_data")
      // identical downstream semantics as SocketIngestSpec: enrichment +
      // day partitioning survive the transport swap
      assert(env.collect().head.getAs[String]("longname") == "Farm1")
      assert(env.columns.contains("ds"))
    } finally {
      q.stop()
      broker.close()
    }
  }

  test("mqtt source surfaces topic and arrival alongside the payload") {
    val broker = new MiniMqttBroker
    val dir = Files.createTempDirectory("graft_mqtt_raw").toString
    val raw = Ingest.mqttSource(spark, "127.0.0.1", broker.port, "sensors/#")
    assert(raw.schema.fieldNames.toSeq == Seq("topic", "value", "arrival"))
    val q = raw.writeStream
      .format("memory").queryName("mqtt_raw")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      assert(broker.awaitSubscriber(30000), "subscriber completed MQTT handshake")
      broker.publish("sensors/a", """{"k":1}""")
      broker.publish("sensors/b", """{"k":2}""")
      val deadline = System.currentTimeMillis() + 60000
      def rows() = spark.table("mqtt_raw").count()
      while (rows() < 2 && System.currentTimeMillis() < deadline) Thread.sleep(250)
      val got = spark.table("mqtt_raw")
        .select("topic", "value").as[(String, String)].collect().sorted
      assert(got.toSeq == Seq(
        ("sensors/a", """{"k":1}"""), ("sensors/b", """{"k":2}""")))
    } finally {
      q.stop()
      broker.close()
    }
  }
}
