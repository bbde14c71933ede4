package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.util
import javax.annotation.concurrent.GuardedBy

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** MQTT 3.1.1 wire codec — the minimal packet set a telemetry subscriber
  * needs (CONNECT/CONNACK, SUBSCRIBE/SUBACK, QoS-0 PUBLISH, PING, DISCONNECT),
  * encoded straight from the public OASIS MQTT 3.1.1 spec. Shared by the
  * [[MqttSubscriber]] client and the test-scope mini-broker, so the spec
  * exercises both directions of the same codec.
  *
  * This is the reference's ACTUAL entry-point transport
  * (AIRWISEv0.py:365-375 — paho `client.connect(...)`+`loop_forever()`);
  * zero-egress means no broker-client jar can be vendored, and the protocol
  * is small enough that a dependency would be the heavier choice. */
object MqttCodec {
  // packet types (spec §2.2.1)
  val CONNECT = 1; val CONNACK = 2; val PUBLISH = 3
  val SUBSCRIBE = 8; val SUBACK = 9
  val PINGREQ = 12; val PINGRESP = 13; val DISCONNECT = 14

  /** One decoded fixed-header packet: type, flags, body bytes. */
  final case class Packet(ptype: Int, flags: Int, body: Array[Byte])

  /** Remaining-length varint (spec §2.2.3): 7 bits per byte, MSB continues. */
  def writeRemainingLength(out: OutputStream, n0: Int): Unit = {
    var n = n0
    do {
      val b = n % 128; n /= 128
      out.write(if (n > 0) b | 0x80 else b)
    } while (n > 0)
  }

  def readRemainingLength(in: InputStream): Int = {
    var mult = 1; var value = 0; var b = 0
    do {
      b = in.read()
      if (b < 0) throw new EOFException("mqtt: EOF in remaining length")
      value += (b & 0x7f) * mult
      mult *= 128
      if (mult > 128 * 128 * 128 * 128) sys.error("mqtt: malformed remaining length")
    } while ((b & 0x80) != 0)
    value
  }

  /** Length-prefixed UTF-8 string (spec §1.5.3). */
  def utf8(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8)
    require(b.length <= 0xffff, "mqtt: string too long")
    Array[Byte]((b.length >> 8).toByte, (b.length & 0xff).toByte) ++ b
  }

  def writePacket(out: OutputStream, ptype: Int, flags: Int, body: Array[Byte]): Unit =
    out.synchronized {
      out.write((ptype << 4) | (flags & 0x0f))
      writeRemainingLength(out, body.length)
      out.write(body)
      out.flush()
    }

  def readPacket(in: DataInputStream): Packet = {
    val h = in.read()
    if (h < 0) throw new EOFException("mqtt: connection closed")
    val len = readRemainingLength(in)
    val body = new Array[Byte](len)
    in.readFully(body)
    Packet(h >> 4, h & 0x0f, body)
  }

  def connectBody(clientId: String, keepAliveSec: Int): Array[Byte] =
    utf8("MQTT") ++ Array[Byte](4 /* protocol level 3.1.1 */ ,
      0x02 /* clean session */ ,
      (keepAliveSec >> 8).toByte, (keepAliveSec & 0xff).toByte) ++ utf8(clientId)

  def subscribeBody(packetId: Int, topicFilter: String): Array[Byte] =
    Array[Byte]((packetId >> 8).toByte, (packetId & 0xff).toByte) ++
      utf8(topicFilter) ++ Array[Byte](0 /* QoS 0 */)

  /** QoS-0 PUBLISH: variable header is just the topic (no packet id). */
  def publishBody(topic: String, payload: Array[Byte]): Array[Byte] =
    utf8(topic) ++ payload

  /** Decode a QoS-0 PUBLISH body into (topic, payload). */
  def decodePublish(body: Array[Byte]): (String, Array[Byte]) = {
    val tl = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
    val topic = new String(body, 2, tl, UTF_8)
    (topic, util.Arrays.copyOfRange(body, 2 + tl, body.length))
  }
}

/** Blocking MQTT 3.1.1 subscriber over a plain JDK socket: CONNECT,
  * SUBSCRIBE (QoS 0), then a daemon read loop delivering each PUBLISH to
  * `onMessage`. Keep-alive 0 = disabled (spec §3.1.2.10), so no ping
  * scheduling is needed; brokers that require liveness get PINGRESP echoed
  * if they probe.
  *
  * r9 hardening (verdict #8 — the reference's resilience is a systemd
  * restart loop around its single client, `AIRWISEv0.py:365-375`; this
  * subscriber now carries the same contract in-process):
  *
  *  - **First connect is synchronous and loud**: an unreachable broker or
  *    a refused CONNACK (rc 1–5: bad credentials, not authorized, …)
  *    throws to the CALLER — misconfiguration must fail the job start,
  *    never retry silently in a daemon thread.
  *  - **Mid-stream disconnects reconnect with exponential backoff**
  *    (`reconnect = true`): on EOF / socket error the reader redoes the
  *    full CONNECT/SUBSCRIBE handshake after `baseBackoffMs`, doubling up
  *    to `maxBackoffMs` (systemd's RestartSec, capped), resetting after a
  *    successful handshake; `maxReconnects` consecutive failures end the
  *    stream (observable via [[isRunning]]). QoS-0 messages published
  *    during the gap are lost — exactly the reference's gap semantics,
  *    and why the epoch-idempotent sinks, not source replay, own
  *    delivery guarantees.
  *  - [[reconnectCount]] counts successful re-handshakes (spec + metric
  *    observability). */
final class MqttSubscriber(host: String, port: Int, topicFilter: String,
                           clientId: String,
                           onMessage: (String, Array[Byte]) => Unit,
                           reconnect: Boolean = false,
                           baseBackoffMs: Long = 200L,
                           maxBackoffMs: Long = 30000L,
                           maxReconnects: Int = Int.MaxValue) {
  import MqttCodec._

  @volatile private var closed = false
  @volatile private var socket: Socket = _
  @volatile private var out: DataOutputStream = _
  @volatile private var reconnectsDone = 0

  /** Successful re-handshakes since start (0 on a healthy connection). */
  def reconnectCount: Int = reconnectsDone

  /** Full connect: socket + CONNECT/CONNACK + SUBSCRIBE/SUBACK. Throws on
    * refusal; on success swaps the live socket/out and returns the input.
    * The handshake reads run under a socket timeout so a gateway that
    * accepts TCP but never speaks MQTT fails loudly instead of hanging the
    * caller forever (blocking socket reads ignore interrupts — without the
    * timeout a silent endpoint wedges the constructor, and in the fleet
    * source one wedged gateway would block the whole stream). Steady-state
    * reads then revert to no timeout: keepAlive=0 means an idle-but-healthy
    * connection may legitimately stay silent indefinitely. */
  private def connect(): DataInputStream = {
    val s = new Socket(host, port)
    try {
      s.setSoTimeout(MqttSubscriber.HandshakeTimeoutMs)
      val i = new DataInputStream(new BufferedInputStream(s.getInputStream))
      val o = new DataOutputStream(new BufferedOutputStream(s.getOutputStream))
      writePacket(o, CONNECT, 0, connectBody(clientId, keepAliveSec = 0))
      val ack = readPacket(i)
      require(ack.ptype == CONNACK && ack.body(1) == 0,
        s"mqtt: CONNACK refused (rc=${if (ack.body.length > 1) ack.body(1) else -1})")
      writePacket(o, SUBSCRIBE, 0x2, subscribeBody(1, topicFilter))
      val sack = readPacket(i)
      require(sack.ptype == SUBACK && (sack.body(2) & 0xff) <= 2, "mqtt: SUBACK refused")
      s.setSoTimeout(0)
      socket = s; out = o
      i
    } catch { case e: Throwable =>
      try s.close() catch { case _: Throwable => () }
      throw e
    }
  }

  // first connect: synchronous, so refusal surfaces at the call site
  private val firstIn = connect()

  private val reader = new Thread(() => {
    var in = firstIn
    var live = true
    while (!closed && live) {
      try {
        while (!closed) {
          val p = readPacket(in)
          p.ptype match {
            case PUBLISH =>
              val (topic, payload) = decodePublish(p.body)
              onMessage(topic, payload)
            case PINGREQ => writePacket(out, PINGRESP, 0, Array.emptyByteArray)
            case _ => () // PINGRESP / unexpected: ignore
          }
        }
      } catch {
        case _: Throwable if closed => live = false // shutdown race
        case _: Throwable if !reconnect => live = false // legacy: stream ends
        case _: Throwable =>
          // mid-stream disconnect: backoff-and-rehandshake loop
          try socket.close() catch { case _: Throwable => () }
          var backoff = baseBackoffMs
          var attempts = 0
          var connected = false
          while (!closed && !connected && attempts < maxReconnects) {
            attempts += 1
            try Thread.sleep(backoff) catch { case _: InterruptedException => () }
            backoff = math.min(backoff * 2, maxBackoffMs)
            try {
              in = connect()
              connected = true
              reconnectsDone += 1
            } catch { case _: Throwable => () } // unreachable/refused: retry
          }
          if (!connected) live = false
      }
    }
  }, s"graft-mqtt-$clientId")
  reader.setDaemon(true)
  reader.start()

  /** False once the reader has given up (close() called, non-reconnecting
    * disconnect, or maxReconnects exhausted). */
  def isRunning: Boolean = reader.isAlive

  def close(): Unit = {
    closed = true
    try writePacket(out, DISCONNECT, 0, Array.emptyByteArray) catch { case _: Throwable => () }
    try socket.close() catch { case _: Throwable => () }
    reader.interrupt()
  }
}

object MqttSubscriber {
  /** Handshake-phase read timeout (CONNACK/SUBACK). Generous for a real
    * broker (the reference's mosquitto answers in ms); finite so a silent
    * TCP endpoint cannot wedge an uninterruptible blocking read. */
  val HandshakeTimeoutMs: Int = 30000
}

/** Structured Streaming MQTT source (DataSource V2 micro-batch).
  *
  * `spark.readStream.format("graft-mqtt").option("host", h).option("port", p)
  * .option("topic", "msh/#").load()` yields `(topic STRING, value STRING,
  * arrival TIMESTAMP)` — `value` is the payload decoded as UTF-8, so
  * [[graft.stream.Ingest.parseEnvelope]] consumes it unchanged and every
  * downstream transform is byte-identical to the socket/file/MemoryStream
  * paths (transport is the only thing that changes, SURVEY.md §7.3).
  *
  * Scale posture: the subscription lives on the DRIVER and rows ship to
  * executors inside the planned partitions — the same design as Spark's own
  * socket source, and the right one here: an MQTT subscription is a single
  * ordered gateway feed (the reference's whole ingest is one `loop_forever`
  * client), not a partitioned firehose. At lake scale the broker lands in
  * Kafka/object storage first and this source is the low-latency tap.
  * Like the socket source it is NOT replayable: offsets restart with the
  * connection, so exactly-once comes from the epoch-idempotent sinks
  * ([[graft.stream.Ingest.writeEpochParquet]]), not from source replay. */
class MqttSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-mqtt"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MqttSourceProvider.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MqttTable(new CaseInsensitiveStringMap(properties))
}

object MqttSourceProvider {
  val SCHEMA: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("value", StringType, nullable = false),
    StructField("arrival", TimestampType, nullable = false)))
}

private[sources] class MqttTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {
  override def name(): String =
    s"mqtt://${options.get("host")}:${options.get("port")}/${options.get("topic")}"
  override def schema(): StructType = MqttSourceProvider.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = MqttSourceProvider.SCHEMA
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MqttMicroBatchStream(
          Option(options.get("host")).getOrElse("localhost"),
          Option(options.get("port")).fold(1883)(_.toInt),
          Option(options.get("topic")).getOrElse("#"),
          Option(options.get("clientid")).getOrElse(
            s"graft-${java.util.UUID.randomUUID().toString.take(8)}"))
    }
}

/** Count-based offsets over a driver-side receive buffer, trimmed on
  * commit — the TextSocketMicroBatchStream state machine re-derived for an
  * MQTT subscription. */
private[sources] class MqttMicroBatchStream(host: String, port: Int,
                                            topic: String, clientId: String)
  extends MicroBatchStream {

  private case class MqttOffset(n: Long) extends Offset {
    override def json(): String = n.toString
  }

  /** (topic, payload-utf8, arrival micros) triples not yet committed. */
  @GuardedBy("this")
  private val buffer = new ListBuffer[(String, String, Long)]
  @GuardedBy("this")
  private var received = 0L     // total messages ever received
  @GuardedBy("this")
  private var committedBase = 0L // messages trimmed from the buffer head

  // r9: the streaming source rides the reconnecting subscriber — a broker
  // blip heals in-process with backoff (the reference's systemd-restart
  // semantics); the count-based offsets are connection-agnostic, and gap
  // loss is the documented QoS-0 contract
  private val client = new MqttSubscriber(host, port, topic, clientId,
    (t, payload) => synchronized {
      buffer += ((t, new String(payload, UTF_8), System.currentTimeMillis() * 1000L))
      received += 1
    }, reconnect = true)

  override def initialOffset(): Offset = MqttOffset(0L)
  override def deserializeOffset(json: String): Offset = MqttOffset(json.toLong)
  override def latestOffset(): Offset = synchronized { MqttOffset(received) }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val s = start.asInstanceOf[MqttOffset].n
      val e = end.asInstanceOf[MqttOffset].n
      // clamp defensively: a restart from a checkpoint of a previous
      // connection may reference offsets this (non-replayable) connection
      // never saw — deliver what exists rather than throw (socket-source
      // caveat, documented on the provider)
      val from = math.max(0L, math.min(s - committedBase, buffer.size.toLong)).toInt
      val until = math.max(0L, math.min(e - committedBase, buffer.size.toLong)).toInt
      if (until <= from) Array.empty
      else Array(MqttInputPartition(buffer.slice(from, until).toArray))
    }

  override def createReaderFactory(): PartitionReaderFactory = new MqttReaderFactory

  override def commit(end: Offset): Unit = synchronized {
    val upTo = end.asInstanceOf[MqttOffset].n
    val drop = math.max(0L, math.min(upTo - committedBase, buffer.size.toLong)).toInt
    buffer.remove(0, drop)
    committedBase += drop
  }

  override def stop(): Unit = client.close()
}

private[sources] case class MqttInputPartition(rows: Array[(String, String, Long)])
  extends InputPartition

private[sources] class MqttReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[MqttInputPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val (t, v, us) = rows(i)
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(t), UTF8String.fromString(v), us))
      }
      override def close(): Unit = ()
    }
  }
}
