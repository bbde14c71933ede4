package graft.sources

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

/** PARTITIONED streaming ingest: a fleet of MQTT gateways as one source
  * (r10 — the 100 TB ingest story the single-gateway `graft-mqtt` source
  * deliberately does not claim).
  *
  * `spark.readStream.format("graft-mqtt-fleet")
  *   .option("gateways", "hostA:1883,hostB:1883,...")
  *   .option("topic", "msh/#").load()`
  * yields `(gateway STRING, seq LONG, topic STRING, value STRING,
  * arrival TIMESTAMP)`.
  *
  * The reference's deployment is several radio gateways feeding one broker
  * (`AIRWISEv0.py:365-375` subscribes to the merged feed); at fleet scale
  * the merged feed is the bottleneck AND an ordering lie — MQTT only
  * orders per connection. This source keeps the contract honest the way
  * Kafka does:
  *
  *  - **Vector offsets** — the offset is a per-gateway message-count map
  *    (canonical JSON `{"0":12,"1":7,...}`), the `KafkaSourceOffset`
  *    shape: progress, commit, and restart are tracked per partition, so
  *    one slow gateway never stalls or skews the others' bookkeeping.
  *  - **One `InputPartition` per gateway** — each micro-batch plans N
  *    independent partitions, so deserialization/parse work downstream
  *    runs gateway-parallel on executors, and row order WITHIN a
  *    partition is the gateway's own publish order (the only order MQTT
  *    defines). `seq` is the per-gateway absolute message index — the
  *    Kafka-offset analog a consumer needs for dedup/gap accounting.
  *  - **Per-gateway isolation** — each gateway rides its own reconnecting
  *    [[MqttSubscriber]] (r9 backoff contract): one flaky gateway heals
  *    or dies alone; the rest keep streaming.
  *
  * Like the single-gateway source this is NOT replayable (QoS-0, counts
  * restart with a connection): exactly-once comes from the
  * epoch-idempotent sinks ([[graft.stream.Ingest.writeEpochParquet]]),
  * and `seq` gaps after a reconnect are the documented loss accounting.
  * At lake scale the same five-column contract maps 1:1 onto a
  * partitioned log (gateway → topic-partition, seq → offset) — the
  * downstream plan ([[graft.stream.Ingest.parseEnvelope]] on `value`)
  * is transport-agnostic and identical across all sources (SURVEY §7.3).
  */
class MqttFleetSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-mqtt-fleet"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MqttFleetSourceProvider.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MqttFleetTable(new CaseInsensitiveStringMap(properties))
}

object MqttFleetSourceProvider {
  val SCHEMA: StructType = StructType(Seq(
    StructField("gateway", StringType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("value", StringType, nullable = false),
    StructField("arrival", TimestampType, nullable = false)))

  /** Parse `"hostA:1883,hostB:1884"` into (host, port) pairs. */
  def parseGateways(spec: String): Seq[(String, Int)] = {
    val gws = spec.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { g =>
      val i = g.lastIndexOf(':')
      require(i > 0 && i < g.length - 1, s"mqtt-fleet: bad gateway '$g' (want host:port)")
      (g.substring(0, i), g.substring(i + 1).toInt)
    }
    require(gws.nonEmpty, "mqtt-fleet: at least one gateway required")
    gws
  }
}

private[sources] class MqttFleetTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {
  override def name(): String =
    s"mqtt-fleet://${options.get("gateways")}/${options.get("topic")}"
  override def schema(): StructType = MqttFleetSourceProvider.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = MqttFleetSourceProvider.SCHEMA
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MqttFleetMicroBatchStream(
          MqttFleetSourceProvider.parseGateways(
            Option(options.get("gateways")).getOrElse(
              sys.error("mqtt-fleet: option 'gateways' is required"))),
          Option(options.get("topic")).getOrElse("#"),
          Option(options.get("clientid")).getOrElse(
            s"graft-fleet-${java.util.UUID.randomUUID().toString.take(8)}"))
    }
}

/** Vector (per-gateway) count offsets over N driver-side receive buffers,
  * each trimmed independently on commit — [[MqttMicroBatchStream]]'s state
  * machine lifted to the Kafka shape: Map[partition -> offset]. */
private[graft] class MqttFleetMicroBatchStream(gateways: Seq[(String, Int)],
                                                 topic: String, clientId: String)
  extends MicroBatchStream {
  import MqttFleetMicroBatchStream._

  private val n = gateways.size
  private val names: Array[String] = gateways.map { case (h, p) => s"$h:$p" }.toArray

  /** Per-gateway (topic, payload-utf8, arrival micros, seq) not yet committed. */
  @GuardedBy("this")
  private val buffers: Array[ListBuffer[(String, String, Long, Long)]] =
    Array.fill(n)(new ListBuffer)
  @GuardedBy("this")
  private val received: Array[Long] = Array.fill(n)(0L)
  @GuardedBy("this")
  private val committedBase: Array[Long] = Array.fill(n)(0L)

  // one reconnecting subscriber per gateway — independent failure domains
  private val clients: Seq[MqttSubscriber] = gateways.zipWithIndex.map {
    case ((host, port), i) =>
      new MqttSubscriber(host, port, topic, s"$clientId-$i",
        (t, payload) => synchronized {
          buffers(i) += ((t, new String(payload, UTF_8),
            System.currentTimeMillis() * 1000L, received(i)))
          received(i) += 1
        }, reconnect = true)
  }

  override def initialOffset(): Offset = FleetOffset(Array.fill(n)(0L))
  override def deserializeOffset(json: String): Offset = {
    val o = FleetOffset.fromJson(json)
    require(o.counts.length == n,
      s"mqtt-fleet: checkpoint offset has ${o.counts.length} gateways, source has $n")
    o
  }
  override def latestOffset(): Offset = synchronized { FleetOffset(received.clone()) }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val s = start.asInstanceOf[FleetOffset].counts
      val e = end.asInstanceOf[FleetOffset].counts
      (0 until n).flatMap { i =>
        // clamp per gateway (same non-replayable-restart caveat as the
        // single-gateway source): deliver what this connection holds
        val buf = buffers(i)
        val from = math.max(0L, math.min(s(i) - committedBase(i), buf.size.toLong)).toInt
        val until = math.max(0L, math.min(e(i) - committedBase(i), buf.size.toLong)).toInt
        if (until <= from) None
        else Some(MqttFleetInputPartition(names(i), buf.slice(from, until).toArray))
      }.toArray
    }

  override def createReaderFactory(): PartitionReaderFactory = new MqttFleetReaderFactory

  override def commit(end: Offset): Unit = synchronized {
    val upTo = end.asInstanceOf[FleetOffset].counts
    var i = 0
    while (i < n) {
      val drop = math.max(0L, math.min(upTo(i) - committedBase(i), buffers(i).size.toLong)).toInt
      buffers(i).remove(0, drop)
      committedBase(i) += drop
      i += 1
    }
  }

  override def stop(): Unit = clients.foreach(_.close())
}

private[graft] object MqttFleetMicroBatchStream {
  /** Per-gateway count vector; canonical JSON keyed by gateway index. */
  final case class FleetOffset(counts: Array[Long]) extends Offset {
    override def json(): String =
      counts.zipWithIndex.map { case (c, i) => s""""$i":$c""" }
        .mkString("{", ",", "}")
  }
  object FleetOffset {
    private val Entry = """"(\d+)":(\d+)""".r
    def fromJson(json: String): FleetOffset = {
      val pairs = Entry.findAllMatchIn(json)
        .map(m => (m.group(1).toInt, m.group(2).toLong)).toSeq
      require(pairs.nonEmpty || json.replaceAll("\\s", "") == "{}",
        s"mqtt-fleet: unparseable offset '$json'")
      val counts = Array.fill(if (pairs.isEmpty) 0 else pairs.map(_._1).max + 1)(0L)
      pairs.foreach { case (i, c) => counts(i) = c }
      FleetOffset(counts)
    }
  }
}

private[graft] case class MqttFleetInputPartition(
    gateway: String, rows: Array[(String, String, Long, Long)])
  extends InputPartition

private[sources] class MqttFleetReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MqttFleetInputPartition]
    val gw = UTF8String.fromString(p.gateway)
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.rows.length }
      override def get(): InternalRow = {
        val (t, v, us, seq) = p.rows(i)
        new GenericInternalRow(Array[Any](
          gw, seq, UTF8String.fromString(t), UTF8String.fromString(v), us))
      }
      override def close(): Unit = ()
    }
  }
}
