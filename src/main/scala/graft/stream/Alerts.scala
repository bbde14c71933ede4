package graft.stream

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.stream.Heartbeat.NodeEvent

/** T6: alert delivery side-effect (the reference's ntfy HTTP POST,
  * AIRWISEv0.py:51-68) as a pluggable foreachBatch sink. Tests plug a
  * collecting sink; deployment plugs an HTTP poster. Delivery is
  * at-least-once per epoch — the edge-triggered latch upstream
  * (Heartbeat) already bounds alert volume per episode. */
object Alerts {

  /** Delivery target — implementations must be serializable (executed on
    * the driver inside foreachBatch after a collect of the tiny alert
    * batch; alert streams are low-volume by construction). */
  trait AlertSink extends Serializable {
    def deliver(event: NodeEvent): Unit
  }

  /** Driver-side collecting sink for tests/console. */
  class MemorySink extends AlertSink {
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[NodeEvent]()
    def deliver(e: NodeEvent): Unit = { delivered.add(e); () }
  }

  /** Format the human-readable alert label (AIRWISEv0.py:54-56). */
  def label(e: NodeEvent): String =
    s"node ${e.node} is ${e.event} (at ${e.at_ms} ms)"

  /** Wire a NodeEvent stream to a sink. The per-epoch batch is tiny
    * (transitions only), so collect-to-driver is the right shape — the
    * same place the reference did its single-threaded HTTP POST, but
    * batched per epoch. */
  def deliverStream(events: Dataset[NodeEvent], sink: AlertSink,
                    checkpoint: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[NodeEvent], _: Long) =>
        batch.collect().foreach(sink.deliver)
      }
      .start()
}
