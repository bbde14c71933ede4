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

  /** Deployment sink: HTTP POST per transition — the Spark form of the
    * reference's ntfy publisher (AIRWISEv0.py:51-68: requests.post with a
    * Title header and the label as the body). One connection per delivery
    * is the right shape here: the upstream latch makes alerts rare by
    * construction. A non-2xx/3xx response throws, so a failed delivery
    * fails the epoch and is retried by the stream (at-least-once). */
  class HttpAlertSink(url: String, title: String = "graft-alert",
                      connectTimeoutMs: Int = 5000,
                      readTimeoutMs: Int = 5000) extends AlertSink {
    def deliver(e: NodeEvent): Unit = {
      val conn = java.net.URI.create(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        conn.setRequestProperty("Title", title)
        conn.setRequestProperty("Content-Type", "text/plain; charset=utf-8")
        val os = conn.getOutputStream
        try os.write(label(e).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally os.close()
        val code = conn.getResponseCode
        if (code >= 400)
          throw new java.io.IOException(s"alert POST to $url failed: HTTP $code")
      } finally conn.disconnect()
    }
  }

  /** Format the human-readable alert label (AIRWISEv0.py:54-56). */
  def label(e: NodeEvent): String =
    s"node ${e.node} is ${e.event} (at ${e.at_ms} ms)"

  /** Wire a NodeEvent stream to a sink. The per-epoch batch is tiny by
    * construction (edge-triggered transitions only), so delivering from
    * the driver is the right shape — the same place the reference did its
    * single-threaded HTTP POST, but batched per epoch.
    *
    * r8 hardening (verdict #7): the collect is CAPPED. A misconfigured
    * threshold at fleet scale can turn one epoch's "transitions" into the
    * whole fleet — an unbounded `collect()` then sizes the alert set to
    * the driver heap, and a pager flood helps nobody anyway. Each epoch
    * delivers the first `maxPerEpoch` events in deterministic
    * (at_ms, node, event) order, then ONE synthetic summary event
    * (`node = -1, event = "suppressed <K> more alerts"`), so the
    * receiving channel still learns the true magnitude. The count and
    * the limited collect are two jobs over the same tiny frame; the
    * limit bounds driver memory no matter what upstream does. */
  def deliverStream(events: Dataset[NodeEvent], sink: AlertSink,
                    checkpoint: String,
                    maxPerEpoch: Int = 1000): StreamingQuery = {
    // r9 (ADVICE): maxPerEpoch <= 0 would make `head` empty while
    // total > 0, and the summary event's head.last would throw
    // NoSuchElementException — turning the flood-cap safety valve into a
    // stream-killing crash on a misconfigured cap. Reject it up front.
    require(maxPerEpoch >= 1,
      s"maxPerEpoch must be >= 1 (got $maxPerEpoch); a zero or negative " +
        "cap would suppress every alert and crash the summary event")
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[NodeEvent], _: Long) =>
        import org.apache.spark.sql.functions.col
        val total = batch.count()
        val head = batch
          .orderBy(col("at_ms"), col("node"), col("event"))
          .limit(maxPerEpoch).collect()
        head.foreach(sink.deliver)
        if (total > maxPerEpoch)
          sink.deliver(NodeEvent(-1L,
            s"suppressed ${total - maxPerEpoch} more alerts",
            head.last.at_ms))
      }
      .start()
  }
}
