package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.stream.Heartbeat.Packet

/** Per-key ingest rate limiting — the protection valve in front of every
  * shared ingest path (the reference ingests whatever the radio delivers,
  * AIRWISEv0.py:365-375; one chatty node can starve the pipeline). Each
  * key gets an event-time token bucket: at most `maxPerWindow` rows per
  * `windowMs` window of DEVICE time, admission in arrival order, the
  * rest flagged (not silently dropped — the decision rides on the row, so
  * downstream chooses drop vs. dead-letter, and drop totals stay
  * observable).
  *
  * State is ONE (window, used) pair per key — O(keys), not O(rate) — with
  * native TTL eviction for keys that go quiet ([[RunningStats]] pattern).
  * Window identity comes from event time so behavior is replay-stable; a
  * row from an OLDER window than the current bucket restarts the bucket
  * (bounded state beats perfect out-of-order fairness here — the
  * watermark-bounded multi-window form is [[StreamDedup]]'s territory).
  */
object Throttle {

  case class BucketState(window: Long, used: Long)

  /** Input row + the admission verdict. */
  case class ThrottleRow(node: Long, ts_ms: Long, admitted: Boolean)

  class Processor(maxPerWindow: Int, windowMs: Long, ttlMs: Long)
    extends StatefulProcessor[Long, Packet, ThrottleRow] {

    @transient private var bucket: ValueState[BucketState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bucket = getHandle.getValueState[BucketState]("bucket",
        Encoders.product[BucketState], TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(node: Long, rows: Iterator[Packet],
                                 timers: TimerValues): Iterator[ThrottleRow] = {
      var cur = if (bucket.exists()) bucket.get() else BucketState(Long.MinValue, 0L)
      val out = rows.map { p =>
        val w = Math.floorDiv(p.ts_ms, windowMs)
        if (w != cur.window) cur = BucketState(w, 0L)
        val admit = cur.used < maxPerWindow
        if (admit) cur = cur.copy(used = cur.used + 1)
        ThrottleRow(node, p.ts_ms, admit)
      }.toVector // materialize before the state write below
      bucket.update(cur)
      out.iterator
    }
  }

  /** Packets stream → same rows with per-(key, event-time window)
    * admission flags. Requires the RocksDB state store provider. */
  def rateLimit(packets: Dataset[Packet], maxPerWindow: Int = 100,
                windowMs: Long = 60000L,
                ttlMs: Long = 60L * 60 * 1000): Dataset[ThrottleRow] = {
    val spark = packets.sparkSession
    import spark.implicits._
    packets.groupByKey(_.node)
      .transformWithState(new Processor(maxPerWindow, windowMs, ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
