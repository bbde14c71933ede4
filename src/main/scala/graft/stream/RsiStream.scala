package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming RSI per user — the live form of the batch `window_rsi`
  * ([[graft.ops.Windows.windowRsi]]): the 14-diff relative-strength read
  * a monitor holds AT ARRIVAL, which is exactly the trailing frame the
  * batch operator reconstructs after the fact — so the two must agree
  * row for row. Completes the ring-state twin tier next to
  * [[BollingerStream]] (band breakouts) and the fold twins
  * ([[MacdStream]] / [[HoltStream]]): RSI's window is over DIFFS, so the
  * state is the last-diff ring PLUS the previous reading that the next
  * diff needs.
  *
  * Keyed state: previous cents + an n-slot ring of signed cent diffs —
  * 8(n+1)+16 bytes per user, TTL-evicted, O(1) in event rate. All
  * integer until the single output divide, which is the batch chain
  * verbatim (100·g/(g+l) on exact integer gain/loss sums) — so the
  * emitted rsi doubles are bit-identical to the batch operator's. A row
  * is emitted once n diffs precede it (the batch's count(d)-in-frame
  * = n filter), with the diff ring matching the batch frame exactly.
  * In-event-time-order streams land identical rows for ANY micro-batch
  * boundaries (rows re-sorted by (ts, event_id) inside each batch;
  * cross-batch order is the stream contract, as [[BollingerStream]]) —
  * `RsiStreamSpec` proves equality against the batch operator at every
  * split. */
object RsiStream {

  /** Stream input: user, event-time micros, event id, reading in cents. */
  case class Reading(user: Long, ts_us: Long, event_id: Long, cents: Long)

  /** One output row per reading with a full diff window — the batch
    * row's (gain_cents, loss_cents, rsi) at this reading. rsi is None
    * on an all-flat window (g + l = 0), the batch operator's null. */
  case class RsiRow(user: Long, ts_us: Long, event_id: Long,
                    gain_cents: Long, loss_cents: Long, rsi: Option[Double])

  private[graft] def ser(prev: Long, hasPrev: Boolean, ring: Array[Long],
                         filled: Int, pos: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * ring.length + 17)
    bb.putLong(prev); bb.put(if (hasPrev) 1.toByte else 0.toByte)
    bb.putInt(filled); bb.putInt(pos)
    ring.foreach(bb.putLong)
    bb.array()
  }

  private[graft] def deser(b: Array[Byte], n: Int): (Long, Boolean, Array[Long], Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val prev = bb.getLong; val hasPrev = bb.get() == 1.toByte
    val filled = bb.getInt; val pos = bb.getInt
    val ring = Array.fill(n)(bb.getLong)
    (prev, hasPrev, ring, filled, pos)
  }

  class Processor(n: Int, ttlMs: Long)
    extends StatefulProcessor[Long, Reading, RsiRow] {

    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("rsi",
        Encoders.BINARY, TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(user: Long, rows: Iterator[Reading],
                                 timers: TimerValues): Iterator[RsiRow] = {
      val sorted = rows.toArray.sortBy(r => (r.ts_us, r.event_id))
      var (prev, hasPrev, ring, filled, pos) =
        if (st.exists()) deser(st.get(), n)
        else (0L, false, new Array[Long](n), 0, 0)
      val out = scala.collection.mutable.ArrayBuffer.empty[RsiRow]
      sorted.foreach { r =>
        if (hasPrev) {
          ring(pos) = r.cents - prev
          pos = (pos + 1) % n
          if (filled < n) filled += 1
          if (filled == n) {
            var g = 0L; var l = 0L; var i = 0
            while (i < n) {
              if (ring(i) > 0) g += ring(i) else l -= ring(i)
              i += 1
            }
            // the batch chain verbatim: 100·g/(g+l) on the exact sums
            val rsi = if (g + l > 0)
              Some(100.0 * g.toDouble / (g + l).toDouble) else None
            out += RsiRow(user, r.ts_us, r.event_id, g, l, rsi)
          }
        }
        prev = r.cents; hasPrev = true
      }
      st.update(ser(prev, hasPrev, ring, filled, pos))
      out.iterator
    }
  }

  /** (user, ts, id, cents) stream → RSI rows once the diff window fills.
    * Requires the RocksDB state store provider, as [[BollingerStream]]. */
  def rsiStream(readings: Dataset[Reading], n: Int = 14,
                ttlMs: Long = 60L * 60 * 1000): Dataset[RsiRow] = {
    val spark = readings.sparkSession
    import spark.implicits._
    readings.groupByKey(_.user)
      .transformWithState(new Processor(n, ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
