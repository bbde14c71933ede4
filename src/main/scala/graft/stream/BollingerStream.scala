package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming Bollinger breakout screen per user — the live form of the
  * batch `window_bollinger` ([[graft.ops.Windows.windowBollinger]]): flag
  * a reading outside mean ± 2σ of the PRIOR n same-user readings, at
  * arrival time — which is exactly the band the batch operator
  * reconstructs after the fact, so the two must agree row for row.
  * Keyed state is one n-slot ring of integer cents (plus fill count) —
  * 8n+16 bytes per user, TTL-evicted. The predicate is the batch
  * operator's integer algebra verbatim: with prior-window sums S₁, S₂,
  * |v−μ| > 2σ ⟺ (n·c−S₁)² > 4(n·S₂−S₁²) — no floating point in state,
  * predicate, or output (the display mean stays the raw S₁ so the spec
  * can reproduce the batch's divide chain exactly). In-event-time-order
  * streams land identical breakouts for ANY micro-batch boundaries
  * (rows re-sorted by (ts, event_id) inside each batch; cross-batch
  * order is the stream contract, as [[DrawdownStream]]) —
  * `BollingerStreamSpec` proves it against the batch operator. */
object BollingerStream {

  /** Stream input: user, event-time micros, event id, reading in cents. */
  case class Reading(user: Long, ts_us: Long, event_id: Long, cents: Long)

  /** One output row per BREAKOUT (the screen's output is its alerts):
    * the reading, the prior-window sum S₁ (exact integer — mean =
    * s1/n/100 at the edge), and the side. */
  case class BreakoutRow(user: Long, ts_us: Long, event_id: Long,
                         cents: Long, s1: Long, side: String)

  private[stream] def ser(ring: Array[Long], filled: Int, pos: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * ring.length + 8)
    bb.putInt(filled); bb.putInt(pos)
    ring.foreach(bb.putLong)
    bb.array()
  }

  private[stream] def deser(b: Array[Byte], n: Int): (Array[Long], Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val filled = bb.getInt; val pos = bb.getInt
    val ring = Array.fill(n)(bb.getLong)
    (ring, filled, pos)
  }

  class Processor(n: Int, ttlMs: Long)
    extends StatefulProcessor[Long, Reading, BreakoutRow] {

    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("ring",
        Encoders.BINARY, TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(user: Long, rows: Iterator[Reading],
                                 timers: TimerValues): Iterator[BreakoutRow] = {
      val sorted = rows.toArray.sortBy(r => (r.ts_us, r.event_id))
      var (ring, filled, pos) =
        if (st.exists()) deser(st.get(), n) else (new Array[Long](n), 0, 0)
      val out = scala.collection.mutable.ArrayBuffer.empty[BreakoutRow]
      sorted.foreach { r =>
        if (filled == n) {
          var s1 = 0L; var s2 = java.math.BigInteger.ZERO
          var i = 0
          while (i < n) {
            s1 += ring(i)
            s2 = s2.add(java.math.BigInteger.valueOf(ring(i))
              .multiply(java.math.BigInteger.valueOf(ring(i))))
            i += 1
          }
          // (n·c − S₁)² > 4(n·S₂ − S₁²), all exact integers
          val nB = java.math.BigInteger.valueOf(n.toLong)
          val dev = nB.multiply(java.math.BigInteger.valueOf(r.cents))
            .subtract(java.math.BigInteger.valueOf(s1))
          val s1B = java.math.BigInteger.valueOf(s1)
          val var4 = java.math.BigInteger.valueOf(4L)
            .multiply(nB.multiply(s2).subtract(s1B.multiply(s1B)))
          if (dev.multiply(dev).compareTo(var4) > 0)
            out += BreakoutRow(user, r.ts_us, r.event_id, r.cents, s1,
              if (dev.signum > 0) "above" else "below")
        }
        ring(pos) = r.cents
        pos = (pos + 1) % n
        if (filled < n) filled += 1
      }
      st.update(ser(ring, filled, pos))
      out.iterator
    }
  }

  /** (user, ts, id, cents) stream → breakout alerts. Requires the RocksDB
    * state store provider, as [[DistinctStats]]. */
  def bollingerStream(readings: Dataset[Reading], n: Int = 24,
                      ttlMs: Long = 60L * 60 * 1000): Dataset[BreakoutRow] = {
    val spark = readings.sparkSession
    import spark.implicits._
    readings.groupByKey(_.user)
      .transformWithState(new Processor(n, ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
