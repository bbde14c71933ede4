package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming Supertrend monitor per event class — the live twin of the
  * batch state-machine fold in [[graft.ops.Windows.windowSupertrend]]
  * (r10; template: [[HoltStream]] / [[ThetaStream]]). This is the first
  * twin whose state is a full REGIME MACHINE rather than a smoother: the
  * ATR-adaptive trailing stop flips sides live, so the emitted stream is
  * the regime feed (direction + bands + flip count) an alerting layer
  * subscribes to, while the batch form is the end-of-window audit.
  *
  * The state is the batch fold's accumulator verbatim — (prev close,
  * running-Wilder ATR, ratcheted final upper/lower bands, direction,
  * flip count) — and every update replays the batch lambda's textual
  * IEEE chain op for op:
  *
  *   tr  = greatest(h−l, |h−pc|, |l−pc|)       (exact integer doubles)
  *   atr′ = atr − atr/14 + tr                   (running Wilder, seed 0)
  *   bands = (h+l)/2 ± 3·atr′, ratcheted only while price respects them
  *   flip on STRICT close-beyond-band, direction negates, count++.
  *
  * Input is one CLOSED class-hour bar (h, l, cl in integer cents — the
  * batch's own `classHourBarsV` quantization). 64 bytes of state per
  * class, TTL-evicted. Same observed-series contract as the other
  * twins: gaps fold nothing; out-of-contract bars (hu ≤ last folded:
  * late, duplicate, replayed) re-emit the current machine state
  * untouched (idempotent — the shared r9 ADVICE guard).
  * `SupertrendStreamSpec` proves the emitted machine equals the batch
  * fold over every prefix across micro-batch splits, bit for bit. */
object SupertrendStream {

  /** One closed class-hour bar, integer cents. */
  case class HourBar(cls: String, hu: Long, h: Long, l: Long, cl: Long)

  /** Post-update machine state, emitted per input bar — the batch
    * dual's output columns at this prefix. */
  case class SupertrendRow(cls: String, hu: Long, n_bars: Long,
                           atr_wilder: Double, final_upper: Double,
                           final_lower: Double, direction: Long,
                           n_flips: Long)

  private[stream] def ser(t: Long, pc: Double, atr: Double, fu: Double,
                          fl: Double, dir: Double, flips: Long,
                          lastHu: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64)
    bb.putLong(t); bb.putDouble(pc); bb.putDouble(atr); bb.putDouble(fu)
    bb.putDouble(fl); bb.putDouble(dir); bb.putLong(flips); bb.putLong(lastHu)
    bb.array()
  }

  private[stream] def deser(bs: Array[Byte]): (Long, Double, Double, Double, Double, Double, Long, Long) = {
    val bb = java.nio.ByteBuffer.wrap(bs)
    (bb.getLong, bb.getDouble, bb.getDouble, bb.getDouble, bb.getDouble,
      bb.getDouble, bb.getLong, bb.getLong)
  }

  class Processor(ttlMs: Long)
    extends StatefulProcessor[String, HourBar, SupertrendRow] {

    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("supertrend",
        Encoders.BINARY, TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(cls: String, rows: Iterator[HourBar],
                                 timers: TimerValues): Iterator[SupertrendRow] = {
      val sorted = rows.toArray.sortBy(_.hu)
      var (t, pc, atr, fu, fl, dir, flips, lastHu) =
        if (st.exists()) deser(st.get())
        else (0L, 0.0, 0.0, 0.0, 0.0, 1.0, 0L, -1L)
      val out = scala.collection.mutable.ArrayBuffer.empty[SupertrendRow]

      // one fold step: the batch lambda's textual IEEE chain verbatim
      def step(b: HourBar): Unit = {
        val bh = b.h.toDouble; val bl = b.l.toDouble; val bc = b.cl.toDouble
        if (t == 0L) {
          pc = bc; atr = 0.0
          fu = (b.h + b.l).toDouble / 2.0; fl = fu
          dir = 1.0; flips = 0L
        } else {
          val tr = math.max(math.max((b.h - b.l).toDouble,
            math.abs(bh - pc)), math.abs(bl - pc))
          val at = atr - atr / 14.0 + tr
          val hl2 = (bh + bl) / 2.0
          val bu = hl2 + 3.0 * at
          val bo = hl2 - 3.0 * at
          val fuN = if (bu < fu || pc > fu) bu else fu
          val flN = if (bo > fl || pc < fl) bo else fl
          val flip = if (dir > 0.0) bc < flN else bc > fuN
          pc = bc; atr = at; fu = fuN; fl = flN
          if (flip) { dir = -dir; flips += 1L }
        }
        t += 1L
      }

      def emit(hu: Long): Unit =
        out += SupertrendRow(cls, hu, t, atr / 100.0, fu / 100.0, fl / 100.0,
          dir.toLong, flips)

      sorted.foreach { b =>
        if (lastHu >= 0 && b.hu <= lastHu) {
          emit(b.hu) // out-of-contract: idempotent re-emit, no fold
        } else {
          step(b)
          lastHu = b.hu
          emit(b.hu)
        }
      }
      st.update(ser(t, pc, atr, fu, fl, dir, flips, lastHu))
      out.iterator
    }
  }

  /** (class, hour-bar) stream → live Supertrend machine state.
    * Requires the RocksDB state store provider, as [[MacdStream]]. */
  def supertrendStream(bars: Dataset[HourBar],
                       ttlMs: Long = 24L * 60 * 60 * 1000): Dataset[SupertrendRow] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars.groupByKey(_.cls)
      .transformWithState(new Processor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
