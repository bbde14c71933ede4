package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming Wilder directional system (ADX) per event class — the live
  * twin of the batch fold in [[graft.ops.Windows.windowAdx]] (r10b;
  * template: [[SupertrendStream]]). The regime DIAL next to the regime
  * MACHINE: Supertrend's twin says which side the trailing stop is on,
  * this one says whether there is enough directional energy to trust any
  * trend-following read at all (low ADX = oscillator regime, high ADX =
  * breakout regime) — the standard live switch in front of the other
  * indicator feeds.
  *
  * State is the batch fold's 7-slot accumulator verbatim — (prev high,
  * prev low, prev close, smoothed TR, smoothed +DM, smoothed −DM, ADX) —
  * and every update replays the batch lambda's textual IEEE chain:
  *
  *   up = h − ph,  dn = pl − l
  *   +DM = up if up > dn ∧ up > 0 else 0   (mirror for −DM)
  *   TR  = max(h − l, |h − pc|, |l − pc|)
  *   S′  = S − S/14 + X     (all three Wilder recursions together)
  *   DX  = 100·|S⁺−S⁻|/(S⁺+S⁻)  (0 when the divisor is 0 — inside the
  *         fold; the EMITTED dx is NULL there, the batch column's CASE)
  *   ADX′ = ADX + (DX − ADX)/14
  *
  * Input is one CLOSED class-hour bar in integer cents (the batch's own
  * `classHourBarsV` quantization); 72 bytes of state per class
  * (2 longs + 7 doubles),
  * TTL-evicted. Observed-series contract: gaps fold nothing;
  * out-of-contract bars (hu ≤ last folded) re-emit the machine untouched
  * (idempotent — the shared r9 ADVICE guard). `AdxStreamSpec` proves the
  * emitted state equals the batch fold over every prefix across
  * micro-batch splits, bit for bit. */
object AdxStream {

  /** One closed class-hour bar, integer cents. */
  case class HourBar(cls: String, hu: Long, h: Long, l: Long, cl: Long)

  /** Post-update directional state, emitted per input bar — the batch
    * dual's output columns at this prefix. */
  case class AdxRow(cls: String, hu: Long, n_bars: Long,
                    smoothed_tr: Double, plus_di: Option[Double],
                    minus_di: Option[Double], dx: Option[Double],
                    adx: Double)

  private[stream] def ser(t: Long, ph: Double, pl: Double, pc: Double,
                          str: Double, sp: Double, sn: Double, adx: Double,
                          lastHu: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(72)
    bb.putLong(t); bb.putDouble(ph); bb.putDouble(pl); bb.putDouble(pc)
    bb.putDouble(str); bb.putDouble(sp); bb.putDouble(sn); bb.putDouble(adx)
    bb.putLong(lastHu)
    bb.array()
  }

  private[stream] def deser(bs: Array[Byte]): (Long, Double, Double, Double, Double, Double, Double, Double, Long) = {
    val bb = java.nio.ByteBuffer.wrap(bs)
    (bb.getLong, bb.getDouble, bb.getDouble, bb.getDouble, bb.getDouble,
      bb.getDouble, bb.getDouble, bb.getDouble, bb.getLong)
  }

  class Processor(ttlMs: Long)
    extends StatefulProcessor[String, HourBar, AdxRow] {

    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("adx",
        Encoders.BINARY, TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(cls: String, rows: Iterator[HourBar],
                                 timers: TimerValues): Iterator[AdxRow] = {
      val sorted = rows.toArray.sortBy(_.hu)
      var (t, ph, pl, pc, str, sp, sn, adx, lastHu) =
        if (st.exists()) deser(st.get())
        else (0L, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -1L)
      val out = scala.collection.mutable.ArrayBuffer.empty[AdxRow]

      // one fold step: the batch lambda's textual IEEE chain verbatim
      def step(b: HourBar): Unit = {
        val bh = b.h.toDouble; val bl = b.l.toDouble; val bc = b.cl.toDouble
        if (t == 0L) {
          ph = bh; pl = bl; pc = bc
          str = 0.0; sp = 0.0; sn = 0.0; adx = 0.0
        } else {
          val up = bh - ph
          val dn = pl - bl
          val pdm = if (up > dn && up > 0.0) up else 0.0
          val ndm = if (dn > up && dn > 0.0) dn else 0.0
          val tr = math.max(math.max((b.h - b.l).toDouble,
            math.abs(bh - pc)), math.abs(bl - pc))
          val strN = str - str / 14.0 + tr
          val spN = sp - sp / 14.0 + pdm
          val snN = sn - sn / 14.0 + ndm
          val dx = if (spN + snN > 0.0) 100.0 * math.abs(spN - snN) / (spN + snN)
                   else 0.0
          adx = adx + (dx - adx) / 14.0
          ph = bh; pl = bl; pc = bc; str = strN; sp = spN; sn = snN
        }
        t += 1L
      }

      def emit(hu: Long): Unit =
        out += AdxRow(cls, hu, t, str,
          if (str > 0.0) Some(100.0 * sp / str) else None,
          if (str > 0.0) Some(100.0 * sn / str) else None,
          if (sp + sn > 0.0) Some(100.0 * math.abs(sp - sn) / (sp + sn)) else None,
          adx)

      sorted.foreach { b =>
        if (lastHu >= 0 && b.hu <= lastHu) {
          emit(b.hu) // out-of-contract: idempotent re-emit, no fold
        } else {
          step(b)
          lastHu = b.hu
          emit(b.hu)
        }
      }
      st.update(ser(t, ph, pl, pc, str, sp, sn, adx, lastHu))
      out.iterator
    }
  }

  /** (class, hour-bar) stream → live directional-system state.
    * Requires the RocksDB state store provider, as [[MacdStream]]. */
  def adxStream(bars: Dataset[HourBar],
                ttlMs: Long = 24L * 60 * 60 * 1000): Dataset[AdxRow] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars.groupByKey(_.cls)
      .transformWithState(new Processor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
