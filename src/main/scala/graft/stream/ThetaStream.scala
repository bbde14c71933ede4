package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming theta-method forecaster per event class — the live twin of
  * the batch fold in [[graft.ops.Aggs.tsThetaForecast]] (r10, VERDICT r9
  * #6; template: [[HoltStream]]). The θ=2 method is SES plus half the
  * linear-trend slope as drift, so the state is the union of the two
  * batch recipes' accumulators verbatim:
  *
  *  - the SES level folds `(x + acc) / 2.0` in the batch lambda's
  *    textual order, seeded l = y₁ (the `stat_ewma_hourly` chain);
  *  - the slope rides the INTEGER power sums Σx, Σy, Σxy, Σx² over the
  *    observed hourly points (x = hu − 473352, the batch's own epoch
  *    re-centering) — exact Longs in state, cast to double only inside
  *    the final fixed chain, exactly where the batch casts its
  *    DECIMAL(38,0) sums (integer-valued ⇒ identical doubles while the
  *    sums stay under 2^53 — they do for any span the
  *    [[graft.ops.Guards]] budget admits);
  *  - det = n·Σx² − (Σx)², slope = (n·Σxy − ΣxΣy)/det,
  *    forecast_next = level + slope/2 — the batch chain op for op.
  *
  * 56 bytes of state per class, TTL-evicted. Same observed-series
  * contract as [[HoltStream]]: gaps fold nothing, so in-event-time-order
  * feeds land the identical trajectory for ANY micro-batch boundaries —
  * `ThetaStreamSpec` proves bit-identity to the batch fold over every
  * prefix across splits. Until a class has two DISTINCT hours the batch
  * form emits no row (det = 0 filter); the twin emits the SES level with
  * slope/forecast NULL for those prefixes — the live reading "level
  * known, trend not yet estimable" — and the spec pins both sides of
  * that contract. Out-of-contract rows (hu ≤ last folded hour: late,
  * duplicate, replayed) re-emit the current trajectory point untouched
  * (idempotent), the shared r9 ADVICE guard. */
object ThetaStream {

  /** Stream input: one closed hour per class, as
    * [[PageHinkleyStream.HourCount]]. */
  case class HourCount(cls: String, hu: Long, n: Long)

  /** Post-update fold state, emitted per input row: the batch dual's
    * output columns at this prefix (slope/forecast None until det > 0). */
  case class ThetaRow(cls: String, hu: Long, n_hours: Long,
                      ses_level: Double, slope: Option[Double],
                      forecast_next: Option[Double])

  private val Off = 473352L // the batch op's hour-unit epoch re-centering

  private[stream] def ser(t: Long, l: Double, sx: Long, sy: Long, sxy: Long,
                          sxx: Long, lastHu: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(56)
    bb.putLong(t); bb.putDouble(l); bb.putLong(sx); bb.putLong(sy)
    bb.putLong(sxy); bb.putLong(sxx); bb.putLong(lastHu)
    bb.array()
  }

  private[stream] def deser(bs: Array[Byte]): (Long, Double, Long, Long, Long, Long, Long) = {
    val bb = java.nio.ByteBuffer.wrap(bs)
    (bb.getLong, bb.getDouble, bb.getLong, bb.getLong, bb.getLong,
      bb.getLong, bb.getLong)
  }

  class Processor(ttlMs: Long)
    extends StatefulProcessor[String, HourCount, ThetaRow] {

    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("theta",
        Encoders.BINARY, TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(cls: String, rows: Iterator[HourCount],
                                 timers: TimerValues): Iterator[ThetaRow] = {
      val sorted = rows.toArray.sortBy(_.hu)
      var (t, l, sx, sy, sxy, sxx, lastHu) =
        if (st.exists()) deser(st.get())
        else (0L, 0.0, 0L, 0L, 0L, 0L, -1L)
      val out = scala.collection.mutable.ArrayBuffer.empty[ThetaRow]

      // one fold step: SES chain + integer power sums, batch order
      def step(x: Long, y: Long): Unit = {
        if (t == 0L) l = y.toDouble
        else l = (y.toDouble + l) / 2.0
        sx += x; sy += y; sxy += x * y; sxx += x * x
        t += 1L
      }

      def emit(hu: Long): Unit = {
        // det/slope/forecast: the batch select's fixed chain verbatim
        // (long power sums cast to double exactly where the batch casts
        // its integer-valued decimals)
        val det = t.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
        if (det > 0) {
          val slope =
            (t.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) / det
          out += ThetaRow(cls, hu, t, l, Some(slope), Some(l + slope / 2.0))
        } else out += ThetaRow(cls, hu, t, l, None, None)
      }

      sorted.foreach { r =>
        if (lastHu >= 0 && r.hu <= lastHu) {
          emit(r.hu) // out-of-contract: idempotent re-emit, no fold
        } else {
          step(r.hu - Off, r.n) // observed series only — gaps fold nothing
          lastHu = r.hu
          emit(r.hu)
        }
      }
      st.update(ser(t, l, sx, sy, sxy, sxx, lastHu))
      out.iterator
    }
  }

  /** (class, hour, count) stream → per-hour theta forecast state.
    * Requires the RocksDB state store provider, as [[MacdStream]]. */
  def thetaStream(hours: Dataset[HourCount],
                  ttlMs: Long = 24L * 60 * 60 * 1000): Dataset[ThetaRow] = {
    val spark = hours.sparkSession
    import spark.implicits._
    hours.groupByKey(_.cls)
      .transformWithState(new Processor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
