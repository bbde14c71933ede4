package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming Holt double-exponential forecaster per event class — the
  * live twin of the batch fold in [[graft.ops.Aggs.statHoltForecast]]
  * (template: [[MacdStream]] / [[PageHinkleyStream]]). Holt is the
  * capacity-planning smoother: level + trend state closes the lag EWMA
  * shows on a trending series, and `forecast_next = level + trend` is
  * the one-step-ahead rate estimate a monitor holds LIVE as hours close
  * (the reference redraws trend lines offline from full exports,
  * `graphdata.py:98-192`; this maintains the forecast in O(1) state).
  *
  * State IS the batch fold accumulator verbatim: ([level, trend], t,
  * lastHu) — 32 bytes per class, TTL-evicted. Every update is the batch
  * lambda's IEEE chain in its textual order with α = β = 1/2 spelled as
  * the same /2.0 divisions:
  *
  *   l' = (x + (l + b)) / 2;   b' = ((l' − l) + b) / 2
  *
  * seeded l = x₁, b = 0 at the first observed hour. One deliberate
  * contract DIFFERENCE from the MACD/Page–Hinkley twins: the batch Holt
  * fold runs over the OBSERVED hourly series (silent hours are skipped,
  * not zero-densified — `statHoltForecast`'s groupBy emits no row for
  * them), so the stream steps ONLY on arriving rows and interior gaps
  * fold nothing. In-event-time-order feeds therefore land the identical
  * (level, trend) trajectory for ANY micro-batch boundaries —
  * `HoltStreamSpec` proves the emitted state equals the batch fold over
  * the same prefix at every split.
  *
  * Out-of-contract input (the r9 ADVICE guard, shared with both sibling
  * twins): a row with hu ≤ the last folded hour is late, duplicate, or
  * replayed — folding it would re-run an already-consumed fold step and
  * silently diverge from the batch dual forever. Such rows re-emit the
  * current trajectory point untouched (idempotent, visible downstream
  * as a repeated hu). */
object HoltStream {

  /** Stream input: one closed hour per class, as
    * [[PageHinkleyStream.HourCount]]. */
  case class HourCount(cls: String, hu: Long, n: Long)

  /** Post-update fold state, emitted per input row: the batch dual's
    * output columns at this prefix. */
  case class HoltRow(cls: String, hu: Long, n_hours: Long, level: Double,
                     trend: Double, forecast_next: Double)

  private[stream] def ser(t: Long, l: Double, b: Double,
                          lastHu: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(32)
    bb.putLong(t); bb.putDouble(l); bb.putDouble(b); bb.putLong(lastHu)
    bb.array()
  }

  private[stream] def deser(bs: Array[Byte]): (Long, Double, Double, Long) = {
    val bb = java.nio.ByteBuffer.wrap(bs)
    (bb.getLong, bb.getDouble, bb.getDouble, bb.getLong)
  }

  class Processor(ttlMs: Long)
    extends StatefulProcessor[String, HourCount, HoltRow] {

    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("holt",
        Encoders.BINARY, TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(cls: String, rows: Iterator[HourCount],
                                 timers: TimerValues): Iterator[HoltRow] = {
      val sorted = rows.toArray.sortBy(_.hu)
      var (t, l, b, lastHu) =
        if (st.exists()) deser(st.get()) else (0L, 0.0, 0.0, -1L)
      val out = scala.collection.mutable.ArrayBuffer.empty[HoltRow]

      // one fold step — the batch lambda's ops in its exact textual order
      def step(x: Double): Unit = {
        if (t == 0L) { l = x; b = 0.0 }
        else {
          val lN = (x + (l + b)) / 2.0
          val bN = ((lN - l) + b) / 2.0
          l = lN; b = bN
        }
        t += 1L
      }

      def emit(hu: Long): Unit =
        out += HoltRow(cls, hu, t, l, b, l + b)

      sorted.foreach { r =>
        if (lastHu >= 0 && r.hu <= lastHu) {
          emit(r.hu) // out-of-contract: idempotent re-emit, no fold
        } else {
          step(r.n.toDouble) // observed series only — gaps fold nothing
          lastHu = r.hu
          emit(r.hu)
        }
      }
      st.update(ser(t, l, b, lastHu))
      out.iterator
    }
  }

  /** (class, hour, count) stream → per-hour Holt forecast state.
    * Requires the RocksDB state store provider, as [[MacdStream]]. */
  def holtStream(hours: Dataset[HourCount],
                 ttlMs: Long = 24L * 60 * 60 * 1000): Dataset[HoltRow] = {
    val spark = hours.sparkSession
    import spark.implicits._
    hours.groupByKey(_.cls)
      .transformWithState(new Processor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
