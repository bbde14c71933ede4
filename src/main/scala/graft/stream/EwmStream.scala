package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming EW mean/variance monitor per event class — the live twin of
  * the batch fold in [[graft.ops.Aggs.tsEwmStats]] (template:
  * [[MacdStream]], the same proven pattern one accumulator smaller). The
  * payoff of the pair: an adaptive alert band "level ± 3·ewm_vol" whose
  * CENTER and WIDTH both track the feed — the fixed-z screens assume a
  * stationary noise floor this estimator explicitly does not.
  *
  * Bit-identity contract: the state update is the batch fold's IEEE chain
  * in its textual order — with the OLD mean m, m' = m + 0.25·(x − m) and
  * v' = 0.75·(v + (x − m)·(0.25·(x − m))) (West's one-pass update; α =
  * 0.25 exactly representable in binary). Seeding: first grid element
  * sets m = x₁, v = 0. Interior gaps densify as x = 0 grid steps (the
  * batch grid's zero hours). In-order feeds land the identical (m, v)
  * trajectory for ANY micro-batch boundaries — `EwmStreamSpec` proves the
  * emitted state equals the batch fold over every prefix across splits.
  *
  * Out-of-contract input (the r9 ADVICE pattern): a row with hu ≤ the
  * last folded hour re-emits the current trajectory point untouched —
  * idempotent, never a silent double-fold.
  *
  * Reference anchor: the heartbeat monitor's fixed thresholds
  * (`AIRWISEv0.py:73-103`) upgraded to a self-calibrating band. */
object EwmStream {

  /** Stream input: one closed hour per class, as
    * [[PageHinkleyStream.HourCount]]. */
  case class HourCount(cls: String, hu: Long, n: Long)

  /** Post-update fold state, emitted per input row: the batch dual's
    * output columns at this prefix. */
  case class EwmRow(cls: String, hu: Long, n_hours: Long, ewm_mean: Double,
                    ewm_var: Double, ewm_vol: Double)

  /** Accumulator = the batch aggregate's [m, v] array plus the grid
    * anchor: t (grid steps so far), lastHu. 32 bytes per class. */
  private[stream] def ser(t: Long, m: Double, v: Double,
                          lastHu: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(32)
    bb.putLong(t); bb.putDouble(m); bb.putDouble(v); bb.putLong(lastHu)
    bb.array()
  }

  private[stream] def deser(b: Array[Byte]): (Long, Double, Double, Long) = {
    val bb = java.nio.ByteBuffer.wrap(b)
    (bb.getLong, bb.getDouble, bb.getDouble, bb.getLong)
  }

  class Processor(ttlMs: Long)
    extends StatefulProcessor[String, HourCount, EwmRow] {

    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("ewm",
        Encoders.BINARY, TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(cls: String, rows: Iterator[HourCount],
                                 timers: TimerValues): Iterator[EwmRow] = {
      val sorted = rows.toArray.sortBy(_.hu)
      var (t, m, v, lastHu) =
        if (st.exists()) deser(st.get()) else (0L, 0.0, 0.0, -1L)
      val out = scala.collection.mutable.ArrayBuffer.empty[EwmRow]

      // one fold step — the batch lambda's ops in its exact textual order
      def step(x: Double): Unit = {
        if (t == 0L) { m = x; v = 0.0 }
        else {
          val mN = m + 0.25 * (x - m)
          v = 0.75 * (v + (x - m) * (0.25 * (x - m)))
          m = mN
        }
        t += 1L
      }

      def emit(hu: Long): Unit =
        out += EwmRow(cls, hu, t, m, v, math.sqrt(v))

      sorted.foreach { r =>
        if (lastHu >= 0 && r.hu <= lastHu) {
          emit(r.hu) // out-of-contract: idempotent re-emit, no fold
        } else {
          if (lastHu >= 0) {
            var h = lastHu + 1
            while (h < r.hu) { step(0.0); h += 1 }
          }
          step(r.n.toDouble)
          lastHu = r.hu
          emit(r.hu)
        }
      }
      st.update(ser(t, m, v, lastHu))
      out.iterator
    }
  }

  /** (class, hour, count) stream → per-hour EW mean/var state. Requires
    * the RocksDB state store provider, as [[PageHinkleyStream]]. */
  def ewmStream(hours: Dataset[HourCount],
                ttlMs: Long = 24L * 60 * 60 * 1000): Dataset[EwmRow] = {
    val spark = hours.sparkSession
    import spark.implicits._
    hours.groupByKey(_.cls)
      .transformWithState(new Processor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
