package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming Page–Hinkley drift detector per event class — the live twin
  * of the batch fold in [[graft.ops.Aggs.statPageHinkley]] (r8, verdict
  * item 4). PH is THE online mean-drift test: m_t = Σ(x_i − x̄_i − δ)
  * against its running minimum, alarm when m_t − min > λ — and because
  * the batch spelling is already a sequential fold over the densified
  * hourly grid, the streaming state IS the fold accumulator verbatim:
  * (t, Σx, m, M, alarmHu) per class, ~48 bytes, TTL-evicted.
  *
  * Bit-identity contract: every state update is the batch fold's IEEE
  * chain in the same textual order — m' = m + (x − (Σx + x)/(t + 1) − δ)
  * with the alarm tested as m' − M > λ BEFORE M absorbs m' (the same
  * pre-update collapse the batch fold pins). Interior reporting gaps
  * densify exactly like the batch grid: an arriving hour h first steps
  * x = 0 for every silent hour since the last one. In-event-time-order
  * feeds therefore land the identical (m, M, alarm) trajectory for ANY
  * micro-batch boundaries — `PageHinkleyStreamSpec` proves the emitted
  * state equals the batch fold over the same prefix at every split.
  *
  * The reference anchor is the heartbeat monitor's threshold alerting
  * (`AIRWISEv0.py:73-103`) upgraded from "no packets for N minutes" to
  * "packet RATE has drifted from its own history". */
object PageHinkleyStream {

  /** Stream input: one closed hour per class — hu = epoch-hour unit,
    * n = events counted in that hour (the upstream windowed count). */
  case class HourCount(cls: String, hu: Long, n: Long)

  /** Post-update detector state, emitted per input row: the batch dual's
    * output columns at this prefix (first_alarm_hu = wall-clock hour
    * unit, the r8 batch convention). */
  case class PhRow(cls: String, hu: Long, n_hours: Long, m_final: Double,
                   m_min: Double, ph_stat: Double, drift_detected: Boolean,
                   first_alarm_hu: Option[Long])

  /** Fold accumulator = the batch aggregate's acc array plus the grid
    * anchor: t (steps so far), Σx, m, M, lastHu, alarmHu (−1 = none). */
  private[stream] def ser(t: Double, sumx: Double, m: Double, mMin: Double,
                          lastHu: Long, alarmHu: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(48)
    bb.putDouble(t); bb.putDouble(sumx); bb.putDouble(m); bb.putDouble(mMin)
    bb.putLong(lastHu); bb.putLong(alarmHu)
    bb.array()
  }

  private[stream] def deser(b: Array[Byte]): (Double, Double, Double, Double, Long, Long) = {
    val bb = java.nio.ByteBuffer.wrap(b)
    (bb.getDouble, bb.getDouble, bb.getDouble, bb.getDouble, bb.getLong, bb.getLong)
  }

  class Processor(delta: Double, lambda: Double, ttlMs: Long)
    extends StatefulProcessor[String, HourCount, PhRow] {

    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("ph",
        Encoders.BINARY, TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(cls: String, rows: Iterator[HourCount],
                                 timers: TimerValues): Iterator[PhRow] = {
      val sorted = rows.toArray.sortBy(_.hu)
      var (t, sumx, m, mMin, lastHu, alarmHu) =
        if (st.exists()) deser(st.get()) else (0.0, 0.0, 0.0, 0.0, -1L, -1L)
      val out = scala.collection.mutable.ArrayBuffer.empty[PhRow]

      // one fold step — the batch lambda's ops in its exact order
      def step(x: Double, hu: Long): Unit = {
        if (t == 0.0) {
          // init element: x̄₁ = x₁ exactly ⇒ m₁ = M₁ = −δ independent of x
          t = 1.0; sumx = x; m = -delta; mMin = -delta
        } else {
          val mNew = m + (x - (sumx + x) / (t + 1.0) - delta)
          if (alarmHu < 0 && mNew - mMin > lambda) alarmHu = hu
          mMin = math.min(mMin, mNew)
          m = mNew
          t = t + 1.0
          sumx = sumx + x
        }
      }

      sorted.foreach { r =>
        if (lastHu >= 0 && r.hu <= lastHu) {
          // Late, duplicate, or replayed hour: the grid has already stepped
          // past it. Folding it as the NEXT step would double-count an hour
          // the densifier already emitted (as 0 or its real count) and
          // silently diverge from the batch dual forever. Degrade
          // idempotently instead: leave state untouched and re-emit the
          // current trajectory point so the violation is visible downstream
          // (same hu seen twice) without corrupting (t, Σx, m, M).
          out += PhRow(cls, r.hu, t.toLong, m, mMin, m - mMin,
            alarmHu >= 0, if (alarmHu >= 0) Some(alarmHu) else None)
        } else {
          // densify the interior gap exactly like the batch grid
          if (lastHu >= 0) {
            var h = lastHu + 1
            while (h < r.hu) { step(0.0, h); h += 1 }
          }
          step(r.n.toDouble, r.hu)
          lastHu = r.hu
          out += PhRow(cls, r.hu, t.toLong, m, mMin, m - mMin,
            alarmHu >= 0, if (alarmHu >= 0) Some(alarmHu) else None)
        }
      }
      st.update(ser(t, sumx, m, mMin, lastHu, alarmHu))
      out.iterator
    }
  }

  /** (class, hour, count) stream → per-hour detector state. Requires the
    * RocksDB state store provider, as [[DistinctStats]]. */
  def pageHinkleyStream(hours: Dataset[HourCount], delta: Double = 1.0,
                        lambda: Double = 30.0,
                        ttlMs: Long = 24L * 60 * 60 * 1000): Dataset[PhRow] = {
    val spark = hours.sparkSession
    import spark.implicits._
    hours.groupByKey(_.cls)
      .transformWithState(new Processor(delta, lambda, ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
