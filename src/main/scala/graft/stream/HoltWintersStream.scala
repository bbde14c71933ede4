package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming additive Holt–Winters per event class — the live twin of the
  * batch fold in [[graft.ops.Aggs.statHoltWinters]], completing the
  * forecaster twin tier ([[HoltStream]] = level+trend; this adds the
  * 24-hour seasonal ring — the fleet's diurnal reporting rhythm, the
  * component that makes a "traffic is low" alarm at 3am mean something).
  *
  * State IS the batch fold accumulator verbatim: level, trend, and the
  * 24-slot additive seasonal ring, plus (t, lastHu) — 224 bytes per
  * class, TTL-evicted, O(1) in event rate. Every update is the batch
  * lambda's IEEE chain in its textual order with α = β = γ = 1/2 as the
  * same /2.0 divisions:
  *
  *   l' = ((x − s₀) + (l + b)) / 2
  *   b' = ((l' − l) + b) / 2
  *   ring rotates; appended slot = ((x − l') + s₀) / 2
  *
  * seeded l = x₁, b = 0, ring all zeros at the first grid hour. Like the
  * batch dual (and unlike [[HoltStream]]'s observed-series contract),
  * interior reporting gaps DENSIFY: silent hours step x = 0 — zero
  * traffic is a real observation for a count series, and the seasonal
  * ring only keeps its 24-hour phase if every grid hour consumes exactly
  * one slot. In-event-time-order feeds land the identical state for ANY
  * micro-batch boundaries — `HoltWintersStreamSpec` proves the emitted
  * state bit-identical to the batch fold over every prefix across
  * splits. Out-of-contract hours (hu ≤ last folded) re-emit the current
  * trajectory point without folding (the shared r9 ADVICE guard). */
object HoltWintersStream {

  val SeasonLen = 24

  /** Stream input: one closed hour per class, as
    * [[PageHinkleyStream.HourCount]]. */
  case class HourCount(cls: String, hu: Long, n: Long)

  /** Post-update fold state, emitted per input row: the batch dual's
    * output columns at this prefix. */
  case class HwRow(cls: String, hu: Long, n_hours: Long, level: Double,
                   trend: Double, season_next: Double, forecast_next: Double)

  private[graft] def ser(t: Long, l: Double, b: Double, ring: Array[Double],
                          lastHu: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(32 + 8 * SeasonLen)
    bb.putLong(t); bb.putDouble(l); bb.putDouble(b)
    var i = 0
    while (i < SeasonLen) { bb.putDouble(ring(i)); i += 1 }
    bb.putLong(lastHu)
    bb.array()
  }

  private[graft] def deser(bs: Array[Byte]): (Long, Double, Double, Array[Double], Long) = {
    val bb = java.nio.ByteBuffer.wrap(bs)
    val t = bb.getLong; val l = bb.getDouble; val b = bb.getDouble
    val ring = new Array[Double](SeasonLen)
    var i = 0
    while (i < SeasonLen) { ring(i) = bb.getDouble; i += 1 }
    (t, l, b, ring, bb.getLong)
  }

  class Processor(ttlMs: Long)
    extends StatefulProcessor[String, HourCount, HwRow] {

    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("hw",
        Encoders.BINARY, TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(cls: String, rows: Iterator[HourCount],
                                 timers: TimerValues): Iterator[HwRow] = {
      val sorted = rows.toArray.sortBy(_.hu)
      var (t, l, b, ring, lastHu) =
        if (st.exists()) deser(st.get())
        else (0L, 0.0, 0.0, new Array[Double](SeasonLen), -1L)
      // head points at the slot the NEXT step consumes (a rotating index
      // over the fixed array — same values as the batch's slice+concat
      // FIFO rotation without the per-step copy). Consumptions so far =
      // t − 1: the seed step sets (l, b) without touching the ring.
      var head = if (t == 0L) 0L else (t - 1L) % SeasonLen
      val out = scala.collection.mutable.ArrayBuffer.empty[HwRow]

      // one fold step — the batch lambda's ops in its exact textual order
      def step(x: Double): Unit = {
        if (t == 0L) { l = x; b = 0.0 } // ring stays all-zero (the seed)
        else {
          val s0 = ring(head.toInt)
          val lN = ((x - s0) + (l + b)) / 2.0
          val bN = ((lN - l) + b) / 2.0
          ring(head.toInt) = ((x - lN) + s0) / 2.0 // appended slot
          head = (head + 1) % SeasonLen
          l = lN; b = bN
        }
        t += 1L
      }

      def emit(hu: Long): Unit =
        out += HwRow(cls, hu, t, l, b, ring(head.toInt),
          l + b + ring(head.toInt))

      sorted.foreach { r =>
        if (lastHu >= 0 && r.hu <= lastHu) {
          emit(r.hu) // out-of-contract: idempotent re-emit, no fold
        } else {
          if (lastHu >= 0) {
            var h = lastHu + 1
            while (h < r.hu) { step(0.0); h += 1 } // densified grid
          }
          step(r.n.toDouble)
          lastHu = r.hu
          emit(r.hu)
        }
      }
      st.update(ser(t, l, b, ring, lastHu))
      out.iterator
    }
  }

  /** (class, hour, count) stream → per-hour Holt–Winters state. Requires
    * the RocksDB state store provider, as [[MacdStream]]. */
  def holtWintersStream(hours: Dataset[HourCount],
                        ttlMs: Long = 24L * 60 * 60 * 1000): Dataset[HwRow] = {
    val spark = hours.sparkSession
    import spark.implicits._
    hours.groupByKey(_.cls)
      .transformWithState(new Processor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
