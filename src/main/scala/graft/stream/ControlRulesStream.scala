package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming Western Electric control-rule monitor per event class — the
  * live twin of [[graft.ops.Aggs.statControlRules]] (same round, same
  * rules): R1 = |z|>3, R2 = ≥2 of last 3 beyond 2σ same side, R3 = ≥4 of
  * last 5 beyond 1σ same side, R4 = 8 consecutive same side of center.
  * The batch op TRAINS the (μ, σ) baseline from the class's own history
  * ([[graft.ops.Aggs.controlMoments]]); the stream is ARMED with that
  * baseline and screens each closing hour as it arrives — the SPC
  * split every control-chart deployment uses (Phase I estimates limits
  * offline, Phase II monitors against them frozen).
  *
  * Bit-identity contract: z = (x − μ)/σ is the batch plan's exact double
  * chain; each rule is an integer count over the trailing ≤3/5/8 OBSERVED
  * hours including the current one — precisely the batch's ROWS frames
  * (which are row-based over observed hours; the batch does NOT densify
  * gaps, so neither does the stream). State per class is the ring of the
  * last ≤7 z values plus the grid anchor — ≤68 bytes, TTL-evicted.
  * `ControlRulesStreamSpec` proves the emitted violation set equals the
  * batch output on the same feed across arbitrary micro-batch splits.
  * A row with hu ≤ lastHu (late, duplicate, replayed) is dropped
  * idempotently — folding it would shift every subsequent frame and
  * silently diverge from the batch dual (the r8→r9 ADVICE contract). */
object ControlRulesStream {

  /** Stream input: one closed hour per class — hu = the batch op's
    * `unix_micros(date_trunc('hour', ts))`, n = events in that hour. */
  case class HourCount(cls: String, hu: Long, n: Long)

  /** Per-hour screen result: z and the four rule bits (the batch dual's
    * columns; downstream filters `r1 || r2 || r3 || r4` for the alarm
    * feed — emitting every hour keeps the healthy-state trace). */
  case class RuleRow(cls: String, hu: Long, z: Double, rule1_3sigma: Boolean,
                     rule2_2of3: Boolean, rule3_4of5: Boolean,
                     rule4_run8: Boolean)

  private[stream] def ser(zs: Array[Double], lastHu: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + zs.length * 8 + 8)
    bb.putInt(zs.length); zs.foreach(bb.putDouble); bb.putLong(lastHu)
    bb.array()
  }

  private[stream] def deser(b: Array[Byte]): (Array[Double], Long) = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val n = bb.getInt
    (Array.fill(n)(bb.getDouble), bb.getLong)
  }

  class Processor(baseline: Map[String, (Double, Double)], ttlMs: Long)
    extends StatefulProcessor[String, HourCount, RuleRow] {

    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("wer",
        Encoders.BINARY, TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(cls: String, rows: Iterator[HourCount],
                                 timers: TimerValues): Iterator[RuleRow] = {
      val (mu, sd) = baseline.getOrElse(cls, (0.0, 0.0))
      if (!(sd > 0)) return Iterator.empty // the batch plan's sd > 0 gate
      val sorted = rows.toArray.sortBy(_.hu)
      var (ring, lastHu) =
        if (st.exists()) deser(st.get()) else (Array.empty[Double], -1L)
      val out = scala.collection.mutable.ArrayBuffer.empty[RuleRow]
      sorted.foreach { r =>
        if (lastHu >= 0 && r.hu <= lastHu) {
          // late/duplicate/replayed hour: already screened — drop, don't
          // shift every subsequent trailing frame off the batch dual
          ()
        } else {
          val z = (r.n.toDouble - mu) / sd
          val w = ring :+ z
          def cnt(k: Int, p: Double => Boolean) = w.takeRight(k).count(p)
          out += RuleRow(cls, r.hu, z,
            math.abs(z) > 3.0,
            cnt(3, _ > 2.0) >= 2 || cnt(3, _ < -2.0) >= 2,
            cnt(5, _ > 1.0) >= 4 || cnt(5, _ < -1.0) >= 4,
            cnt(8, _ > 0.0) == 8 || cnt(8, _ < 0.0) == 8)
          ring = w.takeRight(7)
          lastHu = r.hu
        }
      }
      st.update(ser(ring, lastHu))
      out.iterator
    }
  }

  /** (class, hour, count) stream → per-hour rule screen against the
    * frozen baseline. Requires the RocksDB state store provider, as
    * [[DistinctStats]]. */
  def controlRulesStream(hours: Dataset[HourCount],
                         baseline: Map[String, (Double, Double)],
                         ttlMs: Long = 24L * 60 * 60 * 1000): Dataset[RuleRow] = {
    val spark = hours.sparkSession
    import spark.implicits._
    hours.groupByKey(_.cls)
      .transformWithState(new Processor(baseline, ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
