package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming stochastic oscillator (%K/%D) per user — the live form of
  * the batch `window_stochastic` ([[graft.ops.Windows.windowStochastic]]):
  * the range-position read a monitor holds AT ARRIVAL, which is exactly
  * the trailing 14-reading frame the batch reconstructs — so the two
  * must agree row for row. Completes the ring-state twin tier
  * ([[RsiStream]] momentum, [[BollingerStream]] breakout) with the TA
  * family's fourth face.
  *
  * Keyed state: an n-slot ring of cent readings PLUS the previous two
  * %K values — the batch computes %K for EVERY reading (partial windows
  * included) and its %D lags run over that full sequence BEFORE the
  * warm-up filter, so the live state must carry k₋₁/k₋₂ even from
  * partial-window rows. 8n + 2·8 + flags bytes per user, TTL-evicted,
  * O(1) in event rate. hi/lo are SELECTIONS over exact integer cents;
  * %K is the batch chain verbatim (100·(c−lo)/(hi−lo), one
  * integer-difference divide); %D is the batch's EXPLICIT lag spelling
  * (k₋₂ + k₋₁ + k)/3 in that textual order — flat windows propagate
  * null (None), not 0/0, through both. A row is emitted once the ring
  * holds n readings (the batch's count-in-frame = n filter).
  * In-event-time-order streams land identical rows for ANY micro-batch
  * boundaries (rows re-sorted by (ts, event_id) inside each batch;
  * cross-batch order is the stream contract) — `StochasticStreamSpec`
  * proves equality against the batch operator at every split. */
object StochasticStream {

  /** Stream input: user, event-time micros, event id, reading in cents. */
  case class Reading(user: Long, ts_us: Long, event_id: Long, cents: Long)

  /** One output row per full-window reading — the batch row's
    * (hi_cents, lo_cents, pct_k, pct_d) at this reading. pct_k is None
    * on a flat window (hi == lo); pct_d is None whenever any of the
    * three %K terms is (the batch's null propagation through the lag
    * sum). */
  case class StochRow(user: Long, ts_us: Long, event_id: Long,
                      hi_cents: Long, lo_cents: Long,
                      pct_k: Option[Double], pct_d: Option[Double])

  private def serOpt(bb: java.nio.ByteBuffer, v: Option[Double]): Unit = {
    bb.put(if (v.isDefined) 1.toByte else 0.toByte)
    bb.putDouble(v.getOrElse(0.0))
  }
  private def deserOpt(bb: java.nio.ByteBuffer): Option[Double] = {
    val has = bb.get() == 1.toByte
    val d = bb.getDouble
    if (has) Some(d) else None
  }

  private[graft] def ser(ring: Array[Long], filled: Int, pos: Int,
                         k1: Option[Double], k2: Option[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * ring.length + 8 + 18)
    bb.putInt(filled); bb.putInt(pos)
    serOpt(bb, k1); serOpt(bb, k2)
    ring.foreach(bb.putLong)
    bb.array()
  }

  private[graft] def deser(b: Array[Byte], n: Int)
      : (Array[Long], Int, Int, Option[Double], Option[Double]) = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val filled = bb.getInt; val pos = bb.getInt
    val k1 = deserOpt(bb); val k2 = deserOpt(bb)
    val ring = Array.fill(n)(bb.getLong)
    (ring, filled, pos, k1, k2)
  }

  class Processor(n: Int, ttlMs: Long)
    extends StatefulProcessor[Long, Reading, StochRow] {

    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("stoch",
        Encoders.BINARY, TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(user: Long, rows: Iterator[Reading],
                                 timers: TimerValues): Iterator[StochRow] = {
      val sorted = rows.toArray.sortBy(r => (r.ts_us, r.event_id))
      var (ring, filled, pos, k1, k2) =
        if (st.exists()) deser(st.get(), n)
        else (new Array[Long](n), 0, 0, Option.empty[Double], Option.empty[Double])
      val out = scala.collection.mutable.ArrayBuffer.empty[StochRow]
      sorted.foreach { r =>
        ring(pos) = r.cents
        pos = (pos + 1) % n
        if (filled < n) filled += 1
        // hi/lo over the CURRENT (possibly partial) frame — the batch
        // computes %K for every reading, full window or not
        var hi = Long.MinValue; var lo = Long.MaxValue; var i = 0
        while (i < filled) {
          val v = ring(i)
          if (v > hi) hi = v
          if (v < lo) lo = v
          i += 1
        }
        // the batch chain verbatim: 100·(c−lo)/(hi−lo), null when flat
        val k = if (hi > lo)
          Some(100.0 * (r.cents - lo).toDouble / (hi - lo).toDouble)
        else None
        // the batch's explicit lag spelling, nulls propagating:
        // (k₋₂ + k₋₁ + k) / 3 in that textual order
        val kd = for (a <- k2; b <- k1; c <- k) yield (a + b + c) / 3.0
        if (filled == n)
          out += StochRow(user, r.ts_us, r.event_id, hi, lo, k, kd)
        k2 = k1; k1 = k
      }
      st.update(ser(ring, filled, pos, k1, k2))
      out.iterator
    }
  }

  /** (user, ts, id, cents) stream → %K/%D rows once the reading window
    * fills. Requires the RocksDB state store provider, as
    * [[RsiStream]]. */
  def stochasticStream(readings: Dataset[Reading], n: Int = 14,
                       ttlMs: Long = 60L * 60 * 1000): Dataset[StochRow] = {
    val spark = readings.sparkSession
    import spark.implicits._
    readings.groupByKey(_.user)
      .transformWithState(new Processor(n, ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
