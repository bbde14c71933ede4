package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming rolling VWAP per event class — the live twin of
  * [[graft.ops.Windows.windowVwap]] (r10b) and the twin family's first
  * BOUNDED-DEQUE state: every prior twin folds a scalar recursion
  * (smoothers, regime machines); a trailing-window indicator instead
  * must EVICT — the state is the last ≤14 closed bars' (money3, vol,
  * close) ring; both window sums are recomputed from the ring at every
  * emit (≤14 integer adds, order-free), so eviction can never drift the
  * way a float subtract-back would.
  *
  * Emits after every closed bar: the window occupancy, both EXACT sums,
  * and — once the window holds 14 bars — the batch dual's vwap
  * (sm/(300·sv), the identical one-divide chain) and above_vwap flag
  * (3·cl·sv > sm, exact integers). State ≤ 14·16 + 32 bytes/class,
  * TTL-evicted. Observed-series contract: gaps fold nothing;
  * out-of-contract bars re-emit the current window idempotently (the
  * shared r9 ADVICE guard). `VwapStreamSpec` proves the emitted window
  * equals the batch query over every prefix across micro-batch splits —
  * including the warm-up seam (batch emits NOTHING below 14 bars; the
  * twin emits occupancy with NULL vwap there). */
object VwapStream {

  /** One closed class-hour bar, integer cents. */
  case class HourBar(cls: String, hu: Long, h: Long, l: Long, cl: Long, vol: Long)

  case class VwapRow(cls: String, hu: Long, n_window: Long,
                     money3_sum_cents: Long, vol_sum: Long,
                     vwap: Option[Double], above_vwap: Option[Boolean])

  private[stream] def ser(buf: Vector[(Long, Long, Long)], lastHu: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + buf.length * 24)
    bb.putLong(lastHu); bb.putInt(buf.length)
    buf.foreach { case (m, v, cl) => bb.putLong(m); bb.putLong(v); bb.putLong(cl) }
    bb.array()
  }

  private[stream] def deser(bs: Array[Byte]): (Vector[(Long, Long, Long)], Long) = {
    val bb = java.nio.ByteBuffer.wrap(bs)
    val lastHu = bb.getLong
    val n = bb.getInt
    ((0 until n).map(_ => (bb.getLong, bb.getLong, bb.getLong)).toVector, lastHu)
  }

  class Processor(n: Int, ttlMs: Long)
    extends StatefulProcessor[String, HourBar, VwapRow] {

    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("vwap",
        Encoders.BINARY, TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(cls: String, rows: Iterator[HourBar],
                                 timers: TimerValues): Iterator[VwapRow] = {
      val sorted = rows.toArray.sortBy(_.hu)
      var (buf, lastHu) =
        if (st.exists()) deser(st.get()) else (Vector.empty[(Long, Long, Long)], -1L)
      val out = scala.collection.mutable.ArrayBuffer.empty[VwapRow]

      def emit(hu: Long): Unit = {
        val sm = buf.map(_._1).sum // exact integer sums over <= n entries
        val sv = buf.map(_._2).sum
        val full = buf.length == n
        val cl = if (buf.nonEmpty) buf.last._3 else 0L
        // sv > 0 guard: vol=0 bars are unreachable from the batch bar
        // builder (vol = count >= 1) but the public HourBar does not
        // enforce it — emit None instead of Infinity/NaN (the shared
        // divide-guard convention across the stream twins).
        out += VwapRow(cls, hu, buf.length.toLong, sm, sv,
          if (full && sv > 0L) Some(sm.toDouble / (300.0 * sv.toDouble)) else None,
          if (full && sv > 0L) Some(3L * cl * sv > sm) else None)
      }

      sorted.foreach { b =>
        if (lastHu >= 0 && b.hu <= lastHu) {
          emit(b.hu) // out-of-contract: idempotent re-emit, no fold
        } else {
          val t3 = b.h + b.l + b.cl
          buf = (buf :+ ((t3 * b.vol, b.vol, b.cl))).takeRight(n)
          lastHu = b.hu
          emit(b.hu)
        }
      }
      st.update(ser(buf, lastHu))
      out.iterator
    }
  }

  /** (class, hour-bar) stream → live trailing-VWAP window.
    * Requires the RocksDB state store provider, as [[MacdStream]]. */
  def vwapStream(bars: Dataset[HourBar], n: Int = 14,
                 ttlMs: Long = 24L * 60 * 60 * 1000): Dataset[VwapRow] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars.groupByKey(_.cls)
      .transformWithState(new Processor(n, ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
