package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming Keltner channel per event class — the live form of the
  * batch `window_keltner` ([[graft.ops.Windows.windowKeltner]]), and the
  * first twin that closes BARS rather than folding readings: the batch
  * operator's unit of work is the class-HOUR bar (h, l, cl over the
  * hour's readings), so the live state is the bar under construction
  * plus a ring of the last n CLOSED bars' (3·typical, range) integers.
  * A bar closes when the first reading of a LATER hour arrives — the
  * channel row for the closed bar is emitted at that moment, which is
  * exactly when the batch row becomes determined (no reading can change
  * a closed hour under the in-order contract).
  *
  * Keyed state: n×(typ3, rng) ring + (hour, h, l, cl) of the open bar —
  * 16n + 32 + flags bytes per class, TTL-evicted, O(1) in event rate.
  * All integer until the batch operator's verbatim output chains
  * (st/(3n)/100 for mid, ± sr/n/100 for the bands); the breakout flags
  * never touch doubles at all (3n·cl vs S_typ ± 3·S_rng, the batch's
  * exact integer predicates). Out-of-contract hours (hu < open bar —
  * late/replayed) are skipped loudly-idempotently rather than folded
  * (the shared r9 ADVICE guard). The open bar is never emitted — the
  * batch's final bar per class has no live counterpart until a later
  * hour closes it, which `KeltnerStreamSpec` accounts for explicitly —
  * and equality holds bit for bit across any micro-batch boundaries. */
object KeltnerStream {

  /** Stream input: event class, event-time micros, event id, cents. */
  case class Reading(cls: String, ts_us: Long, event_id: Long, cents: Long)

  /** One output row per CLOSED bar with a full ring — the batch row's
    * (mid, upper, lower, flags) for that hour. hu is the bar hour in
    * epoch micros (the batch's hour_s rendered as a key). */
  case class KeltnerRow(cls: String, hu: Long, mid: Double, upper: Double,
                        lower: Double, above_upper: Boolean,
                        below_lower: Boolean)

  private[graft] def ser(ring: Array[Long], filled: Int, pos: Int,
                         curHu: Long, h: Long, l: Long, cl: Long,
                         hasCur: Boolean): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * ring.length + 41)
    bb.putInt(filled); bb.putInt(pos)
    bb.putLong(curHu); bb.putLong(h); bb.putLong(l); bb.putLong(cl)
    bb.put(if (hasCur) 1.toByte else 0.toByte)
    ring.foreach(bb.putLong)
    bb.array()
  }

  private[graft] def deser(b: Array[Byte], n: Int)
      : (Array[Long], Int, Int, Long, Long, Long, Long, Boolean) = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val filled = bb.getInt; val pos = bb.getInt
    val curHu = bb.getLong; val h = bb.getLong; val l = bb.getLong
    val cl = bb.getLong
    val hasCur = bb.get() == 1.toByte
    val ring = Array.fill(2 * n)(bb.getLong)
    (ring, filled, pos, curHu, h, l, cl, hasCur)
  }

  class Processor(n: Int, ttlMs: Long)
    extends StatefulProcessor[String, Reading, KeltnerRow] {

    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("keltner",
        Encoders.BINARY, TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(cls: String, rows: Iterator[Reading],
                                 timers: TimerValues): Iterator[KeltnerRow] = {
      val sorted = rows.toArray.sortBy(r => (r.ts_us, r.event_id))
      var (ring, filled, pos, curHu, h, l, cl, hasCur) =
        if (st.exists()) deser(st.get(), n)
        else (new Array[Long](2 * n), 0, 0, -1L, 0L, 0L, 0L, false)
      val out = scala.collection.mutable.ArrayBuffer.empty[KeltnerRow]

      def closeBar(): Unit = {
        // push (3·typical, range) — integers, the batch bar verbatim
        ring(2 * pos) = h + l + cl
        ring(2 * pos + 1) = h - l
        pos = (pos + 1) % n
        if (filled < n) filled += 1
        if (filled == n) {
          var st3 = 0L; var sr = 0L; var i = 0
          while (i < n) { st3 += ring(2 * i); sr += ring(2 * i + 1); i += 1 }
          // the batch output chains verbatim: st/(3n)/100, ± sr/n/100
          val mid = st3.toDouble / (3.0 * n) / 100.0
          val upper = st3.toDouble / (3.0 * n) / 100.0 +
            sr.toDouble / n.toDouble / 100.0
          val lower = st3.toDouble / (3.0 * n) / 100.0 -
            sr.toDouble / n.toDouble / 100.0
          // exact integer breakout predicates — the batch's
          out += KeltnerRow(cls, curHu, mid, upper, lower,
            3L * n * cl > st3 + 3L * sr, 3L * n * cl < st3 - 3L * sr)
        }
      }

      sorted.foreach { r =>
        val hu = Math.floorDiv(r.ts_us, 3600000000L) * 3600000000L
        if (!hasCur) {
          curHu = hu; h = r.cents; l = r.cents; cl = r.cents; hasCur = true
        } else if (hu == curHu) {
          if (r.cents > h) h = r.cents
          if (r.cents < l) l = r.cents
          cl = r.cents
        } else if (hu > curHu) {
          closeBar()
          curHu = hu; h = r.cents; l = r.cents; cl = r.cents
        }
        // hu < curHu: out-of-contract (late/replayed hour) — skip, never
        // fold into a closed bar (the shared r9 ADVICE guard)
      }
      st.update(ser(ring, filled, pos, curHu, h, l, cl, hasCur))
      out.iterator
    }
  }

  /** (class, ts, id, cents) stream → channel rows as bars close.
    * Requires the RocksDB state store provider, as [[RsiStream]]. */
  def keltnerStream(readings: Dataset[Reading], n: Int = 14,
                    ttlMs: Long = 24L * 60 * 60 * 1000): Dataset[KeltnerRow] = {
    val spark = readings.sparkSession
    import spark.implicits._
    readings.groupByKey(_.cls)
      .transformWithState(new Processor(n, ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
