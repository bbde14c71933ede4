package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming time-bounded funnel per user — the live form of the batch
  * `events_window_funnel` ([[graft.ext.Sessions.eventsWindowFunnel]]):
  * click → view → purchase, each stage strictly after the previous AND
  * inside the deadline window of the user's FIRST click, emitted as the
  * user's current funnel depth while events arrive (the campaign
  * dashboard that updates DURING the campaign instead of the morning
  * after). Keyed state is three stage timestamps (24 bytes per user,
  * TTL-evicted). Semantics are deliberately batch-anchored: the batch
  * funnel's three stacked window minima are, in event-time order, a
  * three-slot state machine whose slots FREEZE once set — t1 is the
  * first click (later clicks have later ts, so the min is fixed at first
  * sight), t2 the first view with ts > t1 and ts ≤ t1+window (the first
  * satisfying view in ts order IS the min), t3 likewise above t2 — so
  * for an in-event-time-order stream the state after any prefix equals
  * the batch minima over that prefix, REGARDLESS of where micro-batch
  * boundaries fall (rows are re-sorted by (ts, type) inside each batch;
  * cross-batch order is the stream contract, as [[DrawdownStream]]).
  * All comparisons are integer microseconds — no floating point in the
  * state or outputs. `FunnelStreamSpec` proves the final depths equal
  * the batch operator's histogram over the same rows across splits. */
object FunnelStream {

  /** Stream input: user id, event-time micros, event type. */
  case class FunnelEvent(user: Long, ts_us: Long, etype: String)

  /** One output row per (user, micro-batch with data for it): current
    * depth and the frozen stage times (0 = stage not reached). */
  case class FunnelRow(user: Long, depth: Long,
                       t1_us: Long, t2_us: Long, t3_us: Long)

  private[stream] def ser(t: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24)
    bb.putLong(t(0)); bb.putLong(t(1)); bb.putLong(t(2))
    bb.array()
  }

  private[stream] def deser(b: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(b)
    Array(bb.getLong, bb.getLong, bb.getLong)
  }

  class Processor(windowUs: Long, ttlMs: Long)
    extends StatefulProcessor[Long, FunnelEvent, FunnelRow] {

    @transient private var stages: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stages = getHandle.getValueState[Array[Byte]]("stages",
        Encoders.BINARY, TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(user: Long, rows: Iterator[FunnelEvent],
                                 timers: TimerValues): Iterator[FunnelRow] = {
      // micro-batch iterator order is not event order: fold in (ts, type)
      // order; tie order is immaterial (stage predicates are strict >)
      val sorted = rows.toArray.sortBy(e => (e.ts_us, e.etype))
      val t = if (stages.exists()) deser(stages.get()) else Array(0L, 0L, 0L)
      sorted.foreach { e =>
        val deadline = t(0) + windowUs
        e.etype match {
          case "click" if t(0) == 0L => t(0) = e.ts_us
          case "view" if t(1) == 0L && t(0) != 0L &&
            e.ts_us > t(0) && e.ts_us <= deadline => t(1) = e.ts_us
          case "purchase" if t(2) == 0L && t(1) != 0L &&
            e.ts_us > t(1) && e.ts_us <= deadline => t(2) = e.ts_us
          case _ => ()
        }
      }
      stages.update(ser(t))
      val depth =
        if (t(2) != 0L) 3L else if (t(1) != 0L) 2L
        else if (t(0) != 0L) 1L else 0L
      Iterator(FunnelRow(user, depth, t(0), t(1), t(2)))
    }
  }

  /** (user, ts, type) stream → per-micro-batch funnel depth. Requires
    * the RocksDB state store provider, as [[DistinctStats]]. */
  def funnelStream(events: Dataset[FunnelEvent],
                   windowHours: Int = 24,
                   ttlMs: Long = 60L * 60 * 1000): Dataset[FunnelRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user)
      .transformWithState(new Processor(windowHours * 3600000000L, ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
