package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.stream.Heartbeat.Packet

/** Per-node EWMA-smoothed inter-arrival interval — the LIVE rate estimate
  * behind adaptive offline thresholds (a fixed "no packet in N minutes"
  * misfires on nodes that report every 2 s and on nodes that report
  * hourly alike; the smoothed gap is the per-node baseline the threshold
  * should scale from). α = 1/2, same halving recursion as the
  * oracle-checked batch dual `stat_ewma_hourly`: one add + one exact
  * exponent shift per packet, deterministic given arrival order. State is
  * one (last_ts, ewma) pair per node with native TTL
  * ([[RunningStats]] pattern — O(keys), evicted when a node goes quiet).
  */
object Smooth {

  /** `seeded` is an explicit flag: a -1.0 "unseeded" sentinel would be
    * indistinguishable from a legitimately negative EWMA (out-of-order
    * packets produce negative gaps), silently re-seeding the filter. */
  case class GapState(last_ts: Long, ewma: Double, seeded: Boolean)

  /** One row per packet after the first: the smoothed gap at that point. */
  case class GapRow(node: Long, ts_ms: Long, gap_ms: Long, ewma_gap_ms: Double)

  class Processor(ttlMs: Long)
    extends StatefulProcessor[Long, Packet, GapRow] {

    @transient private var st: ValueState[GapState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[GapState]("gap",
        Encoders.product[GapState], TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(node: Long, rows: Iterator[Packet],
                                 timers: TimerValues): Iterator[GapRow] = {
      var cur = if (st.exists()) Option(st.get()) else None
      val out = rows.flatMap { p =>
        val r = cur match {
          case None =>
            cur = Some(GapState(p.ts_ms, 0.0, seeded = false)); None
          case Some(GapState(last, e, seeded)) =>
            val gap = p.ts_ms - last
            // first gap seeds the EWMA; after that e' = (gap + e)/2
            val e2 = if (!seeded) gap.toDouble else (gap.toDouble + e) / 2.0
            cur = Some(GapState(p.ts_ms, e2, seeded = true))
            Some(GapRow(node, p.ts_ms, gap, e2))
        }
        r
      }.toVector
      cur.foreach(st.update)
      out.iterator
    }
  }

  /** Packets stream → smoothed inter-arrival rows. Requires the RocksDB
    * state store provider, as [[RunningStats.totalsStream]]. */
  def gapEwmaStream(packets: Dataset[Packet],
                    ttlMs: Long = 60L * 60 * 1000): Dataset[GapRow] = {
    val spark = packets.sparkSession
    import spark.implicits._
    packets.groupByKey(_.node)
      .transformWithState(new Processor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
