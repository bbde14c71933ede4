package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming quantile estimates on the mergeable banded histogram — the
  * continuously-updated latency/size percentile monitor, and the
  * streaming twin of the batch `agg_quantiles_sketch`
  * ([[graft.ops.Aggs.aggQuantilesSketch]]). The keyed state is the whole
  * sketch: 64 power-of-2 band counters (one 512-byte long array per key,
  * no matter how many billions of rows flow past) — counter increments
  * are order- and batching-independent by construction, and the readout
  * reproduces the batch query's estimate chain OP FOR OP (ceil(q·n) rank,
  * cumulative walk, lo + lo·(offset/cnt) in-band interpolation, one final
  * /1000), so the estimate a micro-batch emits is BIT-IDENTICAL to the
  * batch query over the same prefix of the stream — the spec's oracle.
  * The band is computed UPSTREAM with the batch query's own band
  * function ([[graft.ops.Aggs.sketchBand]]), so stream and batch share
  * one bucketing by construction rather than by parallel
  * reimplementation. Like [[DistinctStats]], TTL evicts idle keys
  * natively. */
object QuantileSketchStream {

  /** Stream input: a grouping key and the power-of-2 band of the value
    * (compute with `Aggs.sketchBand` upstream; bands ≥ 64 are clamped —
    * band 63 already covers values ≥ 2^63/1000). */
  case class KeyedBand(key: String, band: Int)

  /** One output row per (key, micro-batch with data for it) — the same
    * (n, n_bands, p50/p90/p99 estimates) the batch query yields. */
  case class QuantileRow(key: String, n: Long, n_bands: Long,
      p50_est: Double, p90_est: Double, p99_est: Double)

  private val NBands = 64

  /** The batch query's readout, op for op: t = ceil(q·n) as one double
    * multiply + ceil; first band with cum ≥ t; est = (lo + lo·((t −
    * cum_before)/cnt)) / 1000 with lo = 2^band. */
  private[stream] def estimate(counts: Array[Long], q: Double): Double = {
    var n = 0L
    var i = 0
    while (i < NBands) { n += counts(i); i += 1 }
    val t = math.ceil(n * q).toLong
    var cum = 0L
    i = 0
    while (i < NBands) {
      val cnt = counts(i)
      if (cnt > 0 && cum + cnt >= t) {
        val lo = (1L << i).toDouble
        return (lo + lo * ((t - cum).toDouble / cnt.toDouble)) / 1000.0
      }
      cum += cnt
      i += 1
    }
    Double.NaN // unreachable for n > 0
  }

  private[stream] def ser(counts: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * NBands)
    var i = 0
    while (i < NBands) { bb.putLong(counts(i)); i += 1 }
    bb.array()
  }

  private[stream] def deser(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val counts = new Array[Long](NBands)
    var i = 0
    while (i < NBands) { counts(i) = bb.getLong; i += 1 }
    counts
  }

  class Processor(ttlMs: Long)
    extends StatefulProcessor[String, KeyedBand, QuantileRow] {

    @transient private var hist: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hist = getHandle.getValueState[Array[Byte]]("hist",
        Encoders.BINARY, TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(key: String, rows: Iterator[KeyedBand],
                                 timers: TimerValues): Iterator[QuantileRow] = {
      val counts =
        if (hist.exists()) deser(hist.get()) else new Array[Long](NBands)
      rows.foreach { r =>
        val b = if (r.band < 0) 0 else if (r.band >= NBands) NBands - 1 else r.band
        counts(b) += 1
      }
      hist.update(ser(counts))
      var n = 0L
      var nb = 0L
      var i = 0
      while (i < NBands) {
        n += counts(i)
        if (counts(i) > 0) nb += 1
        i += 1
      }
      Iterator(QuantileRow(key, n, nb,
        estimate(counts, 0.5), estimate(counts, 0.9), estimate(counts, 0.99)))
    }
  }

  /** (key, band) stream → per-micro-batch quantile estimates. Requires
    * the RocksDB state store provider, as [[DistinctStats]]. */
  def quantileStream(rows: Dataset[KeyedBand],
                     ttlMs: Long = 60L * 60 * 1000): Dataset[QuantileRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_.key)
      .transformWithState(new Processor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
