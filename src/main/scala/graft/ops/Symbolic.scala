package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** r10b: symbolic time-series representation (PAA / SAX) — the
  * dimensionality-reduction pair the similarity tier uses for SERIES the
  * way PQ/LSH serve vectors: Piecewise Aggregate Approximation collapses
  * an observed hourly series to S equal-occupancy segments (Keogh et al.
  * 2001), and SAX (Lin et al. 2003) quantizes the z-normalized segment
  * means against fixed Gaussian breakpoints into a small alphabet — the
  * representation behind wholesale series indexing, motif discovery and
  * anomaly grammars. At 100 TB the win is the same as PQ's: a decade of
  * hourly history per key becomes a 16-symbol word that any equi-join can
  * bucket.
  *
  * EXACTNESS: segment assignment is pure integer arithmetic on the
  * observed-sequence position (seg = (rn−1)·S div n — equal-occupancy,
  * the standard n∤S treatment); per-segment sums and the global power
  * sums accumulate in DECIMAL(38,0) and cross once via the 2^53 split;
  * the z chain (one mean divide, one sqrt, one normalize divide per
  * segment) is textually mirrored in the oracle, and the breakpoint
  * COMPARISONS (±0.6745, 0) are decisions on identically-computed
  * doubles — the same determinism contract as the fold tier's band
  * flips (`window_supertrend`). Population σ (divide by n), stated.
  *
  * SCALE: one (class, hour) hash agg collapses the scan; everything
  * after rides the span-bounded hourly frame (class-key windows, S-row
  * output per class). Reference anchor: the fleet dashboards' downsample
  * views (`AIRWISEv0.py:120-160`) taken to the representation-learning
  * endpoint. */
object Symbolic {
  private val dec = DecimalType(38, 0)
  private val d2 = graft.Det.decToDouble _

  /** The shared observed-hourly frame with sequence position and class
    * length. */
  private def indexed(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("y"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("nh",
        count(lit(1)).over(Window.partitionBy(col("event_type"))))
  }

  /** PAA: S equal-occupancy segments per class over the observed hourly
    * series — per segment the observation count, EXACT integer sum, the
    * covered hour range, and the mean (one divide). */
  def tsPaa(events: DataFrame, segments: Int = 16): DataFrame = {
    val seg = indexed(events)
      .withColumn("seg",
        call_function("div", (col("rn") - 1) * segments, col("nh")))
    seg.groupBy(col("event_type"), col("seg"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("y").cast(dec)).as("sy"),
        graft.Det.fmtTsSec(min(col("hr"))).as("from_hour"),
        graft.Det.fmtTsSec(max(col("hr"))).as("to_hour"))
      .select(col("event_type"), col("seg"), col("n_obs"),
        col("from_hour"), col("to_hour"),
        col("sy").cast("long").as("sum_y"),
        (d2(col("sy")) / col("n_obs").cast("double")).as("paa_mean"))
      .orderBy("event_type", "seg")
  }

  /** SAX: the PAA means z-normalized against the CLASS's own mean/σ
    * (population, stated) and quantized to the 4-letter alphabet at the
    * standard Gaussian breakpoints {−0.6745, 0, +0.6745}. Per-segment
    * rows carry the z and the symbol; the class word is the symbols read
    * in segment order. A flat class (σ = 0) emits NULL z and the middle
    * symbol 'b' by convention (stated). */
  def tsSaxSymbols(events: DataFrame, segments: Int = 16): DataFrame = {
    val idx = indexed(events)
      .withColumn("seg",
        call_function("div", (col("rn") - 1) * segments, col("nh")))
    val stats = idx.groupBy(col("event_type")).agg(
      max(col("nh")).as("n"),
      sum(col("y").cast(dec)).as("sy"),
      sum((col("y") * col("y")).cast(dec)).as("syy"))
    val segs = idx.groupBy(col("event_type"), col("seg"))
      .agg(count(lit(1)).as("n_obs"), sum(col("y").cast(dec)).as("ss"))
    val nd = col("n").cast("double")
    // population variance via n-scaled centered moments: (n·Σy² − (Σy)²)/n²
    val varN = (nd * d2(col("syy")) - d2(col("sy")) * d2(col("sy"))) / (nd * nd)
    val joined = segs.join(broadcast(stats), Seq("event_type"))
      .withColumn("mu", d2(col("sy")) / nd)
      .withColumn("sigma", sqrt(varN))
      .withColumn("z",
        when(col("sigma") > 0,
          (d2(col("ss")) / col("n_obs").cast("double") - col("mu")) / col("sigma")))
      .withColumn("symbol",
        when(col("z").isNull, lit("b"))
          .when(col("z") < lit(-0.6745), lit("a"))
          .when(col("z") < lit(0.0), lit("b"))
          .when(col("z") < lit(0.6745), lit("c"))
          .otherwise(lit("d")))
    joined
      .select(col("event_type"), col("seg"), col("n_obs"),
        (d2(col("ss")) / col("n_obs").cast("double")).as("paa_mean"),
        col("z"), col("symbol"))
      .orderBy("event_type", "seg")
  }
}
