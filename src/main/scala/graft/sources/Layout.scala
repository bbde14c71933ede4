package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Storage layout for the append-only fact tables (SURVEY.md §1.1): the
  * reference appends rows to flat heap tables; at 100 TB the layout IS the
  * query plan, so the engine writes time-partitioned parquet (partition
  * pruning for time-range scans — every query in graphdata.py is a time
  * slice) and offers node-bucketed tables (co-located joins/aggs on the
  * hot key without a shuffle).
  */
object Layout {

  /** Append a fact frame day-partitioned: `WHERE ds = …` / time-range
    * predicates prune whole directories at planning time. */
  def writeTimePartitioned(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn("ds", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode("append").partitionBy("ds").parquet(path)

  def readTimePartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Save bucketed-by-key (and sorted within buckets): equi-joins and
    * aggregations on `key` between co-bucketed tables skip the shuffle
    * entirely. Catalog-managed (bucketing metadata lives in the table). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8, sortCol: String = ""): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sortCol.nonEmpty) w.sortBy(sortCol) else w).saveAsTable(table)
  }

  /** Small-file compaction — the maintenance pass every long-running
    * ingest needs: streaming epochs leave one file per (epoch, partition)
    * and a year of micro-batches turns a day's directory into thousands
    * of KB-sized parquet files that throttle every scan on open/footer
    * overhead. Rewrites the table with a REBALANCE repartition on the
    * partition column: AQE both COALESCES undersized shuffle partitions
    * and SPLITS skewed ones to the advisory size, so each `ds` directory
    * lands as ~`advisoryBytes` files — few files for quiet days, several
    * for hot days — with zero hand-tuned file counts. Writes to a new
    * location (`dest`); swapping it in atomically is the same
    * stage-then-swap story as [[Jdbc.writeEpoch]] — compacting in place
    * over the directory being scanned is how tables get corrupted. */
  /** Insert one zero bit between each of the 16 low bits of `x` — the
    * standard mask-and-shift spread (pure integer ops, identical in any
    * engine; Spark codegens the whole chain into one expression). */
  private def spread16(x: Column): Column =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
      .foldLeft(x.bitwiseAND(lit(0xFFFFL))) { case (acc, (s, mask)) =>
        shiftleft(acc, s).bitwiseOR(acc).bitwiseAND(lit(mask))
      }

  /** r4: Z-order layout + the data-skipping evidence for it. At 100 TB
    * the multi-dimensional clustering of the WRITE is what decides
    * whether a point/range predicate reads 0.1% or 100% of the files:
    * min/max footer stats prune a file only if the sort key correlates
    * with the predicate column. A time-sorted layout interleaves every
    * node into every file (node predicates prune nothing); a Z-order
    * curve over (node, hour) bounds BOTH dimensions per file. Each
    * dimension is first min-max-normalized to the same 8-bit budget —
    * the step every production z-order does (rank or range
    * normalization): interleaving RAW values lets whichever dimension
    * has more varying bits own all the high z bits, and the curve
    * degenerates to a single-column sort. Bounds come from a 1-row agg
    * broadcast back over the input (two cheap scans, no shuffle of the
    * fact side); bucket = (x−lo)·256 div (hi−lo+1) is pure integer
    * arithmetic. The query then simulates both layouts by slicing each
    * total order into `blockRows`-row "files" and reports the per-layout
    * min/max-pruning outcome for a point predicate `user_id =
    * probeUser` — n_blocks, blocks a min/max index cannot skip, and the
    * rows inside them. The two global row_numbers are the
    * determinism-first stand-in for the writer's range sort (the
    * production path is a range-partitioned write of the same key,
    * [[compactTimePartitioned]]-style); everything downstream is
    * integer-exact. */
  /** The 256×256-bucketed (user, hour) frame both curve layouts index:
    * min-max normalization bounds from a 1-row agg broadcast back over
    * the input, bucket = (x−lo)·256 div (hi−lo+1) pure integer. */
  private def curveBase(events: DataFrame): DataFrame = {
    val raw = events.select(col("event_id"), col("user_id"), col("ts"),
      expr("unix_micros(ts) div 3600000000").as("hu"))
    val bounds = raw.agg(
      min(col("user_id")).as("u_lo"), max(col("user_id")).as("u_hi"),
      min(col("hu")).as("h_lo"), max(col("hu")).as("h_hi"))
    def bucket(x: String, lo: String, hi: String): Column =
      expr(s"(($x - $lo) * 256) div ($hi - $lo + 1)")
    raw.crossJoin(broadcast(bounds))
      .withColumn("ub", bucket("user_id", "u_lo", "u_hi"))
      .withColumn("hb", bucket("hu", "h_lo", "h_hi"))
      .withColumn("z",
        spread16(col("ub")).bitwiseOR(shiftleft(spread16(col("hb")), 1)))
  }

  /** Slice a total order into `blockRows`-row "files" and report the
    * min/max-pruning outcome for `user_id = probeUser` (the simulated
    * footer-stats skip a real writer's range sort would produce). */
  private def layoutStats(base: DataFrame, blockRows: Int, probeUser: Long,
                          name: String, order: Seq[Column]): DataFrame =
    base
      .withColumn("rk", row_number().over(Window.orderBy(order: _*)))
      .withColumn("blk", expr(s"(rk - 1) div $blockRows"))
      .groupBy(col("blk"))
      .agg(min(col("user_id")).as("u_min"), max(col("user_id")).as("u_max"),
        count(lit(1)).as("n"))
      .withColumn("hit", col("u_min") <= probeUser && col("u_max") >= probeUser)
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("blocks_hit"),
        sum(when(col("hit"), col("n")).otherwise(0L)).as("rows_hit"))
      .select(lit(name).as("layout"), col("n_blocks"), col("blocks_hit"),
        col("rows_hit"))

  def zorderSkipping(events: DataFrame, blockRows: Int = 512,
                     probeUser: Long = 42L): DataFrame = {
    val base = curveBase(events)
    layoutStats(base, blockRows, probeUser, "time_sorted",
        Seq(col("ts"), col("event_id")))
      .unionByName(layoutStats(base, blockRows, probeUser, "z_sorted",
        Seq(col("z"), col("event_id"))))
      .orderBy("layout")
  }

  /** r9: Hilbert-curve layout next to the Z-order one — the curve every
    * production clustering service has been migrating TO (Delta's
    * liquid clustering, BigQuery clustering): Z-order's bit interleave
    * has "seams" where consecutive keys jump across the key space (at
    * every power-of-two boundary the curve teleports), so a block of
    * consecutive z values can span a wide (user, hour) rectangle; the
    * Hilbert curve is continuous (every consecutive pair of d values is
    * an adjacent cell), giving tighter per-file min/max bounds for the
    * same file size. The standard xy2d walk — per bit level s:
    * quadrant = (3·rx) XOR ry, d += s²·quadrant, then the reflect/swap
    * rotation — UNROLLED into 8 per-stage projections (one per bit of
    * the 256-cell grid): each stage materializes (hx, hy, hd) once, so
    * the expression tree stays linear instead of branching 3^8 ways,
    * and the whole chain is pure integer CASE/AND/XOR arithmetic —
    * bit-identical in any engine, fully inside one codegen stage, zero
    * extra exchanges over the z query (the curve index is map-side).
    * Output: the same three-way skipping decision table as
    * [[zorderSkipping]] plus the `hilbert_sorted` row — n_blocks /
    * blocks_hit / rows_hit per layout for the point probe, the
    * numbers that pick the write layout at 100 TB. */
  /** Append `hd` = the Hilbert-curve index of the 8-bit (`xCol`, `yCol`)
    * pair (256×256 grid, d ∈ [0, 65535]) — one materialized projection
    * per bit level so the expression tree stays linear. The curve laws
    * (bijectivity over the grid, unit-step adjacency of consecutive d)
    * are pinned by `HilbertSpec`. */
  def hilbertIndex(df0: DataFrame, xCol: String, yCol: String): DataFrame = {
    var df = df0.withColumn("hx", col(xCol)).withColumn("hy", col(yCol))
      .withColumn("hd", lit(0L))
    for (s <- Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L)) {
      val rx = when(col("hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      val ry = when(col("hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      df = df.withColumns(Map(
        "hd" -> (col("hd") + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)),
        "hx" -> when(ry === 0L, when(rx === 1L, lit(s - 1) - col("hy"))
          .otherwise(col("hy"))).otherwise(col("hx")),
        "hy" -> when(ry === 0L, when(rx === 1L, lit(s - 1) - col("hx"))
          .otherwise(col("hx"))).otherwise(col("hy"))))
    }
    df.drop("hx", "hy")
  }

  def hilbertSkipping(events: DataFrame, blockRows: Int = 512,
                      probeUser: Long = 42L): DataFrame = {
    val base = hilbertIndex(curveBase(events), "ub", "hb")
      .select(col("event_id"), col("user_id"), col("ts"), col("z"), col("hd"))
    layoutStats(base, blockRows, probeUser, "time_sorted",
        Seq(col("ts"), col("event_id")))
      .unionByName(layoutStats(base, blockRows, probeUser, "z_sorted",
        Seq(col("z"), col("event_id"))))
      .unionByName(layoutStats(base, blockRows, probeUser, "hilbert_sorted",
        Seq(col("hd"), col("event_id"))))
      .orderBy("layout")
  }

  def compactTimePartitioned(spark: SparkSession, src: String, dest: String,
                             advisoryBytes: Long = 128L << 20): Unit = {
    val prev = spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisoryBytes.toString)
    try
      spark.read.parquet(src)
        .hint("rebalance", col("ds"))
        .write.mode("overwrite").partitionBy("ds").parquet(dest)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", v)
      case None => spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }

}
