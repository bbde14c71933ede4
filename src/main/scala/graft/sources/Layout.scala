package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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
