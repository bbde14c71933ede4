package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixture tables (TESTDATA.md).
  *
  * Every declared query takes `(spark, sfDir)` and loads only the tables it
  * needs — column pruning + predicate pushdown then reach the parquet scan
  * untouched (no caching layer in between, by design).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet's `ts` encoding has drifted across fixture generations;
    * normalize every variant to a session-zone `TimestampType` so downstream
    * operators can rely on `unix_micros` / `date_trunc` uniformly:
    *
    *  - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so
    *    read nanos as long (legacy conf) and convert with integer `div`
    *    (data is µs-grained: nanos % 1000 == 0 — lossless, and matches
    *    DuckDB's µs view of the same file);
    *  - parquet timestamp[us] WITHOUT timezone: Spark 4 reads TIMESTAMP_NTZ,
    *    which `unix_micros` rejects; every entrypoint pins the session zone
    *    to UTC, so a plain cast to TimestampType reinterprets the naive
    *    micros as UTC — bit-identical to DuckDB's naive-microsecond view;
    *  - parquet timestamp[us] WITH timezone: already TimestampType, no-op. */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", df.col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
