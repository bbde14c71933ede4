package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism helpers for DuckDB-oracle parity (SURVEY.md §7.3).
  *
  * Floating-point aggregation order differs between engines, and timestamp
  * rendering differs between Spark and DuckDB. Every declared query routes
  * float aggregates and timestamp outputs through these helpers; the paired
  * oracle SQL uses the exactly-equivalent DuckDB spelling (documented per
  * helper) so values hash-match bit for bit.
  */
object Det {
  /** Timestamp -> string with full microseconds.
    * DuckDB equivalent: strftime(ts, '%Y-%m-%d %H:%M:%S.%f') */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Timestamp -> string at second precision.
    * DuckDB equivalent: strftime(ts, '%Y-%m-%d %H:%M:%S') */
  def fmtTsSec(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Exact sum of a double column: accumulate in DECIMAL(28,6) (associative,
    * order-independent) and cast the final value back to double.
    * DuckDB equivalent: CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast(DoubleType)

  /** Order-independent mean: exact decimal sum / count, divided in double.
    * DuckDB equivalent:
    *   CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(x) */
  def davg(c: Column): Column = dsum(c) / count(c)
}
