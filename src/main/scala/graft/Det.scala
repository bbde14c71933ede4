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
    * DuckDB equivalent: CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)
    *
    * HAZARD CLASS (r7): the double→DECIMAL(28,6) cast ROUNDS at the 6th
    * decimal, and on near-half-way mantissas the two engines' conversion
    * paths can land one decimal-ulp apart (observed: `stat_changepoint_
    * cusum`'s old (v − mean)·cast chain, 3 mismatches at sf0.1 — green at
    * sf0.01 was fixture luck). Safe uses: RAW column values and products
    * of raw values (fixture doubles round-trip; proven across the suite
    * at all three SFs). For COMPUTED doubles (differences/means fed back
    * into a decimal cast), quantize ONCE via floor(x·10⁶ + 0.5) — every
    * op a single deterministic IEEE op — and stay in integer units, the
    * cusum rework's pattern. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast(DoubleType)

  /** Order-independent mean: exact decimal sum / count, divided in double.
    * DuckDB equivalent:
    *   CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(x) */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Exact-integer DECIMAL → double, deterministic across engines PAST
    * 2^53 (r6): DuckDB's int128→double conversion is not correctly
    * rounded above 2^53 (observed 1-ulp drift on a Σc⁴ of ~3·10¹⁹), so a
    * bare `CAST(big AS DOUBLE)` can never hash-match Spark's correctly-
    * rounded BigDecimal path. Split base-2^53 instead: |x| = hi·2^53 +
    * lo with hi, lo < 2^53 — both casts are EXACT in any engine — then
    * one multiply and one add, each a single correctly-rounded IEEE op,
    * give bit-identical results everywhere (not necessarily the
    * correctly-rounded value of x itself; deterministic beats last-ulp
    * perfection, the [[dsum]] philosophy). Valid for |x| < 2^106;
    * sign handled explicitly because the engines' integral-divide
    * conventions for negatives need not agree: Spark truncates, and the
    * installed DuckDB truncates too (observed: -7//2 = -3, -7%2 = -1),
    * but DuckDB has documented flooring `//` semantics in other
    * versions. The CASE/abs form pins ONE decomposition (|x| = hi·2^53
    * + lo, both non-negative, each exact in double) so the single
    * add-round is identical under either division convention.
    * DuckDB equivalent (see SparkEntry's D2D macro):
    *   CASE WHEN x < 0 THEN -(...) ELSE (...) END with
    *   (CAST(@x // 9007199254740992 AS DOUBLE) * 9007199254740992.0 +
    *    CAST(@x % 9007199254740992 AS DOUBLE)) over @x = abs(x) */
  def decToDouble(c: Column): Column = {
    val b = lit(9007199254740992L) // 2^53
    def pos(a: Column): Column = {
      val hi = call_function("div", a, b)
      val lo = (a % b).cast("long")
      hi.cast(DoubleType) * lit(9007199254740992.0) + lo.cast(DoubleType)
    }
    when(c < 0, -pos(-c)).otherwise(pos(c))
  }

  /** Driver-side twin of [[decToDouble]] for the r13 collected-fixpoint
    * operators (markov, neyman, gesd): identical decomposition (hi = x div
    * 2^53 cast long→double, lo = x mod 2^53 cast long→double) and the same
    * two IEEE ops, so a BigInt that mirrors a DECIMAL(38,0) value converts
    * bit-identically to what the distributed plan produced. */
  def decToDoubleLocal(x: BigInt): Double = {
    val b = BigInt(9007199254740992L) // 2^53
    def pos(a: BigInt): Double =
      (a / b).toLong.toDouble * 9007199254740992.0 + (a % b).toLong.toDouble
    if (x < 0) -pos(-x) else pos(x)
  }

  /** Driver-side twin of Spark's ascending string order for ORDER BY /
    * window tie-breaks: UTF8String binary comparison (unsigned byte-wise
    * over UTF-8), NULLS FIRST — NOT String.compareTo, which orders by
    * UTF-16 code units and diverges beyond the BMP. Used by the r13
    * collected-fixpoint operators to reproduce a distributed sort order
    * exactly on driver-collected rows. */
  def utf8NullsFirstLt(a: String, b: String): Boolean = {
    if (a == null) return b != null
    if (b == null) return false
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }
}
