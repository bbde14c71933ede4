package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** r13 optimization round: the collected-fixpoint rewrites (markov pair,
  * neyman allocation, GESD peel) moved exact arithmetic from distributed
  * plans onto the driver. The oracle re-verify proves the RESULTS; this
  * spec pins the two driver-side primitives those rewrites rely on, so a
  * future edit that drifts either is caught by name rather than by a
  * downstream hash mismatch:
  *
  *  - [[Det.decToDoubleLocal]] must be bit-identical to the distributed
  *    [[Det.decToDouble]] column (the 2^53-split double conversion);
  *  - [[Det.utf8NullsFirstLt]] must reproduce Spark's ascending string
  *    sort (UTF8String binary order, NULLS FIRST) — NOT String.compareTo,
  *    which orders supplementary-plane characters differently.
  */
class R13OptSpec extends SparkSpec {

  test("decToDoubleLocal is bit-identical to the decToDouble column") {
    val vals: Seq[BigInt] = Seq(
      BigInt(0), BigInt(1), BigInt(-1), BigInt(12345678),
      BigInt(9007199254740992L),      // 2^53 exactly
      BigInt(9007199254740993L),      // 2^53 + 1 (not representable)
      BigInt("123456789012345678901234567890"),
      BigInt("-98765432109876543210987654321"),
      BigInt("17014118346046923173168730371588410572"), // near DECIMAL(38) top
      BigInt(Long.MaxValue), BigInt(Long.MinValue) + 1)
    val schema = StructType(Seq(StructField("x", DecimalType(38, 0))))
    val rows = vals.map(v => Row(new java.math.BigDecimal(v.bigInteger)))
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema)
      .select(col("x"), Det.decToDouble(col("x")).as("d"))
    val got = df.collect().map(r =>
      BigInt(r.getDecimal(0).toBigInteger) -> r.getDouble(1)).toMap
    vals.foreach { v =>
      val local = Det.decToDoubleLocal(v)
      val dist = got(v)
      assert(java.lang.Double.doubleToRawLongBits(local) ==
        java.lang.Double.doubleToRawLongBits(dist),
        s"decToDouble mismatch at $v: local=$local distributed=$dist")
    }
  }

  test("utf8NullsFirstLt reproduces Spark's ascending string sort") {
    // includes a supplementary-plane char (U+10000) vs U+FFFD: UTF-16
    // code-unit order puts the surrogate pair FIRST, UTF-8 byte order
    // puts it LAST — the case String.compareTo gets wrong.
    val vs: Seq[String] = Seq(
      null, "", "a", "A", "ab", "b", "zz", "é", "À",
      "�", new String(Character.toChars(0x10000)), "click", "view",
      "purchase", "error", "né", "ne", "zé", "za")
    import spark.implicits._
    val sparkOrder = vs.toDF("s").orderBy("s").collect().map(_.getString(0))
    val localOrder = vs.sortWith(Det.utf8NullsFirstLt)
    assert(sparkOrder.toSeq == localOrder,
      s"sort drift:\n spark=${sparkOrder.mkString("|")}\n local=${localOrder.mkString("|")}")
    // and String-natural order would NOT match (guards against a future
    // 'simplify to .sorted' edit): the supplementary char case differs
    val naive = vs.filter(_ != null).sorted
    val sparkNoNull = sparkOrder.filter(_ != null).toSeq
    assert(naive != sparkNoNull,
      "fixture no longer distinguishes UTF-8 from UTF-16 order — add a case")
  }
}
