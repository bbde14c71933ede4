package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Det._

/** Scalar / projection operators (SURVEY.md §2.2, F1–F14 + S2).
  *
  * Reference behaviors: cleandata.py's projection/rounding/tz chain,
  * AIRWISEv0.py's JSON field extraction with null-on-absence
  * (AIRWISEv0.py:105-153), AIRWISEv1.py's CSV-in-text split
  * (AIRWISEv1.py:130-140). All pure `DataFrame => DataFrame` column
  * expressions — codegen'd, no UDFs, so they stay inside whole-stage
  * codegen and survive Catalyst pushdown/pruning untouched.
  */
object Scalars {

  /** S2: typed CSV parse with coercion — from_csv over a text line
    * (the v1 daemon's CSV-in-text payload, AIRWISEv1.py:130-140). */
  def scanCsvTyped(events: DataFrame): DataFrame = {
    val schema = "user_id BIGINT, event_type STRING, value DOUBLE"
    events
      .select(col("event_id"),
        concat_ws(",", col("user_id"), col("event_type"), col("value")).as("line"))
      .select(col("event_id"),
        from_csv(col("line"), StructType.fromDDL(schema), Map.empty[String, String]).as("r"))
      .select(col("event_id"), col("r.user_id"), col("r.event_type"), col("r.value"))
      .orderBy("event_id")
  }

  /** S2b: typed JSON-line parse — from_json with an explicit schema over a
    * constructed JSON payload (the v0 daemon's whole-message json.loads,
    * AIRWISEv0.py:105-153, as a TYPED parse rather than the per-field
    * extraction of json_extract_fields). Round-trip exact: to_json renders
    * doubles in shortest round-trip form, so the parsed values are
    * bit-identical to the source columns and the oracle is a plain
    * projection. */
  def scanJsonlTyped(events: DataFrame): DataFrame = {
    val schema = "user_id BIGINT, event_type STRING, value DOUBLE"
    events
      .select(col("event_id"),
        to_json(struct(col("user_id"), col("event_type"), col("value"))).as("line"))
      .select(col("event_id"),
        from_json(col("line"), StructType.fromDDL(schema)).as("r"))
      .select(col("event_id"), col("r.user_id"), col("r.event_type"), col("r.value"))
      .orderBy("event_id")
  }

  /** F1: explicit column-subset projection (cleandata.py:32-42). */
  def projectColumns(customer: DataFrame): DataFrame =
    customer.select("c_custkey", "c_name", "c_mktsegment").orderBy("c_custkey")

  /** F2: °F→°C arithmetic (graphdata.py:24). Pure IEEE double ops — same
    * bits in any engine evaluating (x-32)*5/9 left-to-right. */
  def unitConvertFtoC(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      col("value").as("temp_f"),
      ((col("value") - lit(32)) * lit(5) / lit(9)).as("temp_c")
    ).orderBy("event_id")

  /** F3: round metric columns (cleandata.py:44-46). Derived metrics round
    * via floor(x*100+0.5)/100 — pure IEEE ops, so the result is identical in
    * any engine (round() half-way handling is engine-specific). */
  def roundMetrics(lineitem: DataFrame): DataFrame =
    lineitem.select(
      col("l_orderkey"), col("l_linenumber"),
      round(col("l_quantity"), 3).as("quantity_r"),
      round(col("l_extendedprice"), 3).as("price_r"),
      (floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + lit(0.5)) / 100)
        .as("revenue_r")
    ).orderBy("l_orderkey", "l_linenumber", "quantity_r", "price_r", "revenue_r")

  /** F4: string → timestamp, NULL on malformed (cleandata.py:22). */
  def parseTimestamp(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      fmtTsSec(try_to_timestamp(fmtTsSec(col("ts")))).as("parsed"),
      fmtTsSec(try_to_timestamp(col("event_type"))).as("parsed_bad")
    ).orderBy("event_id")

  /** F5: UTC → America/Los_Angeles wall time (cleandata.py:27). */
  def tzUtcToPacific(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      fmtTsSec(col("ts")).as("utc_time"),
      fmtTsSec(from_utc_timestamp(col("ts"), "America/Los_Angeles")).as("pacific_time")
    ).orderBy("event_id")

  /** F6: timestamp → 'yyyy-MM-dd HH:mm:ss' string (cleandata.py:48,
    * AIRWISEv0.py:135). */
  def formatTimestamp(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      fmtTsSec(col("ts")).as("formatted")
    ).orderBy("event_id")

  /** F7: unix epoch seconds → timestamp (AIRWISEv0.py:134,151). Derives the
    * epoch from ts (floor to seconds, like the device clock) then maps back. */
  def epochToTimestamp(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      unix_micros(col("ts")).as("epoch_us"),
      fmtTsSec(timestamp_seconds(floor(unix_micros(col("ts")) / lit(1000000L)))).as("from_epoch")
    ).orderBy("event_id")

  /** F8: strip a literal timezone suffix before parsing (graphdata.py:50-53). */
  def stripTzSuffix(events: DataFrame): DataFrame = {
    val suffixed = concat(fmtTsSec(col("ts")), lit(" Pacific Standard Time"))
    events.select(
      col("event_id"),
      suffixed.as("raw"),
      fmtTsSec(try_to_timestamp(regexp_replace(suffixed, " Pacific Standard Time", ""))).as("parsed")
    ).orderBy("event_id")
  }

  /** F9: split comma-packed text payload, cast each field to double
    * (AIRWISEv1.py:130-140). Round-trips lineitem metrics through a CSV
    * string; shortest-roundtrip double rendering parses back exactly. */
  def splitCsvText(lineitem: DataFrame): DataFrame = {
    val line = concat_ws(",", col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    // Pinned A/B (sf0.1, local[32], best-of-2) for the r2 driver reading of
    // 2.56 s: split() 1.81 s ≈ substring_index (regex-free) 1.85 s ≈
    // scan_parquet's scan+total-sort floor 1.86 s — the timing is the
    // fixture's 60k-row 5-column oracle-parity sort, not the CSV round
    // trip, and the driver outlier was host-load variance.
    lineitem
      .select(col("l_orderkey"), col("l_linenumber"), split(line, ",").as("parts"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        element_at(col("parts"), 1).cast(DoubleType).as("f_quantity"),
        element_at(col("parts"), 2).cast(DoubleType).as("f_price"),
        element_at(col("parts"), 3).cast(DoubleType).as("f_discount")
      ).orderBy("l_orderkey", "l_linenumber", "f_quantity", "f_price", "f_discount")
  }

  /** JSON envelope payload schema for events.props. */
  val propsSchema: StructType = StructType(Seq(
    StructField("k", LongType),
    StructField("missing_field", StringType)))

  /** F10: JSON string → typed columns, NULL when absent
    * (AIRWISEv0.py:105-153 schema-on-read semantics). */
  def jsonExtractFields(events: DataFrame): DataFrame =
    events
      .select(col("event_id"), from_json(col("props"), propsSchema).as("p"))
      .select(col("event_id"), col("p.k").as("k"), col("p.missing_field").as("missing_field"))
      .orderBy("event_id")

  /** F11: `.get(key, default)` null-coalescing (AIRWISEv0.py:132-135). */
  def nullCoalesceDefaults(events: DataFrame): DataFrame =
    events
      .select(col("event_id"), from_json(col("props"), propsSchema).as("p"))
      .select(
        col("event_id"),
        coalesce(col("p.k"), lit(-1L)).as("k_or_default"),
        coalesce(col("p.missing_field"), lit("unknown")).as("missing_or_default")
      ).orderBy("event_id")

  /** F12: numeric coercion, NULL on bad value (graphdata.py:35-37).
    * try_cast semantics — matches DuckDB TRY_CAST. */
  def tryCastNumeric(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      try_cast(col("event_type"), DoubleType).as("bad_cast"),
      try_cast(get_json_object(col("props"), "$.k"), DoubleType).as("good_cast")
    ).orderBy("event_id")

  /** F13: content-based routing tag (AIRWISEv0.py:112,126,165-168). */
  def conditionalRouteTag(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("event_type"),
      when(col("event_type").isin("purchase", "signup"), lit("transactional"))
        .when(col("event_type") === "error", lit("ops"))
        .otherwise(lit("engagement")).as("route")
    ).orderBy("event_id")

  /** F14: human-label assembly (AIRWISEv0.py:54-56,187-189). */
  def stringConcatLabel(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      concat(lit("node "), col("user_id").cast(StringType),
             lit(" sent "), col("event_type")).as("label")
    ).orderBy("event_id")

  private def try_cast(c: org.apache.spark.sql.Column, t: DataType): org.apache.spark.sql.Column =
    c.try_cast(t)
}
