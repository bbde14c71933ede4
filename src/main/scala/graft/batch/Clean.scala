package graft.batch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Det._

/** The cleandata.py parity chain (SURVEY.md §3.3): union N inputs → parse
  * timestamps with null-on-failure → drop unparseable rows → convert
  * UTC → Pacific → sort → project → round → format. One lazy DataFrame
  * chain; Catalyst fuses the scalar steps into a single codegen stage.
  */
object Clean {

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.types._

  /** PurpleAir CSV schema (reference cleandata.py:22,32-40; FIXTURES.md §A3).
    * Everything nullable — numeric parse failures coerce to NULL. */
  val purpleAirSchema: StructType = StructType(Seq(
    StructField("UTCDateTime", StringType),
    StructField("current_temp_f", DoubleType),
    StructField("current_humidity", DoubleType),
    StructField("pressure", DoubleType),
    StructField("pm1_0_atm", DoubleType),
    StructField("pm2_5_atm", DoubleType),
    StructField("pm10_0_atm", DoubleType)))

  /** The exact cleandata.py chain over real CSV files: union N files →
    * parse UTC timestamps (null-on-failure) → drop unparseable rows →
    * UTC→Pacific → sort → project 7 cols → round to 3 decimals → format.
    * Output matches purpleairCLEAN.csv's shape (cleandata.py:51-52). */
  def cleanCsvFiles(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(purpleAirSchema)
      .csv(paths: _*)                                                 // U1
      .withColumn("ts", try_to_timestamp(col("UTCDateTime")))         // F4
      .na.drop(Seq("ts"))                                             // P4
      .withColumn("pacific",
        from_utc_timestamp(col("ts"), "America/Los_Angeles"))         // F5
      .select(                                                        // F1/F3/F6
        date_format(col("pacific"), "yyyy-MM-dd HH:mm:ss").as("PacificTime"),
        col("current_temp_f"),
        col("current_humidity"),
        round(col("pressure"), 3).as("pressure"),
        round(col("pm1_0_atm"), 3).as("pm1_0_atm"),
        round(col("pm2_5_atm"), 3).as("pm2_5_atm"),
        round(col("pm10_0_atm"), 3).as("pm10_0_atm"))
      .orderBy("PacificTime", "current_temp_f")                       // O1

  /** Composite declared query (`clean_pipeline`) over the events fixture:
    * two "CSV files" (event-type slices rendered to strings) unioned and
    * pushed through the full chain. */
  def cleanPipeline(events: DataFrame): DataFrame = {
    def asCsvish(tpe: String): DataFrame =
      events.filter(col("event_type") === tpe).select(
        col("event_id"),
        fmtTs(col("ts")).as("utc_str"),         // strings, as read from CSV
        col("value").cast("string").as("value_str"))
    val unioned = asCsvish("click").unionByName(asCsvish("view"))     // U1
    unioned
      .withColumn("ts", try_to_timestamp(col("utc_str"),
        lit("yyyy-MM-dd HH:mm:ss.SSSSSS")))                           // F4
      .na.drop(Seq("ts"))                                             // P4
      .withColumn("pacific",
        from_utc_timestamp(col("ts"), "America/Los_Angeles"))         // F5
      .withColumn("value", col("value_str").cast("double"))           // F12
      .select(                                                        // F1/F3/F6
        col("event_id"),
        date_format(col("pacific"), "yyyy-MM-dd HH:mm:ss").as("pacific_time"),
        round(col("value"), 3).as("value_r"))
      .orderBy("event_id")                                            // O1 (total)
  }

  /** r4: winsorization — clip each reading to its class's discrete
    * [p01, p99] band, the standard outlier treatment before averaging
    * sensor data (a stuck sensor's 10⁶ spike otherwise owns the mean;
    * dropping rows (P6) loses the observation, clipping keeps it at the
    * boundary). The percentile bounds use the same discrete value-at-
    * ceil(q·n) definition as `agg_quantiles` (no interpolation), and the
    * clip is `least/greatest` — pure SELECTIONS of existing doubles, zero
    * arithmetic, so the output hash-matches trivially. Plan: one window +
    * one hash agg compute the tiny per-class bounds; the clip itself is a
    * broadcast join back onto the facts (the big side never shuffles). */
  def cleanWinsorize(events: DataFrame, lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    val counted = events
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    val bounds = counted.groupBy(col("event_type"))
      .agg(max(when(col("rn") === ceil(col("n") * lo), col("value"))).as("lo_v"),
        max(when(col("rn") === ceil(col("n") * hi), col("value"))).as("hi_v"))
    events.join(broadcast(bounds), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        least(greatest(col("value"), col("lo_v")), col("hi_v")).as("value_w"))
      .orderBy("event_id")
  }
}
