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
}
