package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Idempotent table bootstrap (SURVEY.md §2.1 S5) — the Spark catalog form
  * of the reference's check-then-create DDL (EUREKATables.sh:17-60). */
object Ddl {

  /** CREATE TABLE IF NOT EXISTS with an explicit schema; returns true if
    * the table was created, false if it already existed. */
  def ensureTable(spark: SparkSession, name: String, schema: StructType,
                  format: String = "parquet"): Boolean = {
    if (spark.catalog.tableExists(name)) false
    else {
      val ddlCols = schema.toDDL
      spark.sql(s"CREATE TABLE IF NOT EXISTS $name ($ddlCols) USING $format")
      true
    }
  }

  /** Bootstrap all reference fact tables (airwise_data, battery_data,
    * airwise_datav1) into the session catalog. */
  def bootstrap(spark: SparkSession): Seq[(String, Boolean)] = {
    import graft.model.Schemas
    Seq(
      "airwise_data" -> Schemas.airwiseData,
      "battery_data" -> Schemas.batteryData,
      "airwise_datav1" -> Schemas.airwiseDataV1
    ).map { case (n, s) => n -> ensureTable(spark, n, s) }
  }
}
