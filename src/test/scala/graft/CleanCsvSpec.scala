package graft

import java.nio.file.Files
import graft.batch.Clean

/** cleandata.py parity over real CSV files: union, coercion, dropna,
  * tz conversion, projection, rounding, formatting (SURVEY.md §3.3). */
class CleanCsvSpec extends SparkSpec {

  test("two CSVs union, malformed rows coerce/drop, output matches reference shape") {
    val dir = Files.createTempDirectory("graft_csv")
    val f1 = dir.resolve("a.csv")
    val f2 = dir.resolve("b.csv")
    Files.writeString(f1,
      """UTCDateTime,current_temp_f,current_humidity,pressure,pm1_0_atm,pm2_5_atm,pm10_0_atm
        |2024-06-01 10:00:00,68.0,40.0,1013.25138,1.2345,2.5,10.0
        |not-a-timestamp,70.0,41.0,1000.0,1.0,2.0,3.0
        |""".stripMargin)
    Files.writeString(f2,
      """UTCDateTime,current_temp_f,current_humidity,pressure,pm1_0_atm,pm2_5_atm,pm10_0_atm
        |2024-06-01 11:00:00,notanumber,42.0,999.9999,0.1,0.2,0.3
        |""".stripMargin)
    val out = Clean.cleanCsvFiles(spark, Seq(f1.toString, f2.toString)).collect()
    // row with bad timestamp dropped; row with bad numeric kept (NULL temp)
    assert(out.length == 2)
    assert(out(0).getAs[String]("PacificTime") == "2024-06-01 03:00:00") // UTC-7 (PDT)
    assert(out(0).getAs[Double]("pressure") == 1013.251)                 // rounded to 3
    assert(out(0).getAs[Double]("pm1_0_atm") == 1.235) // HALF_UP at the 4th decimal
    assert(out(1).getAs[Any]("current_temp_f") == null)                  // coerce -> NULL kept
    assert(out(1).getAs[String]("PacificTime") == "2024-06-01 04:00:00")
    assert(out.head.schema.fieldNames.toSeq == Seq("PacificTime", "current_temp_f",
      "current_humidity", "pressure", "pm1_0_atm", "pm2_5_atm", "pm10_0_atm"))
  }
}
