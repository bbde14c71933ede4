package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.Jdbc
import graft.stream.Ingest
import graft.model.Schemas

/** S4 deployment parity: the JDBC epoch writer (idempotence under retry)
  * and the full streaming ingest → Derby round trip. */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private def derbyUrl(db: String) = s"jdbc:derby:memory:$db;create=true"

  test("writeEpoch is idempotent: rewriting an epoch leaves one copy") {
    val url = derbyUrl("graft_idem")
    val batch = Seq((1L, 20.5), (2L, 21.5)).toDF("node", "temperature")
    Jdbc.writeEpoch(batch, url, "t_idem", epochId = 0L)
    // retried epoch (foreachBatch at-least-once): same data, same epoch
    Jdbc.writeEpoch(batch, url, "t_idem", epochId = 0L)
    // a new epoch appends
    val batch1 = Seq((3L, 22.5)).toDF("node", "temperature")
    Jdbc.writeEpoch(batch1, url, "t_idem", epochId = 1L)
    val back = spark.read.jdbc(url, "t_idem", new java.util.Properties)
    assert(back.count() == 3)
    assert(back.filter(col("epoch") === 0L).count() == 2)
    assert(back.filter(col("epoch") === 1L).count() == 1)
  }

  test("a failed attempt's stage stragglers never reach the visible table") {
    val url = derbyUrl("graft_stage")
    val batch = Seq((1L, 20.5)).toDF("node", "temperature")
    Jdbc.writeEpoch(batch, url, "t_stage", epochId = 0L)
    // simulate a crashed attempt: rows parked in the stage for epoch 1
    // (loaded but the swap transaction never ran)
    Seq((9L, 99.9)).toDF("node", "temperature").withColumn("epoch", lit(1L))
      .withColumn("part", lit(0))
      .write.mode("append").jdbc(url, "t_stage_stage", new java.util.Properties)
    // the retry writes DIFFERENT data for epoch 1 — stragglers must be
    // discarded, not merged
    Jdbc.writeEpoch(Seq((3L, 22.5)).toDF("node", "temperature"), url, "t_stage", 1L)
    val back = spark.read.jdbc(url, "t_stage", new java.util.Properties)
    assert(back.count() == 2)
    assert(back.filter(col("epoch") === 1L).collect().map(_.getAs[Long]("node")).toSeq == Seq(3L))
    // and the stage ends the write empty for that epoch
    val stage = spark.read.jdbc(url, "t_stage_stage", new java.util.Properties)
    assert(stage.filter(col("epoch") === 1L).count() == 0)
  }

  test("table identifiers are validated before SQL interpolation") {
    val batch = Seq((1L, 20.5)).toDF("node", "temperature")
    intercept[IllegalArgumentException] {
      Jdbc.writeEpoch(batch, derbyUrl("graft_ident"), """t"; DROP TABLE x--""", 0L)
    }
  }

  test("streaming ingest lands routed rows in Derby, enriched") {
    implicit val sqlCtx = spark.sqlContext
    val url = derbyUrl("graft_ingest")
    val ckpt = Files.createTempDirectory("graft_jdbc_ckpt").toString
    val input = MemoryStream[String]
    val dim = Schemas.nodeDimSeed.toDF("node", "topic_id", "longname")
    // add BEFORE start: AvailableNow snapshots offsets at query start
    input.addData(
      """{"from":1127718912,"payload":{"barometric_pressure":1013.2,"gas_resistance":120000.5,"iaq":51,"relative_humidity":40.2,"temperature":21.5},"timestamp":1760748340,"type":"telemetry"}""",
      """{"from":1127718912,"payload":{"battery_level":92,"voltage":4.01},"timestamp":1760748350,"type":"telemetry"}""",
      "garbage that is not json")
    val q = Ingest.runIngestJdbc(input.toDF(), dim, url, ckpt)
    q.processAllAvailable()
    q.stop()
    val env = spark.read.jdbc(url, "airwise_data", new java.util.Properties)
    assert(env.count() == 1)
    val row = env.collect().head
    assert(row.getAs[Double]("temperature") == 21.5)
    assert(row.getAs[String]("longname") == "Farm1")
    assert(row.getAs[Long]("epoch") == 0L)
    val bat = spark.read.jdbc(url, "battery_data", new java.util.Properties)
    assert(bat.count() == 1)
  }
}
