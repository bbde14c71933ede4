package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.stream.Ingest
import graft.model.Schemas

/** T1/T2 end-to-end: MemoryStream of golden packets → runIngest →
  * three routed parquet sinks, enriched, with at-least-once semantics. */
class IngestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest routes one pass into three sinks") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_ingest").toString
    val input = MemoryStream[String]
    val dim = Schemas.nodeDimSeed.toDF("node", "topic_id", "longname")

    // add BEFORE start: Trigger.AvailableNow snapshots available offsets at
    // query start, so data added after start() races the snapshot and can
    // be silently excluded on a slow host
    input.addData(
      """{"from":1127718912,"payload":{"barometric_pressure":1013.2,"gas_resistance":120000.5,"iaq":51,"relative_humidity":40.2,"temperature":21.5},"timestamp":1760748340,"type":"telemetry"}""",
      """{"from":1127718912,"payload":{"battery_level":92,"voltage":4.01},"timestamp":1760748350,"type":"telemetry"}""",
      """{"from":1127718913,"payload":{"text":"23.35,41.69,985.34,185623.00,1.00,1.00,1.00,4.98,148.62"},"timestamp":1760748360,"type":"text"}""",
      "garbage that is not json",
      """{"from":999,"payload":{"temperature":5.0},"timestamp":1760748370,"type":"telemetry"}""")
    val q = Ingest.runIngest(input.toDF().withColumnRenamed("value", "value"),
      dim, s"$dir/out", s"$dir/ckpt")
    q.processAllAvailable()
    q.stop()

    val env = spark.read.parquet(s"$dir/out/airwise_data")
    assert(env.count() == 2)
    // facts land day-partitioned on device time
    assert(env.columns.contains("ds"))
    assert(new java.io.File(s"$dir/out/airwise_data").listFiles()
      .exists(_.getName.startsWith("ds=")))
    // unknown node 999 kept with NULL enrichment
    assert(env.filter(col("node") === 999L).collect().head.getAs[String]("longname") == null)
    assert(env.filter(col("node") === 1127718912L).collect().head.getAs[String]("longname") == "Farm1")

    val bat = spark.read.parquet(s"$dir/out/battery_data")
    assert(bat.count() == 1)
    assert(bat.collect().head.getAs[Double]("battery_level") == 92.0)

    val v1 = spark.read.parquet(s"$dir/out/airwise_datav1")
    assert(v1.count() == 1)
    assert(v1.collect().head.getAs[Double]("pm2_5") == 1.0)
  }

  test("restart from checkpoint resumes without reprocessing committed epochs") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_restart").toString
    val input = MemoryStream[String]
    val dim = Schemas.nodeDimSeed.toDF("node", "topic_id", "longname")
    def env(node: Long, t: Long) =
      s"""{"from":$node,"payload":{"temperature":5.0},"timestamp":$t,"type":"telemetry"}"""
    // epoch 0: two environment packets
    input.addData(env(1127718912L, 1760748340L), env(1127718913L, 1760748341L))
    val q1 = Ingest.runIngest(input.toDF(), dim, s"$dir/out", s"$dir/ckpt")
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(s"$dir/out/airwise_data").count() == 2)
    // restart with the SAME checkpoint: only the new data forms the next
    // epoch — the committed offsets are not replayed, so no duplicates
    input.addData(env(999L, 1760748350L))
    val q2 = Ingest.runIngest(input.toDF(), dim, s"$dir/out", s"$dir/ckpt")
    q2.processAllAvailable(); q2.stop()
    val all = spark.read.parquet(s"$dir/out/airwise_data")
    assert(all.count() == 3, "restart must append exactly the new packet")
    // the replayed-epoch guard and the restart guard compose: epochs distinct
    assert(all.select("epoch").distinct().count() == 2)
  }

  test("epoch parquet write is idempotent: a retried epoch leaves one copy") {
    val dir = Files.createTempDirectory("graft_epoch").toString
    val b0 = Seq((1L, "2024-01-01", 20.5), (2L, "2024-01-02", 21.5))
      .toDF("node", "ds", "temperature")
    Ingest.writeEpochParquet(b0, 0L, dir, Seq("ds"))
    // at-least-once retry of the same epoch: dynamic partition overwrite
    // replaces epoch=0 rather than appending a second copy
    Ingest.writeEpochParquet(b0, 0L, dir, Seq("ds"))
    val b1 = Seq((3L, "2024-01-02", 22.5)).toDF("node", "ds", "temperature")
    Ingest.writeEpochParquet(b1, 1L, dir, Seq("ds"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    assert(back.filter(col("epoch") === 0L).count() == 2)
    assert(back.filter(col("epoch") === 1L).count() == 1)
  }
}
