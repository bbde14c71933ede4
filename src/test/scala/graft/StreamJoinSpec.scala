package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.stream.StreamJoin

/** Stream-stream interval join: two live MemoryStreams correlated on
  * node + time proximity, and the identical operator on batch frames
  * (unified semantics — the batch run is the oracle for the stream run). */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  // env: (node, env_ts, temperature); bat: (b_node, bat_ts, battery_level)
  private val envRows = Seq((1L, ts(10), 21.5), (1L, ts(30), 22.0), (2L, ts(10), 19.0))
  private val batRows = Seq((1L, ts(12), 91.0), (1L, ts(50), 88.0), (3L, ts(10), 77.0))
  // expected: env(1,10) ↔ bat(1,12) only — (1,30) has no battery within ±5,
  // node 2 has no battery at all, bat node 3 has no env

  test("batch semantics: only key-matched rows within tolerance join") {
    val out = StreamJoin.envBatteryWithin(
      envRows.toDF("node", "env_ts", "temperature"),
      batRows.toDF("b_node", "bat_ts", "battery_level")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("node") == 1L)
    assert(out.head.getAs[Double]("temperature") == 21.5)
    assert(out.head.getAs[Double]("battery_level") == 91.0)
  }

  test("stream-stream: watermarked interval join correlates live streams") {
    implicit val sqlCtx = spark.sqlContext
    val env = MemoryStream[(Long, Timestamp, Double)]
    val bat = MemoryStream[(Long, Timestamp, Double)]
    // add BEFORE start: AvailableNow snapshots offsets at query start
    env.addData(envRows: _*)
    bat.addData(batRows: _*)
    val joined = StreamJoin.envBatteryWithin(
      env.toDF().toDF("node", "env_ts", "temperature"),
      bat.toDF().toDF("b_node", "bat_ts", "battery_level"))
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      val rows = spark.sql("SELECT node, temperature, battery_level FROM sj_out").collect()
      assert(rows.length == 1, s"expected the single in-window pair, got ${rows.toSeq}")
      assert(rows.head.getLong(0) == 1L && rows.head.getDouble(2) == 91.0)
    } finally q.stop()
  }
}
