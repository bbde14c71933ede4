package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.stream.Heartbeat.Packet
import graft.stream.Smooth

/** EWMA gap smoothing: seeding, the α=1/2 recursion across micro-batches,
  * and per-key independence. */
class SmoothSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private def pollUntil(deadlineMs: Long)(done: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + deadlineMs
    while (!done && System.currentTimeMillis() < deadline) Thread.sleep(250)
  }

  test("gap EWMA seeds on the first gap and halves toward new gaps across batches") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Packet]
      val q = Smooth.gapEwmaStream(input.toDS())
        .writeStream.format("memory").queryName("sm").outputMode("append").start()
      try {
        def rows() = spark.sql("SELECT node, ts_ms, gap_ms, ewma_gap_ms FROM sm ORDER BY node, ts_ms")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
        // node 1: gaps 100, 300; node 2 independent: first packet emits nothing
        input.addData(Packet(1L, 1000L), Packet(1L, 1100L), Packet(1L, 1400L), Packet(2L, 500L))
        pollUntil(60000)(rows().size >= 2)
        // seed = 100; then (300 + 100)/2 = 200
        assert(rows() == Seq((1L, 1100L, 100L, 100.0), (1L, 1400L, 300L, 200.0)), rows().toString)
        // cross-batch: state carries; (600 + 200)/2 = 400; node 2 seeds at 250
        input.addData(Packet(1L, 2000L), Packet(2L, 750L))
        pollUntil(60000)(rows().size >= 4)
        assert(rows() == Seq((1L, 1100L, 100L, 100.0), (1L, 1400L, 300L, 200.0),
          (1L, 2000L, 600L, 400.0), (2L, 750L, 250L, 250.0)), rows().toString)
      } finally q.stop()
    }
  }
}
