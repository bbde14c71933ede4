package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.stream.Heartbeat.Packet
import graft.stream.Throttle

/** Per-key event-time token bucket: admission order, window rollover, and
  * key independence. (TTL eviction itself is covered by RunningStatsSpec —
  * same TTLConfig machinery.) */
class ThrottleSpec extends SparkSpec {
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

  test("admits maxPerWindow rows per key per event-time window, flags the rest") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Packet]
      val q = Throttle.rateLimit(input.toDS(), maxPerWindow = 3, windowMs = 1000L)
        .writeStream.format("memory").queryName("thr").outputMode("append").start()
      try {
        def rows() = spark.sql("SELECT node, ts_ms, admitted FROM thr ORDER BY node, ts_ms")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
        // 5 rows for node 1 inside window [0,1000); node 2 independent
        input.addData(Packet(1L, 100L), Packet(1L, 200L), Packet(1L, 300L),
          Packet(1L, 400L), Packet(1L, 500L), Packet(2L, 150L))
        pollUntil(60000)(rows().size >= 6)
        assert(rows() == Seq(
          (1L, 100L, true), (1L, 200L, true), (1L, 300L, true),
          (1L, 400L, false), (1L, 500L, false), (2L, 150L, true)), rows().toString)
        // next event-time window refills node 1's bucket; the old window's
        // budget stays spent across micro-batches until the window moves
        input.addData(Packet(1L, 900L), Packet(1L, 1100L), Packet(1L, 1200L))
        pollUntil(60000)(rows().size >= 9)
        assert(rows().filter(_._2 >= 900L) == Seq(
          (1L, 900L, false), (1L, 1100L, true), (1L, 1200L, true)), rows().toString)
      } finally q.stop()
    }
  }
}
