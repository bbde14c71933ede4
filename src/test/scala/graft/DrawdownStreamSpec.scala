package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.stream.DrawdownStream
import graft.stream.DrawdownStream.ValuePoint

/** Streaming drawdown vs the batch operator as oracle: a running max is
  * prefix-monotone, so the rows the stream emits must match the batch
  * window over the same data no matter where the micro-batch boundaries
  * fall — including a boundary placed mid-decline and one right after a
  * new peak. */
class DrawdownStreamSpec extends SparkSpec {
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

  test("stream drawdown equals the batch running max across batch splits") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val pts = Seq(
        ValuePoint(1L, 1000L, 10000L), ValuePoint(1L, 2000L, 8000L),
        ValuePoint(1L, 3000L, 12000L), ValuePoint(1L, 4000L, 3000L),
        ValuePoint(2L, 1500L, 500L),   ValuePoint(2L, 2500L, 700L),
        ValuePoint(1L, 5000L, 12500L), ValuePoint(1L, 6000L, 11000L),
        ValuePoint(2L, 3500L, 600L))
      val input = MemoryStream[ValuePoint]
      val q = DrawdownStream.drawdownStream(input.toDS())
        .writeStream.format("memory").queryName("dd_stream")
        .outputMode("append").start()
      try {
        def rows() = spark.sql(
          "SELECT node, ts_ms, cents, peak_cents, drawdown_cents FROM dd_stream")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
        // batch 1 ends mid-decline; batch 2 ends right after a new peak
        input.addData(pts.take(4))
        pollUntil(60000)(rows().size >= 4)
        input.addData(pts.slice(4, 7))
        input.addData(pts.drop(7))
        pollUntil(60000)(rows().size == pts.length)

        // oracle: per-node prefix max in ts order, computed in plain Scala
        val expected = pts.groupBy(_.node).flatMap { case (n, ps) =>
          var peak = Long.MinValue
          ps.sortBy(p => (p.ts_ms, p.cents)).map { p =>
            if (p.cents > peak) peak = p.cents
            (n, p.ts_ms, p.cents, peak, peak - p.cents)
          }
        }.toSet
        assert(rows() == expected, s"stream ${rows()} vs batch $expected")
        // spot: node 1 at ts 4000 is 9000 below the 12000 peak
        assert(rows().contains((1L, 4000L, 3000L, 12000L, 9000L)))
      } finally q.stop()
    }
  }
}
