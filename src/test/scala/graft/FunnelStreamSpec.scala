package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.stream.FunnelStream
import graft.stream.FunnelStream.FunnelEvent

/** Streaming window funnel vs the BATCH operator as oracle: in event-time
  * order the funnel's three window minima are a freeze-once state
  * machine, so the depth the stream lands per user must equal
  * `events_window_funnel` over the same rows — across micro-batch splits,
  * including a boundary mid-funnel and one right before a deadline
  * kill. */
class FunnelStreamSpec extends SparkSpec {
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

  // the r5 window-funnel fixture shapes: full funnel (u1), deadline kill
  // (u2), never-clicked (u3), purchase-before-view stall (u4), click-only
  // straggler (u5) — depths 3, 1, 0, 2, 1
  private val evs = Seq(
    (1L, "click", "2024-01-01 10:00:00"), (1L, "view", "2024-01-01 11:00:00"),
    (1L, "purchase", "2024-01-01 12:00:00"),
    (2L, "click", "2024-01-01 10:00:00"), (2L, "view", "2024-01-02 11:00:00"),
    (3L, "view", "2024-01-01 10:00:00"),
    (4L, "click", "2024-01-01 10:00:00"), (4L, "purchase", "2024-01-01 10:30:00"),
    (4L, "view", "2024-01-01 11:00:00"),
    (5L, "click", "2024-01-01 09:00:00"))

  private def batchHistogram(): Map[Long, Long] = {
    val df = evs.map { case (u, t, s) => (u, t, Timestamp.valueOf(s), 0.0) }
      .toDF("user_id", "event_type", "ts", "value")
      .withColumn("event_id", monotonically_increasing_id())
    ext.Sessions.eventsWindowFunnel(df).collect()
      .map(r => r.getAs[Long]("funnel_depth") -> r.getAs[Long]("n_users")).toMap
  }

  private def streamHistogram(splits: Seq[Seq[FunnelEvent]],
                              name: String): Map[Long, Long] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val q = FunnelStream.funnelStream(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      var want = 0L
      splits.foreach { s =>
        input.addData(s)
        want += s.map(_.user).distinct.size // one row per (user, batch)
        pollUntil(60000)(spark.table(name).count() >= want)
      }
      assert(spark.table(name).count() == want, "per-batch row contract")
      // depth is monotone per user: the landed state is the max depth
      spark.table(name).groupBy(col("user"))
        .agg(max(col("depth")).as("depth")).collect()
        .map(_.getAs[Long]("depth"))
        .groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    } finally q.stop()
  }

  test("stream funnel depths equal the batch operator across batch splits") {
    withRocksDb {
      val all = evs.map { case (u, t, s) =>
        FunnelEvent(u, Timestamp.valueOf(s).getTime * 1000L, t)
      }.sortBy(e => (e.ts_us, e.etype))
      val expected = batchHistogram()
      assert(expected == Map(0L -> 1L, 1L -> 2L, 2L -> 1L, 3L -> 1L))
      // one batch with everything
      assert(streamHistogram(Seq(all), "funnel_stream_one") == expected)
      // event-time-ordered prefix splits: boundary mid-funnel for user 1,
      // boundary right before user 2's deadline-killing view
      val s1 = Seq(all.take(3), all.slice(3, 7), all.drop(7))
      assert(streamHistogram(s1, "funnel_stream_split") == expected)
    }
  }
}
