package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.stream.Windowed

/** T8/T9: event-time windowed aggregation + session segmentation on a
  * MemoryStream, including watermark-driven append emission. */
case class Pkt(event_ts: Timestamp, node: Long, metric: Double)

class WindowedStreamSpec extends SparkSpec {
  import spark.implicits._
  def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling downsample emits finalized windows once watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Pkt]
    val q = Windowed.downsample(input.toDF(), "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("ds_out").outputMode("append").start()
    try {
      input.addData(
        Pkt(ts("2024-01-01 10:01:00"), 1L, 10.0),
        Pkt(ts("2024-01-01 10:04:00"), 1L, 20.0),
        Pkt(ts("2024-01-01 10:11:00"), 1L, 30.0))
      q.processAllAvailable()
      // watermark still at epoch-ish: nothing finalized yet
      assert(spark.sql("SELECT * FROM ds_out").count() == 0)
      // advance event time far past the 10:00-10:10 window + 30min watermark
      input.addData(Pkt(ts("2024-01-01 12:00:00"), 1L, 0.0))
      q.processAllAvailable()
      input.addData(Pkt(ts("2024-01-01 12:00:01"), 1L, 0.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM ds_out ORDER BY bucket_start").collect()
      assert(rows.length >= 2)
      assert(rows(0).getAs[Timestamp]("bucket_start") == ts("2024-01-01 10:00:00"))
      assert(rows(0).getAs[Double]("avg_metric") == 15.0)
      assert(rows(0).getAs[Long]("n") == 2L)
      assert(rows(1).getAs[Double]("avg_metric") == 30.0)
    } finally q.stop()
  }

  test("session_window splits episodes at gaps > threshold") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Pkt]
    val q = Windowed.onlineEpisodes(input.toDF(), "100 minutes", "200 minutes")
      .writeStream.format("memory").queryName("ep_out").outputMode("append").start()
    try {
      input.addData(
        Pkt(ts("2024-01-01 10:00:00"), 1L, 1.0),
        Pkt(ts("2024-01-01 10:30:00"), 1L, 1.0),   // same episode
        Pkt(ts("2024-01-01 14:00:00"), 1L, 1.0))   // >100min gap: new episode
      q.processAllAvailable()
      input.addData(Pkt(ts("2024-01-02 10:00:00"), 1L, 1.0)) // advance watermark
      q.processAllAvailable()
      input.addData(Pkt(ts("2024-01-02 10:00:01"), 1L, 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM ep_out ORDER BY episode_start").collect()
      assert(rows.length >= 2)
      assert(rows(0).getAs[Long]("n_packets") == 2L) // 10:00 + 10:30 merged
      assert(rows(1).getAs[Long]("n_packets") == 1L) // 14:00 alone
    } finally q.stop()
  }

  test("streaming trending top-k ranks finalized windows in foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Pkt]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Timestamp, Long, Long, Long)]
    val q = Windowed.trendingTopK(input.toDF(), "10 minutes", "30 minutes", k = 2) { top =>
      top.collect().foreach(r => got.add((r.getAs[Timestamp]("bucket_start"),
        r.getAs[Long]("rnk"), r.getAs[Long]("node"), r.getAs[Long]("n"))))
    }
    try {
      // window [10:00,10:10): node 1 -> 3 events, node 2 -> 2, node 3 -> 1
      input.addData(
        Pkt(ts("2024-01-01 10:01:00"), 1L, 0.0), Pkt(ts("2024-01-01 10:02:00"), 1L, 0.0),
        Pkt(ts("2024-01-01 10:03:00"), 1L, 0.0), Pkt(ts("2024-01-01 10:04:00"), 2L, 0.0),
        Pkt(ts("2024-01-01 10:05:00"), 2L, 0.0), Pkt(ts("2024-01-01 10:06:00"), 3L, 0.0))
      q.processAllAvailable()
      // advance the watermark far past the window, then let append emit
      input.addData(Pkt(ts("2024-01-01 12:00:00"), 9L, 0.0))
      q.processAllAvailable()
      input.addData(Pkt(ts("2024-01-01 12:00:01"), 9L, 0.0))
      q.processAllAvailable()
      val first = got.toArray(Array.empty[(Timestamp, Long, Long, Long)])
        .filter(_._1 == ts("2024-01-01 10:00:00")).sortBy(_._2).toSeq
      // top-2 only: node 3's single event must be cut
      assert(first == Seq(
        (ts("2024-01-01 10:00:00"), 1L, 1L, 3L),
        (ts("2024-01-01 10:00:00"), 2L, 2L, 2L)), first.toString)
    } finally q.stop()
  }

  test("sliding windows assign each event to every overlapping window") {
    val batch = Seq(
      Pkt(ts("2024-01-01 10:07:00"), 1L, 10.0)).toDF()
    // 10-min windows sliding by 5: event at 10:07 belongs to [10:00,10:10) and [10:05,10:15)
    val out = Windowed.slidingDownsample(batch).orderBy("bucket_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Timestamp]("bucket_start") == ts("2024-01-01 10:00:00"))
    assert(out(1).getAs[Timestamp]("bucket_start") == ts("2024-01-01 10:05:00"))
  }

  test("batch/stream unification: downsample runs identically on a batch frame") {
    val batch = Seq(
      Pkt(ts("2024-01-01 10:01:00"), 1L, 10.0),
      Pkt(ts("2024-01-01 10:04:00"), 1L, 20.0),
      Pkt(ts("2024-01-01 10:11:00"), 1L, 30.0)).toDF()
    val out = Windowed.downsample(batch).orderBy("bucket_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("avg_metric") == 15.0)
  }

  test("DDL bootstrap is idempotent") {
    val first = sources.Ddl.bootstrap(spark)
    assert(first.forall(_._2))
    val second = sources.Ddl.bootstrap(spark)
    assert(second.forall(!_._2))
    assert(spark.catalog.tableExists("airwise_data"))
  }
}
