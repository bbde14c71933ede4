package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.stream.EwmStream
import graft.stream.EwmStream.HourCount

/** Streaming EW mean/variance vs the BATCH fold as oracle: the stream's
  * state is the fold accumulator, so after any prefix of the hourly feed
  * the emitted (n_hours, ewm_mean, ewm_var, ewm_vol) must equal
  * `ts_ewm_stats` run on the events truncated to that prefix —
  * bit-for-bit on the doubles, across arbitrary micro-batch splits. Same
  * harness shape as `MacdStreamSpec`. */
class EwmStreamSpec extends SparkSpec {
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

  test("stream state equals the batch fold over the same prefix at every split") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val events = Tables.events(spark, "/root/testdata/sf0.001")

      val feed = events
        .groupBy(col("event_type").as("cls"),
          expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hu"))
        .agg(count(lit(1)).as("n"))
        .as[HourCount].collect().sortBy(r => (r.hu, r.cls))
      assert(feed.length > 50, "fixture must span many hours")

      val hus = feed.map(_.hu).distinct.sorted
      val cut1 = hus(hus.length / 3); val cut2 = hus(2 * hus.length / 3)
      val splits = Seq(
        feed.filter(_.hu <= cut1),
        feed.filter(r => r.hu > cut1 && r.hu <= cut2),
        feed.filter(_.hu > cut2))
      val cutoffs = Seq(cut1, cut2, Long.MaxValue)

      val input = MemoryStream[HourCount]
      val q = EwmStream.ewmStream(input.toDS())
        .writeStream.format("memory").queryName("ewm_stream")
        .outputMode("append").start()
      try {
        var expectedRows = 0L
        splits.zip(cutoffs).foreach { case (split, cutoff) =>
          input.addData(split.toSeq)
          expectedRows += split.length
          pollUntil(120000)(spark.table("ewm_stream").count() >= expectedRows)
          assert(spark.table("ewm_stream").count() == expectedRows)

          val prefix = events.filter(
            expr("unix_micros(date_trunc('hour', ts)) div 3600000000") <= cutoff)
          val batch = graft.ops.Aggs.tsEwmStats(prefix).collect().map { r =>
            r.getAs[String]("event_type") -> (
              r.getAs[Long]("n_hours"), r.getAs[Double]("ewm_mean"),
              r.getAs[Double]("ewm_var"), r.getAs[Double]("ewm_vol"))
          }.toMap

          val got = spark.table("ewm_stream").collect()
            .map(r => (r.getAs[String]("cls"), r.getAs[Long]("hu"), r))
            .groupBy(_._1).map { case (cls, rs) =>
              val r = rs.maxBy(_._2)._3
              cls -> (r.getAs[Long]("n_hours"), r.getAs[Double]("ewm_mean"),
                r.getAs[Double]("ewm_var"), r.getAs[Double]("ewm_vol"))
            }
          assert(got == batch, s"prefix<=?$cutoff: stream $got\nvs batch $batch")
        }
      } finally q.stop()
    }
  }

  test("replayed / out-of-order hours degrade idempotently") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val b1 = Seq(HourCount("a", 0L, 8L), HourCount("a", 1L, 12L), HourCount("a", 2L, 4L))
      val b2 = Seq(HourCount("a", 1L, 77L),  // late row, different count
                   HourCount("a", 5L, 16L))  // real next hour (gaps at 3, 4)
      val input = MemoryStream[HourCount]
      val q = EwmStream.ewmStream(input.toDS())
        .writeStream.format("memory").queryName("ewm_ooo")
        .outputMode("append").start()
      try {
        input.addData(b1)
        pollUntil(60000)(spark.table("ewm_ooo").count() >= b1.length)
        input.addData(b2)
        pollUntil(60000)(spark.table("ewm_ooo").count() >= b1.length + b2.length)
        val rows = spark.table("ewm_ooo").collect()
        assert(rows.length == b1.length + b2.length)

        // clean in-order fold over the deduped feed, gaps densified
        var m = 0.0; var v = 0.0; var t = 0L
        def step(x: Double): Unit = {
          if (t == 0L) { m = x; v = 0.0 }
          else {
            val mN = m + 0.25 * (x - m)
            v = 0.75 * (v + (x - m) * (0.25 * (x - m)))
            m = mN
          }
          t += 1L
        }
        Seq(8.0, 12.0, 4.0, 0.0, 0.0, 16.0).foreach(step)

        val latest = rows.filter(_.getAs[Long]("hu") == 5L).head
        assert(latest.getAs[Long]("n_hours") == t)
        assert(latest.getAs[Double]("ewm_mean") == m)
        assert(latest.getAs[Double]("ewm_var") == v)

        // the late row re-emitted the post-batch-1 state (3 grid steps)
        val stale = rows.filter(r => r.getAs[Long]("hu") == 1L &&
          r.getAs[Long]("n_hours") == 3L)
        assert(stale.length == 1, rows.mkString(";"))
      } finally q.stop()
    }
  }
}
