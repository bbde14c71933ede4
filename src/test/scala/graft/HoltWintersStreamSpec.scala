package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.stream.HoltWintersStream
import graft.stream.HoltWintersStream.HourCount

/** Streaming Holt–Winters vs the BATCH fold as oracle: the stream's
  * state is the fold accumulator (level, trend, 24-slot seasonal ring),
  * so after any prefix of the hourly feed the emitted (n_hours, level,
  * trend, season_next, forecast_next) must equal `stat_holt_winters` run
  * on the events truncated to that prefix — bit-for-bit on the doubles,
  * across arbitrary micro-batch splits. The rotating-index ring must
  * also survive state ser/deser across batches at every phase of the
  * 24-hour cycle (the head-restoration off-by-one class). */
class HoltWintersStreamSpec extends SparkSpec {
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
      // uneven cuts so the seasonal ring is mid-cycle at both boundaries
      val cut1 = hus(hus.length / 4); val cut2 = hus(3 * hus.length / 5)
      val splits = Seq(
        feed.filter(_.hu <= cut1),
        feed.filter(r => r.hu > cut1 && r.hu <= cut2),
        feed.filter(_.hu > cut2))
      val cutoffs = Seq(cut1, cut2, Long.MaxValue)

      val input = MemoryStream[HourCount]
      val q = HoltWintersStream.holtWintersStream(input.toDS())
        .writeStream.format("memory").queryName("hw_stream")
        .outputMode("append").start()
      try {
        var expectedRows = 0L
        splits.zip(cutoffs).foreach { case (split, cutoff) =>
          input.addData(split.toSeq)
          expectedRows += split.length
          pollUntil(120000)(spark.table("hw_stream").count() >= expectedRows)
          assert(spark.table("hw_stream").count() == expectedRows)

          val prefix = events.filter(
            expr("unix_micros(date_trunc('hour', ts)) div 3600000000") <= cutoff)
          val batch = graft.ops.Aggs.statHoltWinters(prefix).collect().map { r =>
            r.getAs[String]("event_type") -> (
              r.getAs[Long]("n_hours"), r.getAs[Double]("level"),
              r.getAs[Double]("trend"), r.getAs[Double]("season_next"),
              r.getAs[Double]("forecast_next"))
          }.toMap

          val got = spark.table("hw_stream").collect()
            .map(r => (r.getAs[String]("cls"), r.getAs[Long]("hu"), r))
            .groupBy(_._1).map { case (cls, rs) =>
              val r = rs.maxBy(_._2)._3
              cls -> (r.getAs[Long]("n_hours"), r.getAs[Double]("level"),
                r.getAs[Double]("trend"), r.getAs[Double]("season_next"),
                r.getAs[Double]("forecast_next"))
            }
          assert(got == batch, s"prefix<=?$cutoff: stream $got\nvs batch $batch")
        }
      } finally q.stop()
    }
  }

  test("ring FIFO equals the batch slice+concat rotation beyond one season") {
    // pure-kernel check, no streaming harness: fold 60 grid hours (2.5
    // seasons) through the Processor's step logic with a ser/deser round
    // trip (and head re-derivation) at EVERY hour — the batch
    // aggregate-HOF on the same series is the oracle
    implicit val sqlCtx = spark.sqlContext
    val xs = (1 to 60).map(h => 3.0 + (h % 5) + (h % 24) / 4.0)

    // batch truth via the same SQL HOF the operator uses
    val df = Seq((xs.toArray)).toDF("xs")
      .selectExpr("""aggregate(
          slice(xs, 2, size(xs) - 1),
          concat(array(element_at(xs, 1), 0.0d), array_repeat(0.0d, 24)),
          (acc, x) -> concat(
            array(
              ((x - acc[2]) + (acc[0] + acc[1])) / 2.0d,
              ((((x - acc[2]) + (acc[0] + acc[1])) / 2.0d - acc[0]) + acc[1]) / 2.0d),
            slice(acc, 4, 23),
            array(((x - ((x - acc[2]) + (acc[0] + acc[1])) / 2.0d) + acc[2]) / 2.0d)))""")
      .collect()(0).getSeq[Double](0)

    // streaming kernel with ser/deser boundaries mid-season
    var state = HoltWintersStream.ser(0L, 0.0, 0.0,
      new Array[Double](HoltWintersStream.SeasonLen), -1L)
    xs.zipWithIndex.foreach { case (x, i) =>
      var (t, l, b, ring, lastHu) = HoltWintersStream.deser(state)
      var head = if (t == 0L) 0L else (t - 1L) % HoltWintersStream.SeasonLen
      if (t == 0L) { l = x; b = 0.0 }
      else {
        val s0 = ring(head.toInt)
        val lN = ((x - s0) + (l + b)) / 2.0
        val bN = ((lN - l) + b) / 2.0
        ring(head.toInt) = ((x - lN) + s0) / 2.0
        l = lN; b = bN
      }
      t += 1L
      state = HoltWintersStream.ser(t, l, b, ring, i.toLong)
    }
    val (t, l, b, ring, _) = HoltWintersStream.deser(state)
    val head = ((t - 1L) % HoltWintersStream.SeasonLen).toInt
    assert(t == 60L)
    assert(l == df(0), s"level $l vs ${df(0)}")
    assert(b == df(1), s"trend $b vs ${df(1)}")
    assert(ring(head) == df(2), s"season_next ${ring(head)} vs ${df(2)}")
    // the WHOLE ring must match the batch's, in consumption order
    (0 until HoltWintersStream.SeasonLen).foreach { k =>
      assert(ring((head + k) % HoltWintersStream.SeasonLen) == df(2 + k),
        s"ring slot $k")
    }
  }
}
