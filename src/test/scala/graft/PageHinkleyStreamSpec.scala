package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.stream.PageHinkleyStream
import graft.stream.PageHinkleyStream.HourCount

/** Streaming Page–Hinkley vs the BATCH fold as oracle: the stream's state
  * is the fold accumulator, so after any prefix of the hourly feed the
  * emitted (n_hours, m, M, ph_stat, drift, first_alarm_hu) must equal
  * `stat_page_hinkley` run on the events truncated to that prefix —
  * bit-for-bit on the doubles, across arbitrary micro-batch splits. */
class PageHinkleyStreamSpec extends SparkSpec {
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

      // the batch operator's own first aggregation, in hour order
      val feed = events
        .groupBy(col("event_type").as("cls"),
          expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hu"))
        .agg(count(lit(1)).as("n"))
        .as[HourCount].collect().sortBy(r => (r.hu, r.cls))
      assert(feed.length > 50, "fixture must span many hours")

      // split at hour boundaries: prefix cutoffs at 1/3 and 2/3 of the
      // hour range, final split completes the feed
      val hus = feed.map(_.hu).distinct.sorted
      val cut1 = hus(hus.length / 3); val cut2 = hus(2 * hus.length / 3)
      val splits = Seq(
        feed.filter(_.hu <= cut1),
        feed.filter(r => r.hu > cut1 && r.hu <= cut2),
        feed.filter(_.hu > cut2))
      val cutoffs = Seq(cut1, cut2, Long.MaxValue)

      // sensitized (δ=0.2, λ=3): the sf0.001 fixture never trips the
      // production λ=30, and an equality proof on a trajectory that
      // cannot alarm would not exercise the latch; same params both sides
      val delta = 0.2; val lambda = 3.0
      val input = MemoryStream[HourCount]
      val q = PageHinkleyStream.pageHinkleyStream(input.toDS(), delta, lambda)
        .writeStream.format("memory").queryName("ph_stream")
        .outputMode("append").start()
      try {
        var expectedRows = 0L
        splits.zip(cutoffs).foreach { case (split, cutoff) =>
          input.addData(split.toSeq)
          expectedRows += split.length
          pollUntil(120000)(spark.table("ph_stream").count() >= expectedRows)
          assert(spark.table("ph_stream").count() == expectedRows)

          // batch truth on the identical prefix
          val prefix = events.filter(
            expr("unix_micros(date_trunc('hour', ts)) div 3600000000") <= cutoff)
          val batch = graft.ops.Aggs.statPageHinkley(prefix, delta, lambda).collect().map { r =>
            r.getAs[String]("event_type") -> (
              r.getAs[Long]("n_hours"), r.getAs[Double]("m_final"),
              r.getAs[Double]("m_min"), r.getAs[Double]("ph_stat"),
              r.getAs[Boolean]("drift_detected"),
              Option(r.getAs[java.lang.Long]("first_alarm_hu")).map(_.toLong))
          }.toMap

          // stream truth: per class, the row at its max hour so far
          val got = spark.table("ph_stream").collect()
            .map(r => (r.getAs[String]("cls"), r.getAs[Long]("hu"), r))
            .groupBy(_._1).map { case (cls, rs) =>
              val r = rs.maxBy(_._2)._3
              cls -> (r.getAs[Long]("n_hours"), r.getAs[Double]("m_final"),
                r.getAs[Double]("m_min"), r.getAs[Double]("ph_stat"),
                r.getAs[Boolean]("drift_detected"),
                Option(r.getAs[java.lang.Long]("first_alarm_hu")).map(_.toLong))
            }
          assert(got == batch,
            s"prefix<=?$cutoff: stream $got\nvs batch $batch")
        }
        // the full-feed run must have actually alarmed somewhere, or the
        // equality above proves less than it claims
        assert(spark.table("ph_stream").collect()
          .exists(_.getAs[Boolean]("drift_detected")),
          "fixture must trigger at least one PH alarm")
      } finally q.stop()
    }
  }

  test("replayed / out-of-order hours degrade idempotently, never corrupting state") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // hand-built feed with a gap (h=3 silent): batch 1 in order, batch 2
      // replays an already-folded hour AND an hour older than lastHu
      // before delivering the genuinely-new one
      val b1 = Seq(HourCount("a", 0L, 4L), HourCount("a", 1L, 6L), HourCount("a", 2L, 5L))
      val b2 = Seq(HourCount("a", 2L, 5L),  // exact duplicate (replay)
                   HourCount("a", 1L, 99L), // late row with a DIFFERENT count
                   HourCount("a", 4L, 7L))  // the real next hour (gap at 3)
      val delta = 0.2; val lambda = 3.0

      val input = MemoryStream[HourCount]
      val q = PageHinkleyStream.pageHinkleyStream(input.toDS(), delta, lambda)
        .writeStream.format("memory").queryName("ph_ooo")
        .outputMode("append").start()
      try {
        input.addData(b1)
        pollUntil(60000)(spark.table("ph_ooo").count() >= b1.length)
        input.addData(b2)
        pollUntil(60000)(spark.table("ph_ooo").count() >= b1.length + b2.length)
        val rows = spark.table("ph_ooo").collect()
        assert(rows.length == b1.length + b2.length, "every input row emits")

        // reference: the clean in-order fold over the deduped feed
        def fold(xs: Seq[(Long, Long)]): (Double, Double, Double) = {
          var t = 0.0; var sumx = 0.0; var m = 0.0; var mMin = 0.0; var last = -1L
          def step(x: Double): Unit =
            if (t == 0.0) { t = 1.0; sumx = x; m = -delta; mMin = -delta }
            else {
              val mN = m + (x - (sumx + x) / (t + 1.0) - delta)
              mMin = math.min(mMin, mN); m = mN; t += 1.0; sumx += x
            }
          xs.foreach { case (hu, n) =>
            if (last >= 0) { var h = last + 1; while (h < hu) { step(0.0); h += 1 } }
            step(n.toDouble); last = hu
          }
          (t, m, mMin)
        }
        val (tExp, mExp, minExp) =
          fold(Seq(0L -> 4L, 1L -> 6L, 2L -> 5L, 4L -> 7L))

        val latest = rows.filter(_.getAs[Long]("hu") == 4L).head
        assert(latest.getAs[Long]("n_hours") == tExp.toLong)
        assert(latest.getAs[Double]("m_final") == mExp)
        assert(latest.getAs[Double]("m_min") == minExp)

        // the two out-of-contract rows re-emitted the pre-batch-2 state
        // (t after h=2 is 3 steps) rather than folding
        val stale = rows.filter(r => r.getAs[Long]("hu") < 2L &&
          r.getAs[Long]("n_hours") == 3L)
        assert(stale.length == 1, s"late row re-emits current state: ${rows.mkString(";")}")
      } finally q.stop()
    }
  }
}
