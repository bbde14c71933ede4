package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.stream.ThetaStream
import graft.stream.ThetaStream.HourCount

/** Streaming theta forecaster vs the BATCH fold as oracle (r10, VERDICT
  * r9 #6): after any prefix of the hourly feed the emitted (n_hours,
  * ses_level, slope, forecast_next) must equal `ts_theta_forecast` run on
  * the events truncated to that prefix — bit-for-bit on the doubles,
  * across arbitrary micro-batch splits. Same harness shape as
  * `HoltStreamSpec` (observed series, no gap densification). The one
  * contract seam under test beyond Holt's: the batch op emits NO row for
  * a class until det > 0 (two distinct hours); the twin must emit NULL
  * slope/forecast there and the defined values after. */
class ThetaStreamSpec extends SparkSpec {
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
      val q = ThetaStream.thetaStream(input.toDS())
        .writeStream.format("memory").queryName("theta_stream")
        .outputMode("append").start()
      try {
        var expectedRows = 0L
        splits.zip(cutoffs).foreach { case (split, cutoff) =>
          input.addData(split.toSeq)
          expectedRows += split.length
          pollUntil(120000)(spark.table("theta_stream").count() >= expectedRows)
          assert(spark.table("theta_stream").count() == expectedRows)

          // batch truth on the identical prefix (det > 0 classes only)
          val prefix = events.filter(
            expr("unix_micros(date_trunc('hour', ts)) div 3600000000") <= cutoff)
          val batch = graft.ops.Aggs.tsThetaForecast(prefix).collect().map { r =>
            r.getAs[String]("event_type") -> (
              r.getAs[Long]("n_hours"), r.getAs[Double]("ses_level"),
              r.getAs[Double]("slope"), r.getAs[Double]("forecast_next"))
          }.toMap

          // stream truth: per class, the row at its max hour so far
          val got = spark.table("theta_stream").collect()
            .map(r => (r.getAs[String]("cls"), r.getAs[Long]("hu"), r))
            .groupBy(_._1).map { case (cls, rs) =>
              val r = rs.maxBy(_._2)._3
              cls -> (r.getAs[Long]("n_hours"), r.getAs[Double]("ses_level"),
                r.getAs[java.lang.Double]("slope"),
                r.getAs[java.lang.Double]("forecast_next"))
            }
          // every batch class matches the stream bit-for-bit; stream
          // classes absent from batch must be exactly the det<=0 ones
          batch.foreach { case (cls, (n, l, s, f)) =>
            val (gn, gl, gs, gf) = got(cls)
            assert(gn == n && gl == l && gs != null && gs.doubleValue == s &&
              gf != null && gf.doubleValue == f,
              s"prefix<=$cutoff $cls: stream ${got(cls)} vs batch ${(n, l, s, f)}")
          }
          got.keySet.diff(batch.keySet).foreach { cls =>
            val (_, _, gs, gf) = got(cls)
            assert(gs == null && gf == null,
              s"$cls absent from batch (det<=0) must have null slope, got $gs")
          }
        }
      } finally q.stop()
    }
  }

  test("pre-det prefix reads level-only; gaps and replays follow the contract") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val b1 = Seq(HourCount("a", 473360L, 10L)) // single hour: det = 0
      val b2 = Seq(HourCount("a", 473360L, 99L), // replayed, different count
                   HourCount("a", 473365L, 20L)) // real next hour (gap)
      val input = MemoryStream[HourCount]
      val q = ThetaStream.thetaStream(input.toDS())
        .writeStream.format("memory").queryName("theta_ooo")
        .outputMode("append").start()
      try {
        input.addData(b1)
        pollUntil(60000)(spark.table("theta_ooo").count() >= 1)
        input.addData(b2)
        pollUntil(60000)(spark.table("theta_ooo").count() >= 3)
        val rows = spark.table("theta_ooo").collect()
        assert(rows.length == 3)

        // single observed hour: level seeded, slope inestimable
        val first = rows.filter(r => r.getAs[Long]("hu") == 473360L &&
          r.getAs[Long]("n_hours") == 1L)
        assert(first.length == 2) // the seed emit + the idempotent replay
        assert(first.forall(r => r.getAs[Double]("ses_level") == 10.0 &&
          r.getAs[java.lang.Double]("slope") == null))

        // two distinct hours: the hand fold (x = hu - 473352)
        val l = (20.0 + 10.0) / 2.0
        val (x1, x2) = (8.0, 13.0)
        val (sx, sy, sxy, sxx) = (x1 + x2, 30.0, x1 * 10 + x2 * 20, x1 * x1 + x2 * x2)
        val det = 2.0 * sxx - sx * sx
        val slope = (2.0 * sxy - sx * sy) / det
        val last = rows.filter(_.getAs[Long]("hu") == 473365L).head
        assert(last.getAs[Long]("n_hours") == 2L)
        assert(last.getAs[Double]("ses_level") == l)
        assert(last.getAs[Double]("slope") == slope)
        assert(last.getAs[Double]("forecast_next") == l + slope / 2.0)
      } finally q.stop()
    }
  }
}
