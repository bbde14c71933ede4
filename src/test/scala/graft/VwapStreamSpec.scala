package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.stream.VwapStream
import graft.stream.VwapStream.HourBar

/** Streaming trailing-VWAP vs the BATCH window query as oracle: after any
  * prefix of the bar feed, the twin's row at each class's latest hour must
  * equal `window_vwap`'s row for that hour — exact integer sums, the
  * identical one-divide vwap, the exact above_vwap flag — across arbitrary
  * micro-batch splits. The NEW contract under test vs the fold twins: the
  * state is a bounded DEQUE (eviction correctness), and the warm-up seam
  * (batch emits nothing below n bars; the twin emits occupancy with NULL
  * vwap there) is pinned from both sides. */
class VwapStreamSpec extends SparkSpec {
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

  /** The batch op's own bar build, with volume. */
  private def barFeed(events: org.apache.spark.sql.DataFrame): Array[HourBar] = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val part = Window.partitionBy(col("event_type"), col("hr"))
    val wb = part.orderBy(col("ts"), col("event_id"))
    events.filter(col("value").isNotNull)
      .withColumn("hr", date_trunc("hour", col("ts")))
      .withColumn("c0",
        (col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)) * 100)
          .cast(dec).cast("long"))
      .withColumn("rn", row_number().over(wb))
      .withColumn("cnt", count(lit(1)).over(part))
      .groupBy(col("event_type").as("cls"),
        expr("unix_micros(hr) div 3600000000").as("hu"))
      .agg(max(col("c0")).as("h"), min(col("c0")).as("l"),
        max(when(col("rn") === col("cnt"), col("c0"))).as("cl"),
        count(lit(1)).as("vol"))
      .as[HourBar].collect().sortBy(r => (r.hu, r.cls))
  }

  test("stream window equals the batch query over the same prefix at every split") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val events = Tables.events(spark, "/root/testdata/sf0.001")
      val feed = barFeed(events)
      assert(feed.length > 50, "fixture must span many bars")

      val hus = feed.map(_.hu).distinct.sorted
      val cut1 = hus(hus.length / 3); val cut2 = hus(2 * hus.length / 3)
      val splits = Seq(
        feed.filter(_.hu <= cut1),
        feed.filter(r => r.hu > cut1 && r.hu <= cut2),
        feed.filter(_.hu > cut2))
      val cutoffs = Seq(cut1, cut2, Long.MaxValue)

      val input = MemoryStream[HourBar]
      val q = VwapStream.vwapStream(input.toDS())
        .writeStream.format("memory").queryName("vwap_stream")
        .outputMode("append").start()
      try {
        var expectedRows = 0L
        splits.zip(cutoffs).foreach { case (split, cutoff) =>
          input.addData(split.toSeq)
          expectedRows += split.length
          pollUntil(120000)(spark.table("vwap_stream").count() >= expectedRows)
          assert(spark.table("vwap_stream").count() == expectedRows)

          // batch truth: window_vwap on the truncated events, keyed by
          // (class, hour string); the twin's comparable row is the one at
          // each class's max folded hour
          val prefix = events.filter(
            expr("unix_micros(date_trunc('hour', ts)) div 3600000000") <= cutoff)
          val batch = graft.ops.Windows.windowVwap(prefix).collect().map { r =>
            (r.getAs[String]("event_type"), r.getAs[String]("hour_s")) -> (
              r.getAs[Long]("money3_sum_cents"), r.getAs[Long]("vol_sum"),
              r.getAs[Double]("vwap"), r.getAs[Boolean]("above_vwap"))
          }.toMap

          val streamRows = spark.table("vwap_stream").collect()
            .map(r => (r.getAs[String]("cls"), r.getAs[Long]("hu"), r))
          // every FULL-window stream row must match its batch row exactly
          var checkedFull = 0
          streamRows.foreach { case (cls, hu, r) =>
            if (r.getAs[Long]("n_window") == 14L) {
              val hourS = java.time.Instant.ofEpochSecond(hu * 3600L)
                .atZone(java.time.ZoneOffset.UTC)
                .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
              batch.get((cls, hourS)).foreach { case (sm, sv, vw, ab) =>
                assert(r.getAs[Long]("money3_sum_cents") == sm, s"$cls@$hourS sm")
                assert(r.getAs[Long]("vol_sum") == sv)
                assert(r.getAs[Double]("vwap") == vw, s"$cls@$hourS vwap bit-exact")
                assert(r.getAs[Boolean]("above_vwap") == ab)
                checkedFull += 1
              }
            }
          }
          assert(checkedFull > 0, "prefix must contain full windows")

          // warm-up seam: below 14 bars the twin emits occupancy, batch nothing
          val warm = streamRows.filter(_._3.getAs[Long]("n_window") < 14L)
          warm.foreach { case (_, _, r) =>
            assert(r.isNullAt(r.fieldIndex("vwap")) &&
              r.isNullAt(r.fieldIndex("above_vwap")))
          }
        }
      } finally q.stop()
    }
  }

  test("eviction is exact; replayed bars re-emit the window idempotently") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // 16 bars with n = 3: the window must hold exactly the last 3
      val bars = (0 until 16).map(i =>
        HourBar("a", i.toLong, 100L + i, 90L + i, 95L + i, (i % 4 + 1).toLong))
      val input = MemoryStream[HourBar]
      val q = VwapStream.vwapStream(input.toDS(), n = 3)
        .writeStream.format("memory").queryName("vwap_evict")
        .outputMode("append").start()
      try {
        input.addData(bars.take(10))
        pollUntil(60000)(spark.table("vwap_evict").count() >= 10)
        input.addData(bars.drop(10) :+ HourBar("a", 5L, 1L, 1L, 1L, 99L)) // replay
        pollUntil(60000)(spark.table("vwap_evict").count() >= 17)
        val rows = spark.table("vwap_evict").collect()
          .sortBy(r => (r.getAs[Long]("hu"), r.getAs[Long]("n_window")))
        assert(rows.length == 17)
        for (t <- 2 until 16) {
          val last3 = (t - 2 to t).map(bars(_))
          val sm = last3.map(b => (b.h + b.l + b.cl) * b.vol).sum
          val sv = last3.map(_.vol).sum
          val r = rows.filter(x => x.getAs[Long]("hu") == t.toLong &&
            x.getAs[Long]("n_window") == 3L).head
          assert(r.getAs[Long]("money3_sum_cents") == sm, s"bar $t evicted sum")
          assert(r.getAs[Long]("vol_sum") == sv)
          assert(r.getAs[Double]("vwap") == sm.toDouble / (300.0 * sv.toDouble))
        }
        // the replayed hu=5 bar sorts FIRST in its micro-batch, so it
        // re-emits the window as of the last fold before it (post-bar-9:
        // bars 7, 8, 9) — idempotent, junk values never folded
        val stale = rows.filter(r => r.getAs[Long]("hu") == 5L &&
          r.getAs[Long]("money3_sum_cents") ==
            (7 to 9).map(i => (bars(i).h + bars(i).l + bars(i).cl) * bars(i).vol).sum)
        assert(stale.length == 1, rows.mkString(";"))
      } finally q.stop()
    }
  }
}
