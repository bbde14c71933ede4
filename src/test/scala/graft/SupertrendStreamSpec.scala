package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.stream.SupertrendStream
import graft.stream.SupertrendStream.HourBar

/** Streaming Supertrend vs the BATCH state-machine fold as oracle: the
  * stream's state is the fold accumulator, so after any prefix of the
  * bar feed the emitted (n_bars, atr, bands, direction, n_flips) must
  * equal `window_supertrend` run on the events truncated to that prefix
  * — bit-for-bit on the doubles, across arbitrary micro-batch splits.
  * Same harness shape as `HoltStreamSpec`; the contract novelty under
  * test: the state is a REGIME machine (branchy ratchets + flips), so
  * bit-identity here proves every branch decision lands the same way
  * live as in the batch replay. */
class SupertrendStreamSpec extends SparkSpec {
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

  /** The batch op's own bar build (classHourBarsV), keyed by hour unit. */
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
        max(when(col("rn") === col("cnt"), col("c0"))).as("cl"))
      .as[HourBar].collect().sortBy(r => (r.hu, r.cls))
  }

  test("stream machine equals the batch fold over the same prefix at every split") {
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
      val q = SupertrendStream.supertrendStream(input.toDS())
        .writeStream.format("memory").queryName("st_stream")
        .outputMode("append").start()
      try {
        var expectedRows = 0L
        splits.zip(cutoffs).foreach { case (split, cutoff) =>
          input.addData(split.toSeq)
          expectedRows += split.length
          pollUntil(120000)(spark.table("st_stream").count() >= expectedRows)
          assert(spark.table("st_stream").count() == expectedRows)

          // batch truth on the identical prefix
          val prefix = events.filter(
            expr("unix_micros(date_trunc('hour', ts)) div 3600000000") <= cutoff)
          val batch = graft.ops.Windows.windowSupertrend(prefix).collect().map { r =>
            r.getAs[String]("event_type") -> (
              r.getAs[Long]("n_bars"), r.getAs[Double]("atr_wilder"),
              r.getAs[Double]("final_upper"), r.getAs[Double]("final_lower"),
              r.getAs[Long]("direction"), r.getAs[Long]("n_flips"))
          }.toMap

          // stream truth: per class, the row at its max hour so far
          val got = spark.table("st_stream").collect()
            .map(r => (r.getAs[String]("cls"), r.getAs[Long]("hu"), r))
            .groupBy(_._1).map { case (cls, rs) =>
              val r = rs.maxBy(_._2)._3
              cls -> (r.getAs[Long]("n_bars"), r.getAs[Double]("atr_wilder"),
                r.getAs[Double]("final_upper"), r.getAs[Double]("final_lower"),
                r.getAs[Long]("direction"), r.getAs[Long]("n_flips"))
            }
          assert(got == batch, s"prefix<=?$cutoff: stream $got\nvs batch $batch")
        }
      } finally q.stop()
    }
  }

  test("gaps fold nothing; replayed bars re-emit the machine idempotently") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // h/l/cl chosen so bar 2 forces a flip (close far below the band)
      val b1 = Seq(HourBar("a", 0L, 1000L, 900L, 950L),
                   HourBar("a", 1L, 980L, 100L, 120L),
                   HourBar("a", 2L, 400L, 300L, 380L))
      val b2 = Seq(HourBar("a", 1L, 999L, 1L, 2L),  // late replay, junk values
                   HourBar("a", 5L, 500L, 420L, 480L)) // gap at 3, 4
      val input = MemoryStream[HourBar]
      val q = SupertrendStream.supertrendStream(input.toDS())
        .writeStream.format("memory").queryName("st_ooo")
        .outputMode("append").start()
      try {
        input.addData(b1)
        pollUntil(60000)(spark.table("st_ooo").count() >= b1.length)
        input.addData(b2)
        pollUntil(60000)(spark.table("st_ooo").count() >= b1.length + b2.length)
        val rows = spark.table("st_ooo").collect()
        assert(rows.length == b1.length + b2.length)

        // clean in-order fold over the deduped OBSERVED feed (bars 0, 1,
        // 2, 5 — the gap hours contribute no steps)
        var t = 0L; var pc = 0.0; var atr = 0.0; var fu = 0.0; var fl = 0.0
        var dir = 1.0; var flips = 0L
        def step(h: Long, l: Long, cl: Long): Unit = {
          val bh = h.toDouble; val bl = l.toDouble; val bc = cl.toDouble
          if (t == 0L) { pc = bc; atr = 0.0; fu = (h + l).toDouble / 2.0; fl = fu }
          else {
            val tr = math.max(math.max((h - l).toDouble,
              math.abs(bh - pc)), math.abs(bl - pc))
            val at = atr - atr / 14.0 + tr
            val hl2 = (bh + bl) / 2.0
            val bu = hl2 + 3.0 * at; val bo = hl2 - 3.0 * at
            val fuN = if (bu < fu || pc > fu) bu else fu
            val flN = if (bo > fl || pc < fl) bo else fl
            val flip = if (dir > 0.0) bc < flN else bc > fuN
            pc = bc; atr = at; fu = fuN; fl = flN
            if (flip) { dir = -dir; flips += 1L }
          }
          t += 1L
        }
        Seq((1000L, 900L, 950L), (980L, 100L, 120L), (400L, 300L, 380L),
          (500L, 420L, 480L)).foreach { case (h, l, c) => step(h, l, c) }

        val latest = rows.filter(_.getAs[Long]("hu") == 5L).head
        assert(latest.getAs[Long]("n_bars") == t)
        assert(latest.getAs[Double]("atr_wilder") == atr / 100.0)
        assert(latest.getAs[Double]("final_upper") == fu / 100.0)
        assert(latest.getAs[Double]("final_lower") == fl / 100.0)
        assert(latest.getAs[Long]("direction") == dir.toLong)
        assert(latest.getAs[Long]("n_flips") == flips)

        // the late replay re-emitted the post-batch-1 machine (3 steps)
        val stale = rows.filter(r => r.getAs[Long]("hu") == 1L &&
          r.getAs[Long]("n_bars") == 3L)
        assert(stale.length == 1, rows.mkString(";"))
      } finally q.stop()
    }
  }
}
