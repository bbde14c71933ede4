package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.stream.AdxStream
import graft.stream.AdxStream.HourBar

/** Streaming ADX vs the BATCH fold as oracle: after any prefix of the
  * bar feed the emitted (n_bars, smoothed_tr, ±DI, dx, adx) must equal
  * `window_adx` run on the events truncated to that prefix — bit-for-bit
  * doubles, across arbitrary micro-batch splits, including the
  * NULL-vs-0.0 seam (the fold uses DX = 0 internally when S⁺+S⁻ = 0
  * while the emitted column is NULL there — both sides of that seam are
  * asserted). Same harness as `SupertrendStreamSpec`. */
class AdxStreamSpec extends SparkSpec {
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

  private def optD(r: org.apache.spark.sql.Row, field: String): Option[Double] = {
    val i = r.fieldIndex(field)
    if (r.isNullAt(i)) None else Some(r.getDouble(i))
  }

  test("stream state equals the batch fold over the same prefix at every split") {
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
      val q = AdxStream.adxStream(input.toDS())
        .writeStream.format("memory").queryName("adx_stream")
        .outputMode("append").start()
      try {
        var expectedRows = 0L
        splits.zip(cutoffs).foreach { case (split, cutoff) =>
          input.addData(split.toSeq)
          expectedRows += split.length
          pollUntil(120000)(spark.table("adx_stream").count() >= expectedRows)
          assert(spark.table("adx_stream").count() == expectedRows)

          val prefix = events.filter(
            expr("unix_micros(date_trunc('hour', ts)) div 3600000000") <= cutoff)
          val batch = graft.ops.Windows.windowAdx(prefix).collect().map { r =>
            r.getAs[String]("event_type") -> (
              r.getAs[Long]("n_bars"), r.getAs[Double]("smoothed_tr"),
              optD(r, "plus_di"), optD(r, "minus_di"), optD(r, "dx"),
              r.getAs[Double]("adx"))
          }.toMap

          val got = spark.table("adx_stream").collect()
            .map(r => (r.getAs[String]("cls"), r.getAs[Long]("hu"), r))
            .groupBy(_._1).map { case (cls, rs) =>
              val r = rs.maxBy(_._2)._3
              cls -> (r.getAs[Long]("n_bars"), r.getAs[Double]("smoothed_tr"),
                optD(r, "plus_di"), optD(r, "minus_di"), optD(r, "dx"),
                r.getAs[Double]("adx"))
            }
          assert(got == batch, s"prefix<=?$cutoff: stream $got\nvs batch $batch")
        }
      } finally q.stop()
    }
  }

  test("first bar emits the NULL seam; replayed bars re-emit idempotently") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val b1 = Seq(HourBar("a", 0L, 1000L, 900L, 950L),
                   HourBar("a", 1L, 1100L, 950L, 1080L))
      val b2 = Seq(HourBar("a", 0L, 1L, 1L, 1L), // late replay, junk values
                   HourBar("a", 4L, 1200L, 1000L, 1150L)) // gap at 2, 3
      val input = MemoryStream[HourBar]
      val q = AdxStream.adxStream(input.toDS())
        .writeStream.format("memory").queryName("adx_ooo")
        .outputMode("append").start()
      try {
        input.addData(b1)
        pollUntil(60000)(spark.table("adx_ooo").count() >= b1.length)
        input.addData(b2)
        pollUntil(60000)(spark.table("adx_ooo").count() >= b1.length + b2.length)
        val rows = spark.table("adx_ooo").collect()
        assert(rows.length == 4)

        // bar 0 (seed): smoothed_tr 0.0, DIs and dx NULL, adx 0.0
        val seed = rows.filter(r => r.getAs[Long]("hu") == 0L &&
          r.getAs[Long]("n_bars") == 1L).head
        assert(seed.getAs[Double]("smoothed_tr") == 0.0 &&
          optD(seed, "plus_di").isEmpty && optD(seed, "dx").isEmpty &&
          seed.getAs[Double]("adx") == 0.0)

        // clean fold over bars 0, 1, 4 (gaps fold nothing)
        var t = 0L; var ph = 0.0; var pl = 0.0; var pc = 0.0
        var str = 0.0; var sp = 0.0; var sn = 0.0; var adx = 0.0
        def step(h: Long, l: Long, cl: Long): Unit = {
          val bh = h.toDouble; val bl = l.toDouble; val bc = cl.toDouble
          if (t == 0L) { ph = bh; pl = bl; pc = bc }
          else {
            val up = bh - ph; val dn = pl - bl
            val pdm = if (up > dn && up > 0.0) up else 0.0
            val ndm = if (dn > up && dn > 0.0) dn else 0.0
            val tr = math.max(math.max((h - l).toDouble,
              math.abs(bh - pc)), math.abs(bl - pc))
            val strN = str - str / 14.0 + tr
            val spN = sp - sp / 14.0 + pdm
            val snN = sn - sn / 14.0 + ndm
            val dx = if (spN + snN > 0.0) 100.0 * math.abs(spN - snN) / (spN + snN) else 0.0
            adx = adx + (dx - adx) / 14.0
            ph = bh; pl = bl; pc = bc; str = strN; sp = spN; sn = snN
          }
          t += 1L
        }
        Seq((1000L, 900L, 950L), (1100L, 950L, 1080L), (1200L, 1000L, 1150L))
          .foreach { case (h, l, c) => step(h, l, c) }

        val latest = rows.filter(_.getAs[Long]("hu") == 4L).head
        assert(latest.getAs[Long]("n_bars") == t)
        assert(latest.getAs[Double]("smoothed_tr") == str)
        assert(optD(latest, "plus_di").contains(100.0 * sp / str))
        assert(latest.getAs[Double]("adx") == adx)

        // the late replay re-emitted the post-batch-1 machine (2 steps)
        val stale = rows.filter(r => r.getAs[Long]("hu") == 0L &&
          r.getAs[Long]("n_bars") == 2L)
        assert(stale.length == 1, rows.mkString(";"))
      } finally q.stop()
    }
  }
}
