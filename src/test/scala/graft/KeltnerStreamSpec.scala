package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.stream.KeltnerStream
import graft.stream.KeltnerStream.Reading

/** Streaming Keltner channel vs the BATCH operator as oracle: the
  * stream closes each class-hour bar when the first later-hour reading
  * arrives, at which moment the batch row for that bar is fully
  * determined — so on an in-event-time-order feed the emitted rows must
  * equal the batch rows bit for bit (mid/upper/lower doubles, exact
  * integer breakout flags) for every bar EXCEPT each class's final one,
  * which never closes in the stream (no later hour arrives) — the spec
  * subtracts exactly that set. Harness shape: `RsiStreamSpec`. */
class KeltnerStreamSpec extends SparkSpec {
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

  test("stream bar-close rows equal the batch channel across splits") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val events = Tables.events(spark, "/root/testdata/sf0.001")
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC)
      def hourUs(s: String): Long =
        java.time.Instant.from(fmt.parse(s)).getEpochSecond * 1000000L
      val batchAll = graft.ops.Windows.windowKeltner(events).collect()
        .map { r =>
          (r.getAs[String]("event_type"), hourUs(r.getAs[String]("hour_s")),
            r.getAs[Double]("mid"), r.getAs[Double]("upper"),
            r.getAs[Double]("lower"), r.getAs[Boolean]("above_upper"),
            r.getAs[Boolean]("below_lower"))
        }
      // the stream never closes each class's FINAL bar — subtract it
      val lastBar = batchAll.groupBy(_._1).map { case (c, rs) =>
        (c, rs.map(_._2).max) }.toMap
      val batch = batchAll.filterNot(r => lastBar(r._1) == r._2).toSet
      assert(batch.nonEmpty, "fixture must produce full channel windows")
      assert(batch.exists(r => r._6 || r._7),
        "fixture must exercise at least one breakout flag")

      // the stream's input: the batch operator's own cents quantization
      val feed = events.filter(col("value").isNotNull)
        .select(col("event_type"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"),
          (col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)) * 100)
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))
            .cast("long").as("cents"))
        .as[(String, Long, Long, Long)].collect()
        .map { case (c, t, e, v) => Reading(c, t, e, v) }
        .sortBy(r => (r.ts_us, r.event_id))

      val input = MemoryStream[Reading]
      val q = KeltnerStream.keltnerStream(input.toDS())
        .writeStream.format("memory").queryName("keltner_stream")
        .outputMode("append").start()
      try {
        // uneven splits so open bars and the closed-bar ring carry across
        val splits = Seq(feed.take(311), feed.slice(311, 911), feed.drop(911))
        splits.foreach(s => input.addData(s.toSeq))
        pollUntil(120000)(spark.table("keltner_stream").count() >= batch.size)
        val got = spark.table("keltner_stream").collect()
          .map { r =>
            (r.getAs[String]("cls"), r.getAs[Long]("hu"),
              r.getAs[Double]("mid"), r.getAs[Double]("upper"),
              r.getAs[Double]("lower"), r.getAs[Boolean]("above_upper"),
              r.getAs[Boolean]("below_lower"))
          }.toSet
        assert(got == batch,
          s"stream ${got.size} rows vs batch ${batch.size}; " +
            s"diff sample: ${(got.diff(batch) ++ batch.diff(got)).take(3)}")
      } finally q.stop()
    }
  }
}
