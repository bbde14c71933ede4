package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.stream.RsiStream
import graft.stream.RsiStream.Reading

/** Streaming RSI vs the BATCH operator as oracle: the stream's diff ring
  * at each arrival is exactly the trailing 14-diff frame the batch
  * operator reconstructs, so on an in-event-time-order feed the emitted
  * (gain, loss, rsi) rows must be identical — integer sums exactly, rsi
  * doubles bit for bit — for any micro-batch boundaries. Harness shape:
  * `BollingerStreamSpec`. */
class RsiStreamSpec extends SparkSpec {
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

  test("stream rows equal the batch trailing-frame RSI across splits") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val events = Tables.events(spark, "/root/testdata/sf0.001")
      val batch = graft.ops.Windows.windowRsi(events).collect()
        .map { r =>
          (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
            r.getAs[Long]("gain_cents"), r.getAs[Long]("loss_cents"),
            if (r.isNullAt(r.fieldIndex("rsi"))) None
            else Some(r.getAs[Double]("rsi")))
        }.toSet
      assert(batch.nonEmpty, "fixture must produce full RSI windows")

      // the stream's input: the batch operator's own cents quantization
      val feed = events.filter(col("value").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"),
          (col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)) * 100)
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))
            .cast("long").as("cents"))
        .as[(Long, Long, Long, Long)].collect()
        .map { case (u, t, e, c) => Reading(u, t, e, c) }
        .sortBy(r => (r.ts_us, r.event_id))

      val input = MemoryStream[Reading]
      val q = RsiStream.rsiStream(input.toDS())
        .writeStream.format("memory").queryName("rsi_stream")
        .outputMode("append").start()
      try {
        // uneven splits so rings and the prev-reading carry cross batches
        val splits = Seq(feed.take(137), feed.slice(137, 704), feed.drop(704))
        splits.foreach(s => input.addData(s.toSeq))
        pollUntil(120000)(spark.table("rsi_stream").count() >= batch.size)
        val got = spark.table("rsi_stream").collect()
          .map { r =>
            (r.getAs[Long]("user"), r.getAs[Long]("event_id"),
              r.getAs[Long]("gain_cents"), r.getAs[Long]("loss_cents"),
              if (r.isNullAt(r.fieldIndex("rsi"))) None
              else Some(r.getAs[Double]("rsi")))
          }.toSet
        assert(got == batch,
          s"stream ${got.size} rows vs batch ${batch.size}; " +
            s"diff sample: ${(got.diff(batch) ++ batch.diff(got)).take(3)}")
      } finally q.stop()
    }
  }
}
