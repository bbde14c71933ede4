package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.stream.StochasticStream
import graft.stream.StochasticStream.Reading

/** Streaming stochastic oscillator vs the BATCH operator as oracle: the
  * stream's reading ring at each arrival is exactly the trailing
  * 14-reading frame the batch operator reconstructs, and its carried
  * (k₋₁, k₋₂) are the batch's %K lags — so on an in-event-time-order
  * feed the emitted (hi, lo, %K, %D) rows must be identical — integer
  * selections exactly, %K/%D doubles bit for bit, None exactly where
  * the batch nulls (flat windows, unwarmed lags) — for any micro-batch
  * boundaries. Harness shape: `RsiStreamSpec`. */
class StochasticStreamSpec extends SparkSpec {
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

  private def optD(r: org.apache.spark.sql.Row, field: String): Option[Double] =
    if (r.isNullAt(r.fieldIndex(field))) None
    else Some(r.getAs[Double](field))

  test("stream rows equal the batch trailing-frame stochastic across splits") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val events = Tables.events(spark, "/root/testdata/sf0.001")
      val batch = graft.ops.Windows.windowStochastic(events).collect()
        .map { r =>
          (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
            r.getAs[Long]("hi_cents"), r.getAs[Long]("lo_cents"),
            optD(r, "pct_k"), optD(r, "pct_d"))
        }.toSet
      assert(batch.nonEmpty, "fixture must produce full stochastic windows")
      assert(batch.exists(_._6.isDefined), "fixture must warm the %D lags")

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
      val q = StochasticStream.stochasticStream(input.toDS())
        .writeStream.format("memory").queryName("stoch_stream")
        .outputMode("append").start()
      try {
        // uneven splits so the ring and both %K lags carry cross batches
        val splits = Seq(feed.take(201), feed.slice(201, 617), feed.drop(617))
        splits.foreach(s => input.addData(s.toSeq))
        pollUntil(120000)(spark.table("stoch_stream").count() >= batch.size)
        val got = spark.table("stoch_stream").collect()
          .map { r =>
            (r.getAs[Long]("user"), r.getAs[Long]("event_id"),
              r.getAs[Long]("hi_cents"), r.getAs[Long]("lo_cents"),
              optD(r, "pct_k"), optD(r, "pct_d"))
          }.toSet
        assert(got == batch,
          s"stream ${got.size} rows vs batch ${batch.size}; " +
            s"diff sample: ${(got.diff(batch) ++ batch.diff(got)).take(3)}")
      } finally q.stop()
    }
  }
}
