package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.stream.BollingerStream
import graft.stream.BollingerStream.Reading

/** Streaming Bollinger breakouts vs the BATCH operator as oracle: the
  * stream applies the band a monitor would hold at arrival time, which is
  * exactly the prior-window band the batch operator reconstructs — so on
  * an in-event-time-order feed the alert sets must be identical for any
  * micro-batch boundaries, and the integer S₁ the stream carries must
  * reproduce the batch's display mean bit for bit. */
class BollingerStreamSpec extends SparkSpec {
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

  test("stream breakouts equal the batch prior-window screen across splits") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val events = Tables.events(spark, "/root/testdata/sf0.001")
      // batch truth, keyed for set-compare; mean_prior reproduced from the
      // stream's integer S₁ by the identical divide chain
      val batch = graft.ops.Windows.windowBollinger(events).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
          r.getAs[String]("side"), r.getAs[Double]("mean_prior"))).toSet
      assert(batch.nonEmpty, "fixture must produce breakouts")

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
      val q = BollingerStream.bollingerStream(input.toDS())
        .writeStream.format("memory").queryName("boll_stream")
        .outputMode("append").start()
      try {
        val splits = Seq(feed.take(300), feed.slice(300, 700), feed.drop(700))
        splits.foreach(s => input.addData(s.toSeq))
        pollUntil(120000)(spark.table("boll_stream").count() >= batch.size)
        val got = spark.table("boll_stream").collect()
          .map(r => (r.getAs[Long]("user"), r.getAs[Long]("event_id"),
            r.getAs[String]("side"),
            r.getAs[Long]("s1").toDouble / 24.0 / 100.0)).toSet
        assert(got == batch, s"stream ${got.size} vs batch ${batch.size}")
      } finally q.stop()
    }
  }
}
