package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.stream.QuantileSketchStream
import graft.stream.QuantileSketchStream.KeyedBand

/** Streaming banded-histogram quantiles vs the batch
  * `agg_quantiles_sketch` as oracle: band-counter increments are order-
  * and batching-independent, so the newest estimate the stream emits per
  * key must be BIT-IDENTICAL to the batch query over the same rows —
  * across micro-batch boundaries and interleaved keys. */
class QuantileSketchStreamSpec extends SparkSpec {
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

  test("stream histogram estimates equal the batch sketch query") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // two classes with different spreads, values across several bands;
      // bands computed with the BATCH band function (shared spelling)
      val vals = (1 to 80).map(i => ("lat", i * 3.7 + 0.5)) ++
        (1 to 40).map(i => ("size", i * i * 0.9))
      val banded = vals.toDF("key", "value")
        .select(col("key"), graft.ops.Aggs.sketchBand(col("value")).as("band"))
        .as[(String, Long)].collect()
        .map { case (k, b) => KeyedBand(k, b.toInt) }

      val input = MemoryStream[KeyedBand]
      val q = QuantileSketchStream.quantileStream(input.toDS())
        .writeStream.format("memory").queryName("qsketch_stream")
        .outputMode("append").start()
      try {
        def latest(): Map[String, (Long, Long, Double, Double, Double)] =
          spark.sql(
            "SELECT key, n, n_bands, p50_est, p90_est, p99_est FROM qsketch_stream")
            .collect().groupBy(_.getString(0)).map { case (k, rs) =>
              val r = rs.maxBy(_.getLong(1)) // newest state has the largest n
              k -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
                r.getDouble(4), r.getDouble(5)))
            }
        input.addData(banded.take(50))
        pollUntil(60000)(latest().nonEmpty)
        input.addData(banded.slice(50, 90))
        input.addData(banded.drop(90))
        pollUntil(60000)(latest().get("lat").exists(_._1 == 80L) &&
          latest().get("size").exists(_._1 == 40L))
        val got = latest()

        // batch oracle over the identical rows, via the declared query
        val batch = graft.ops.Aggs.aggQuantilesSketch(
            vals.toDF("event_type", "value"))
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
              r.getDouble(5)))).toMap
        assert(got == batch, s"stream $got vs batch $batch")
      } finally q.stop()
    }
  }
}
