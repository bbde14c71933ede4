package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.stream.DistinctStats
import graft.stream.DistinctStats.KeyedHash

/** Streaming KMV distinct estimates vs the batch aggregate as oracle: a
  * smallest-k distinct set is order- and batching-independent, so the last
  * estimate the stream emits per key must be BIT-IDENTICAL to the batch
  * `kmv_distinct` over the same rows — across micro-batch boundaries and
  * a mid-stream duplicate flood. */
class DistinctStatsSpec extends SparkSpec {
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

  test("stream sketch converges to the batch kmv_distinct, k exceeded") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val k = 16
      // two routes: 100 distinct ids (> k, estimate regime) and 5 (< k,
      // exact regime); batch 2 re-sends ids (duplicates must not move m)
      val ids1 = (1L to 100L).map(("env", _))
      val ids2 = (1L to 5L).map(("sys", _))
      val all = (ids1 ++ ids2).toDF("key", "id")
        .select(col("key"), graft.ops.Aggs.kmvHash(col("id")).as("h"))
        .as[(String, Double)].collect().map { case (kk, h) => KeyedHash(kk, h) }

      val input = MemoryStream[KeyedHash]
      val q = DistinctStats.distinctStream(input.toDS(), k = k)
        .writeStream.format("memory").queryName("kmv_stream")
        .outputMode("append").start()
      try {
        def latest(): Map[String, (Long, Double, Double)] =
          spark.sql("SELECT key, m, theta, est_distinct FROM kmv_stream")
            .collect().groupBy(_.getString(0)).map { case (kk, rs) =>
              // memory-sink row order is not batch order; the newest state
              // has the largest m and, at full k, the smallest theta
              val r = rs.minBy(x => (-x.getLong(1), x.getDouble(2)))
              kk -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))
            }
        input.addData(all.take(60))
        pollUntil(60000)(latest().nonEmpty)
        input.addData(all.drop(60))
        input.addData(all.take(30)) // duplicate flood
        pollUntil(60000)(latest().size == 2 &&
          latest()("env")._1 == k) // sketch full
        val got = latest()

        // batch oracle over the identical rows (duplicates included)
        val batch = (ids1 ++ ids2 ++ ids1.take(30)).toDF("key", "id")
          .select(col("key"), graft.ops.Aggs.kmvHash(col("id")).as("h"))
          .groupBy(col("key"))
          .agg(graft.functions.KmvDistinct.kmv_distinct(col("h"), k).as("s"))
          .select(col("key"), col("s.m"), col("s.theta"), col("s.est_distinct"))
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
        assert(got == batch, s"stream $got vs batch $batch")
        assert(got("sys")._1 == 5L && got("sys")._3 == 5.0) // exact regime
        assert(got("env")._1 == k.toLong && got("env")._3 > 50.0)
      } finally q.stop()
    }
  }
}
