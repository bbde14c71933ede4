package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.stream.ControlRulesStream
import graft.stream.ControlRulesStream.HourCount

/** Streaming Western Electric screen vs the BATCH operator as oracle:
  * armed with the batch-trained (μ, σ) baseline
  * ([[graft.ops.Aggs.controlMoments]] — the Phase I / Phase II split),
  * the stream's violation rows on an in-event-time-order hourly feed
  * must equal `stat_control_rules`' output bit for bit (z doubles, all
  * four rule bits) for EVERY hour — trailing frames look only backward,
  * so each batch row is fully determined the moment its hour closes; no
  * final-bar subtraction. Also exercises the late/duplicate-hour
  * idempotent drop. Harness shape: `KeltnerStreamSpec`. */
class ControlRulesStreamSpec extends SparkSpec {
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

  test("stream violation rows equal the batch screen across splits") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val events = Tables.events(spark, "/root/testdata/sf0.001")
      val batch = graft.ops.Aggs.statControlRules(events).collect()
        .map { r =>
          (r.getAs[String]("event_type"), r.getAs[Long]("hu"),
            r.getAs[Double]("z"), r.getAs[Boolean]("rule1_3sigma"),
            r.getAs[Boolean]("rule2_2of3"), r.getAs[Boolean]("rule3_4of5"),
            r.getAs[Boolean]("rule4_run8"))
        }.toSet
      assert(batch.nonEmpty, "fixture must produce rule violations")

      val baseline = graft.ops.Aggs.controlMoments(events).collect()
        .map(r => r.getAs[String]("event_type") ->
          (r.getAs[Double]("mu"), r.getAs[Double]("sd"))).toMap

      val feed = events
        .groupBy(col("event_type"),
          unix_micros(date_trunc("hour", col("ts"))).as("hu"))
        .agg(count(lit(1)).as("n"))
        .as[(String, Long, Long)].collect()
        .map { case (c, hu, n) => HourCount(c, hu, n) }
        .sortBy(_.hu)

      val input = MemoryStream[HourCount]
      val q = ControlRulesStream.controlRulesStream(input.toDS(), baseline)
        .writeStream.format("memory").queryName("wer_stream")
        .outputMode("append").start()
      try {
        // uneven splits so the z-ring carries across micro-batches; the
        // replayed slice exercises the idempotent late-hour drop
        val splits = Seq(feed.take(97), feed.slice(97, 400),
          feed.slice(200, 400), feed.drop(400))
        splits.foreach(s => input.addData(s.toSeq))
        // classes with a degenerate baseline (sd = 0) are gated out by
        // BOTH engines — expect one row per hour of the live classes
        val expected = feed.count(r => baseline.get(r.cls).exists(_._2 > 0))
        pollUntil(120000)(spark.table("wer_stream").count() >= expected)
        val got = spark.table("wer_stream").collect()
          .map { r =>
            (r.getAs[String]("cls"), r.getAs[Long]("hu"),
              r.getAs[Double]("z"), r.getAs[Boolean]("rule1_3sigma"),
              r.getAs[Boolean]("rule2_2of3"), r.getAs[Boolean]("rule3_4of5"),
              r.getAs[Boolean]("rule4_run8"))
          }
        assert(got.length == expected,
          s"expected one emitted row per distinct live hour ($expected), " +
            s"got ${got.length} — late-hour drop not idempotent?")
        val gotViolations = got.filter(r => r._4 || r._5 || r._6 || r._7).toSet
        assert(gotViolations == batch,
          s"stream ${gotViolations.size} violations vs batch ${batch.size}; " +
            s"diff sample: ${(gotViolations.diff(batch) ++ batch.diff(gotViolations)).take(3)}")
      } finally q.stop()
    }
  }
}
