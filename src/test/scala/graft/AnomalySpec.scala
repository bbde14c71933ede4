package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.stream.Anomaly
import graft.stream.Heartbeat.Packet

/** Trailing-window streaming rate anomaly: exact z values on crafted
  * hourly counts, one-shot bucket close, under-seeded and zero-variance
  * guards, cross-batch state carry, per-key independence. */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private val H = 60L * 60 * 1000 // bucketMs in the tests: 1 h

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

  /** n packets for node inside hour-bucket b. */
  private def burst(node: Long, b: Long, n: Int): Seq[Packet] =
    (0 until n).map(i => Packet(node, b * H + i * 1000L))

  test("closed buckets score against the trailing baseline with exact z") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Packet]
      val q = Anomaly.rateAnomalyStream(input.toDS(), bucketMs = H,
          window = 24, minBuckets = 3, zThreshold = 3.0, ttlMs = 24L * H)
        .writeStream.format("memory").queryName("an").outputMode("append").start()
      try {
        def rows() = spark.sql(
          "SELECT bucket_start_ms, n, baseline_w, z, anomalous FROM an WHERE node = 1 ORDER BY bucket_start_ms")
          .collect().map(r => (r.getLong(0) / H, r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getBoolean(4))).toSeq
        // baseline hours 0..2 = counts 3,4,5; hour 3 = 16 (the spike);
        // hour 4 opens -> hours 0..2 closed under-seeded, hour 3 scored:
        // z = (3*16 - 12)/sqrt(3*50 - 144) = 36/sqrt(6)
        input.addData(
          burst(1L, 0L, 3) ++ burst(1L, 1L, 4) ++ burst(1L, 2L, 5) ++
          burst(1L, 3L, 16) ++ burst(1L, 4L, 4): _*)
        pollUntil(60000)(rows().nonEmpty)
        val zSpike = 36.0 / math.sqrt(6.0)
        assert(rows() == Seq((3L, 16L, 3L, zSpike, true)), rows().toString)
        // cross-batch: hour 5 opens in a LATER batch -> hour 4 (in-band,
        // n=4) scores against 3,4,5,16: z = (4*4 - 28)/sqrt(4*306 - 784)
        input.addData(burst(1L, 5L, 4): _*)
        pollUntil(60000)(rows().size >= 2)
        val zIn = (4.0 * 4 - 28) / math.sqrt(4.0 * 306 - 784)
        assert(rows() == Seq((3L, 16L, 3L, zSpike, true), (4L, 4L, 4L, zIn, false)),
          rows().toString)
      } finally q.stop()
    }
  }

  test("zero-variance baseline emits nothing; keys stay independent") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Packet]
      val q = Anomaly.rateAnomalyStream(input.toDS(), bucketMs = H,
          window = 24, minBuckets = 3, zThreshold = 3.0, ttlMs = 24L * H)
        .writeStream.format("memory").queryName("an2").outputMode("append").start()
      try {
        def count(node: Long) = spark.sql(s"SELECT * FROM an2 WHERE node = $node").count()
        // node 2: flat 4,4,4 baseline (variance 0) then a spike -> no emission
        // node 3: 3,4,5 baseline then spike -> emits (proves independence)
        input.addData(
          burst(2L, 0L, 4) ++ burst(2L, 1L, 4) ++ burst(2L, 2L, 4) ++
          burst(2L, 3L, 16) ++ burst(2L, 4L, 1) ++
          burst(3L, 0L, 3) ++ burst(3L, 1L, 4) ++ burst(3L, 2L, 5) ++
          burst(3L, 3L, 16) ++ burst(3L, 4L, 1): _*)
        pollUntil(60000)(count(3L) >= 1)
        assert(count(3L) == 1L)
        assert(count(2L) == 0L, "zero-variance baseline must not score")
      } finally q.stop()
    }
  }
}
