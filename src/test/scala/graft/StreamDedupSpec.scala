package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.stream.StreamDedup

/** Streaming dedup semantics: duplicates within the watermark horizon are
  * suppressed, state is evicted once the watermark passes, and a
  * post-eviction re-arrival is re-emitted (bounded state, not global). */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Long) = new Timestamp(minutes * 60L * 1000L)

  test("drops in-horizon duplicates, re-admits after watermark eviction") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val docs = input.toDF().toDF("event_ts", "text")
    val out = StreamDedup.dedupStream(docs, "event_ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: original + same-content duplicate (whitespace/case differ)
      input.addData((ts(0), "Hello  World"), (ts(1), "hello world"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 1)
      // batch 2: unrelated doc far ahead advances the watermark past
      // batch 1's fingerprint state (0:01 + 10min << 1:00)
      input.addData((ts(60), "something else entirely"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
      // batch 3: the old content reappears after eviction -> re-emitted
      input.addData((ts(61), "hello   world"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 3)
    } finally q.stop()
  }

  test("batch frames get plain fingerprint dropDuplicates") {
    val docs = Seq((ts(0), "a  b"), (ts(1), "A B"), (ts(2), "c"))
      .toDF("event_ts", "text")
    assert(StreamDedup.dedupStream(docs, "event_ts", "10 minutes").count() == 2)
  }
}
