package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication (training-pipeline north star, streaming form of
  * `ext.Dedup.dedupExact` / `ext.Text.textFingerprint`): suppress
  * re-arrivals of the same document content — crawl re-fetches, upstream
  * replays — as they flow in, instead of re-scanning the corpus in batch.
  *
  * State is one fingerprint per unique document, BOUNDED by the event-time
  * watermark: `dropDuplicatesWithinWatermark` evicts a fingerprint once the
  * watermark passes its event time + horizon, so state size tracks the
  * horizon's unique-arrival rate, not corpus size — the property that keeps
  * this runnable forever on an unbounded crawl. A duplicate arriving after
  * its original was evicted is re-emitted (at-most-one per horizon, not
  * global exactly-once — global is the batch job's contract). */
object StreamDedup {

  /** Whitespace-normalized lowercase content fingerprint — same definition
    * as the batch `text_fingerprint` query, so batch and stream agree on
    * what "identical" means. */
  def fingerprint(textCol: String): org.apache.spark.sql.Column =
    md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " ").cast("binary"))

  /** Drop duplicate contents within the watermark horizon. Works on both
    * batch frames (plain dropDuplicates semantics in tests/backfills) and
    * streaming frames. `eventTimeCol` must be a timestamp column. */
  def dedupStream(docs: DataFrame, eventTimeCol: String,
                  horizon: String, textCol: String = "text"): DataFrame = {
    val keyed = docs.withColumn("fingerprint", fingerprint(textCol))
    if (docs.isStreaming)
      keyed.withWatermark(eventTimeCol, horizon)
        .dropDuplicatesWithinWatermark("fingerprint")
    else
      keyed.dropDuplicates("fingerprint")
  }
}
