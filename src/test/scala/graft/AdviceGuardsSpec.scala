package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** r9: the ADVICE-flagged degenerate-input guards, each proven loud or
  * explicit instead of silently divergent:
  *  - `stat_jarque_bera`'s DECIMAL(38,0) 4th-moment bound raises instead
  *    of shipping silently-nulled sums;
  *  - `corpus_epoch_plan` emits an explicit 0-epoch row for a source whose
  *    documents tokenize to zero tokens (Spark `div` would null, DuckDB
  *    `//` would raise — the engines must agree). */
class AdviceGuardsSpec extends SparkSpec {
  import spark.implicits._

  private def eventsOf(rows: Seq[(Long, Long, String, java.lang.Double)]) =
    rows.toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", lit(Timestamp.valueOf("2024-01-01 00:00:00")))

  test("jarque-bera raises loudly past the 4th-moment magnitude bound") {
    // one value of 10^8 dollars = 10^10 cents: c^4 = 10^40 > the 10^37
    // guard line even at n = 1 — before r9 Spark silently nulled the sums
    val huge = eventsOf(Seq((1L, 1L, "click", Double.box(1e8)),
                            (2L, 1L, "click", Double.box(2e8)),
                            (3L, 1L, "click", Double.box(3e8))))
    val e = intercept[Exception] {
      graft.ops.Inference.statJarqueBera(huge).collect()
    }
    assert(e.getMessage.contains("stat_jarque_bera"), e.getMessage)

    // sane magnitudes still pass through the same code path untouched
    val ok = eventsOf(Seq((1L, 1L, "click", Double.box(10.0)),
                          (2L, 1L, "click", Double.box(20.0)),
                          (3L, 1L, "click", Double.box(40.0))))
    val row = graft.ops.Inference.statJarqueBera(ok).collect()
    assert(row.length == 1 && row(0).getAs[Long]("n") == 3L &&
      !row(0).isNullAt(row(0).fieldIndex("jb_stat")))
  }

  test("epoch plan handles a zero-token source explicitly, not divergently") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "en", "webA", 22L),
      (2L, "epsilon zeta eta theta iota", "en", "webA", 27L),
      (3L, "!!! --- ???", "en", "empty_src", 11L), // tokenizes to NOTHING
      (4L, "", "en", "empty_src", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ext.CorpusPrep.corpusEpochPlan(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val z = out("empty_src")
    assert(z.getAs[Long]("n_tokens") == 0L)
    assert(z.getAs[Long]("target_tokens") == 0L)
    assert(z.getAs[Long]("n_epochs") == 0L)
    assert(z.isNullAt(z.fieldIndex("last_epoch_tokens")))
    assert(z.isNullAt(z.fieldIndex("oversample_ppb")))
    // the live source is unaffected: weight √0 gave empty_src zero share,
    // so webA's target is the whole 2x budget
    val a = out("webA")
    assert(a.getAs[Long]("n_tokens") == 9L)
    assert(a.getAs[Long]("target_tokens") == 18L)
    assert(a.getAs[Long]("n_epochs") == 2L)
  }
}
