package graft

import graft.ext.Text

/** r11 (VERDICT r10 #3): `text_decontaminate`'s broadcast budget. The
  * benchmark gram set is broadcast on the contract that a bench suite is
  * a small constant; the guard counts the (localCheckpoint'd) gram set
  * BEFORE the broadcast and fails actionably past `maxBenchGrams` instead
  * of OOMing the driver on a corpus-proportional probe side. Under the
  * budget the result is unchanged — the guard is a pre-flight on an
  * already-materialized frame, never a semantic branch. */
class DecontaminateGuardSpec extends SparkSpec {

  private val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("under budget: result identical to the unguarded computation") {
    val r = Text.textDecontaminate(docs).collect()
    assert(r.nonEmpty)
    // every non-bench doc appears exactly once, flags consistent
    assert(r.forall(row => (row.getLong(2) == 1L) == (row.getLong(1) > 0L)))
    val again = Text.textDecontaminate(docs, maxBenchGrams = Long.MaxValue).collect()
    assert(r.toSeq == again.toSeq)
  }

  test("an oversized bench side trips the guard loudly, pre-broadcast") {
    val e = intercept[IllegalStateException] {
      Text.textDecontaminate(docs, maxBenchGrams = 10L)
    }
    assert(e.getMessage.contains("text_decontaminate"), e.getMessage)
    assert(e.getMessage.contains("join_bloom_prefilter"), e.getMessage)
    assert(e.getMessage.contains("broadcast budget"), e.getMessage)
  }
}
