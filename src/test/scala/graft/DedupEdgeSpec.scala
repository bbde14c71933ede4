package graft

import graft.ext.{Dedup, Similarity}

/** Degenerate-input hardening for the near-dup family: empty text,
  * whitespace-only, sub-shingle-length docs, unicode — none may crash, and
  * identical degenerate docs must still dedup exactly. */
class DedupEdgeSpec extends SparkSpec {
  import spark.implicits._

  val degenerate = Seq(
    (1L, ""),
    (2L, ""),
    (3L, "   \t\n  "),
    (4L, "one"),
    (5L, "two tokens"),
    (6L, "héllo wörld ünïcode tokens here repeated héllo wörld ünïcode tokens here"),
    (7L, "héllo wörld ünïcode tokens here repeated héllo wörld ünïcode tokens here"),
    (8L, "0123 4567 89 numerics only 0123 4567 89 numerics only extra")
  ).toDF("doc_id", "text")

  test("exact dedup groups empty and unicode duplicates") {
    val out = Dedup.dedupExact(degenerate).collect()
    val byKeep = out.map(r => r.getAs[Long]("keep_doc_id") -> r.getAs[Long]("n_copies")).toMap
    assert(byKeep(1L) == 2L) // the two empty docs collapse, lowest id kept
    assert(byKeep(6L) == 2L) // unicode pair collapses
  }

  test("jaccard/minhash skip sub-shingle docs and still pair the long dups") {
    val j = Dedup.dedupNgramJaccard(degenerate, threshold = 0.3).collect()
    assert(j.exists(r => r.getAs[Long]("doc_a") == 6L && r.getAs[Long]("doc_b") == 7L))
    assert(!j.exists(r => Seq(1L, 2L, 3L, 4L, 5L).contains(r.getAs[Long]("doc_a"))))
    val m = Dedup.dedupNearMinhash(degenerate, threshold = 0.3).collect()
    assert(m.exists(r => r.getAs[Long]("doc_a") == 6L && r.getAs[Long]("doc_b") == 7L))
  }

  test("simhash gives empty/whitespace docs the zero signature (hamming 0)") {
    val out = Dedup.dedupSimhash(degenerate, maxHamming = 0).collect()
    // 1,2 (empty) and 3 (whitespace -> zero tokens) share signature 0
    val zeroPairs = out.filter(r => Seq(1L, 2L, 3L).contains(r.getAs[Long]("doc_a")))
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(zeroPairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // identical unicode docs collide too
    assert(out.exists(r => r.getAs[Long]("doc_a") == 6L && r.getAs[Long]("doc_b") == 7L))
  }

  test("multiprobe LSH survives a corpus smaller than k") {
    val e = Seq(
      (0L, Array(0.5f, -0.2f, 0.1f, 0.4f, -0.3f, 0.2f, 0.1f, 0.2f)),
      (1L, Array(0.4f, -0.1f, 0.2f, 0.5f, -0.2f, 0.1f, 0.3f, 0.1f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.simSearchLshMultiprobe(e, nQueries = 2, k = 5).collect()
    assert(out.nonEmpty && out.forall(_.getAs[Long]("rn") <= 5))
  }
}
