package graft

import org.apache.spark.sql.DataFrame
import graft.ext.Similarity

/** r12 (VERDICT r11 #3): the LSH escapes must actually ESCAPE — a fixed
  * `bits` is a constant-factor dodge (candidate volume n²/2^bits
  * re-quadratizes one decade past the SF it was tuned at). Pins:
  *
  *  1. the integer bits derivation (`lshBitsFor`) at its boundaries;
  *  2. sub-quadratic candidate growth under DERIVED bits on a
  *     hash-random fixture where FIXED bits would grow ~quadratically;
  *  3. the bucket-occupancy pre-flight failing loudly on a skew-hot
  *     bucket (all vectors share their first-`bits` signs, so no bits
  *     width can split them — the documented no-cheaper-rung case);
  *  4. derived-bits default keeps the declared fixture queries at
  *     bits = 6 (the oracle-checked width at every driver SF).
  */
class LshScaleSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random 8-dim vectors: sign/magnitude derived
    * from a splitmix-style integer hash of (vec_id, dim) — balanced
    * across sign buckets the way a real embedding corpus is. */
  private def randVecs(n: Int): DataFrame = {
    def h(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until n).map { id =>
      val v = (0 until 8).map { d =>
        val u = h(id.toLong * 64 + d)
        // in [-1, 1), never exactly 0 (sign buckets need a strict side)
        (u >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0 + 1e-12
      }.toArray
      (id.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  /** All-positive first coordinates: every vector lands in ONE sign
    * bucket no matter how many bits — the adversarial skew case. */
  private def skewVecs(n: Int): DataFrame =
    (0 until n).map { id =>
      (id.toLong, Array.fill(8)(0.5 + (id % 7) * 0.01))
    }.toDF("vec_id", "embedding")

  test("lshBitsFor: integer ceil-log2 with floor 6 and cap 24") {
    // under one target bucket -> floor
    assert(Similarity.lshBitsFor(0L) == 6)
    assert(Similarity.lshBitsFor(500L) == 6)
    assert(Similarity.lshBitsFor(4096L) == 6)
    // floor holds until n/4096 needs more than 2^6 buckets
    assert(Similarity.lshBitsFor(4096L * 64) == 6)
    assert(Similarity.lshBitsFor(4096L * 64 + 1) == 7)
    // exact power boundaries (ceil, not floor)
    assert(Similarity.lshBitsFor(4096L * 128) == 7)
    assert(Similarity.lshBitsFor(4096L * 128 + 1) == 8)
    // custom target bucket
    assert(Similarity.lshBitsFor(64L, targetBucket = 8L) == 6)
    assert(Similarity.lshBitsFor(8L * 64 * 8, targetBucket = 8L) == 9)
    // cap: past 2^24 buckets more axis planes stop splitting
    assert(Similarity.lshBitsFor(Long.MaxValue) == 24)
  }

  test("derived bits hold the candidate bound sub-quadratic where fixed bits re-quadratize") {
    val t = 16L // small target bucket so a spec-sized fixture crosses decades
    val (bitsSmall, boundSmall) = Similarity.lshCandidateBound(randVecs(512), t)
    val (bitsBig, boundBig) = Similarity.lshCandidateBound(randVecs(4096), t)
    // 8x the corpus must widen the key (else the test can't distinguish)
    assert(bitsBig > bitsSmall, s"bits $bitsSmall -> $bitsBig must grow with n")
    // fixed bits would multiply the bound ~64x (8^2); derived bits re-bucket
    // toward ~targetBucket occupancy, so growth stays near-linear. Allow 3x
    // the linear slope for hash-occupancy variance at spec scale.
    val ratio = boundBig.doubleValue() / boundSmall.doubleValue().max(1.0)
    assert(ratio < 24.0,
      s"bound grew ${ratio}x across 8x data (linear = 8x, fixed-bits ~ 64x)")
  }

  test("skew-hot bucket fails the pre-flight loudly; under budget it runs") {
    // 256 co-signed vectors -> one bucket -> 32640 candidate pairs
    val skew = skewVecs(256)
    val e1 = intercept[IllegalStateException] {
      Similarity.dedupEmbeddingCosineLsh(skew, pairBudget = 1000L).collect()
    }
    assert(e1.getMessage.contains("sign-bucket pair bound"), e1.getMessage)
    assert(e1.getMessage.contains("provision a cluster") ||
      e1.getMessage.contains("Provision a cluster"), e1.getMessage)
    val e2 = intercept[IllegalStateException] {
      Similarity.simKnnJoinLsh(skew, pairBudget = 1000L).collect()
    }
    assert(e2.getMessage.contains("sim_knn_join_lsh"), e2.getMessage)
    // same corpus under its true bound: runs, and every vector pairs with
    // every other (they really are one bucket)
    val ok = Similarity.dedupEmbeddingCosineLsh(skew, pairBudget = 40000L)
    assert(ok.count() == 256L * 255 / 2)
  }

  test("fixture-scale corpora derive bits = 6 (the oracle-checked width)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (bits, _) = Similarity.lshCandidateBound(emb)
    assert(bits == 6, s"sf0.001 must stay at the floor width, got $bits")
    // and the derived-default call equals the explicit bits = 6 call
    val derived = Similarity.dedupEmbeddingCosineLsh(emb).collect()
    val pinned = Similarity.dedupEmbeddingCosineLsh(emb, bits = 6).collect()
    assert(derived.toSeq == pinned.toSeq)
  }
}
