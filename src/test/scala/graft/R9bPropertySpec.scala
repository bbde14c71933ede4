package graft

import java.sql.Timestamp

/** Property tests for the r9b additions — each pins the CLAIM its
  * operator's documentation makes, on adversarial synthetic frames:
  *
  *  - winnowing's density GUARANTEE: two documents sharing any passage of
  *    w+k−1 tokens MUST share a fingerprint (the Schleimer et al. theorem
  *    the op's value rests on);
  *  - Neyman allocation's exact-budget law: Σ k_alloc == budget for any
  *    budget, with weight ordering respected (noisier stratum of equal
  *    size never gets fewer);
  *  - GESD's masking-proofness: two planted extreme outliers are removed
  *    in deviation order in rounds 1 and 2 — the case single-pass Grubbs
  *    is blind to. */
class R9bPropertySpec extends SparkSpec {
  import spark.implicits._

  test("winnowing guarantees a shared fingerprint for any shared 8-token passage") {
    // k = 5, w = 4 ⇒ guarantee window = w + k − 1 = 8 tokens
    val passage = "alpha bravo charlie delta echo foxtrot golf hotel"
    def noise(seed: Int, n: Int): String =
      (1 to n).map(i => s"w${seed}x$i").mkString(" ")
    // the shared passage is embedded at DIFFERENT offsets amid disjoint noise
    val docs = Seq(
      (1L, s"${noise(1, 13)} $passage ${noise(2, 7)}", "en", "a", 0L),
      (2L, s"${noise(3, 2)} $passage ${noise(4, 21)}", "en", "b", 0L),
      (3L, noise(5, 40), "en", "c", 0L) // control: no shared passage
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = ext.Dedup.dedupWinnowing(docs, minShared = 1).collect()
    val keys = pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(keys.contains((1L, 2L)), s"guaranteed pair missing: ${pairs.mkString(";")}")
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L), "control doc matched")
  }

  test("neyman allocation lands the exact budget and respects noise ordering") {
    // stratum sizes equal; variance of n_chars wildly different
    val docs = (
      (1 to 40).map(i => (100L + i, "t", "noisy", "s", if (i % 2 == 0) 10L else 100000L)) ++
      (1 to 40).map(i => (200L + i, "t", "calm", "s", 5000L + i)) ++
      (1 to 40).map(i => (300L + i, "t", "mid", "s", if (i % 2 == 0) 4000L else 6000L))
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    // budget 44 saturates the noisy stratum (capacity 40): the capped
    // surplus must redistribute and the total still land exactly
    for (budget <- Seq(7, 30, 44)) {
      val picked = ext.Sampling.sampleNeymanAlloc(docs, budget).collect()
      assert(picked.length == budget, s"budget $budget: got ${picked.length}")
      val alloc = picked.map(r =>
        r.getAs[String]("lang") -> r.getAs[Long]("k_alloc")).toMap
      // equal sizes: allocation must order noisy >= mid >= calm
      assert(alloc.getOrElse("noisy", 0L) >= alloc.getOrElse("mid", 0L),
        s"budget $budget: $alloc")
      assert(alloc.getOrElse("mid", 0L) >= alloc.getOrElse("calm", 0L),
        s"budget $budget: $alloc")
    }
    // a SECOND cascade (redistribution itself saturating a stratum) must
    // fail loudly, never silently under-deliver
    val err = intercept[IllegalArgumentException] {
      ext.Sampling.sampleNeymanAlloc(docs, 100).collect()
    }
    assert(err.getMessage.contains("deliverable"))
  }

  test("GESD removes two planted masking outliers in deviation order") {
    val base = 1700000000000L
    // 40 quiet readings around 50.00, plus two extremes that mask each
    // other for single-pass Grubbs: 500.00 and 480.00
    val vals = (1 to 40).map(i => 50.0 + (i % 5) * 0.01) ++ Seq(500.0, 480.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, new Timestamp(base + i * 60000L), 1L, "a", v, "{}")
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.ops.Inference.statGesdOutliers(df).collect()
      .filter(_.getAs[String]("event_type") == "a")
      .sortBy(_.getAs[Long]("round_no"))
    assert(out.length == 3)
    assert(out(0).getAs[Double]("outlier_value") == 500.0, "round 1")
    assert(out(1).getAs[Double]("outlier_value") == 480.0, "round 2")
    // after both are gone, the r statistic collapses toward quiet-data range
    assert(out(1).getAs[Double]("r_stat") > out(2).getAs[Double]("r_stat"),
      s"restudentized tail: ${out.mkString(";")}")
    // risk-set countdown: n decreases by exactly one per round
    assert(out.map(_.getAs[Long]("n_used")).toSeq == Seq(42L, 41L, 40L))
  }
}
