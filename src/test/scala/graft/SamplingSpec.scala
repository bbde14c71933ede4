package graft

import graft.ext.Sampling

/** Sampling/split semantics: hash splits are deterministic and complete;
  * per-group quotas cap every stratum. */
class SamplingSpec extends SparkSpec {

  def docs = Tables.documents(spark, "/root/testdata/sf0.01")

  test("hash split is deterministic, total, and roughly proportioned") {
    val a = Sampling.sampleHashSplit(docs).collect()
    val b = Sampling.sampleHashSplit(docs).collect()
    assert(a.toSeq == b.toSeq, "split assignment must be reproducible")
    assert(a.length == docs.count())
    val frac = a.groupBy(_.getAs[String]("split")).view.mapValues(_.length.toDouble / a.length)
    assert(frac("train") > 0.8 && frac("train") < 1.0)
    assert(frac.getOrElse("val", 0.0) < 0.15 && frac.getOrElse("test", 0.0) < 0.15)
    // every bucket in [0, 100)
    assert(a.forall { r => val x = r.getAs[Int]("bucket"); x >= 0 && x < 100 })
  }

  test("systematic sample size is exactly ceil(n/k), including k = 1") {
    val n = docs.count()
    // r9 (ADVICE): k = 1 must return EVERYTHING — the old rnk % 1 == 1
    // stride was always-false and inverted the size contract
    assert(Sampling.sampleSystematic(docs, k = 1).count() == n)
    Seq(2, 7, 20).foreach { k =>
      val out = Sampling.sampleSystematic(docs, k = k).collect()
      assert(out.length == ((n + k - 1) / k),
        s"k=$k: expected ceil($n/$k) rows, got ${out.length}")
      // selected ranks are exactly the 1, 1+k, 1+2k, ... stride
      val ranks = out.map(_.getAs[Long]("rank")).sorted
      assert(ranks.zipWithIndex.forall { case (r, i) => r == 1L + i.toLong * k })
    }
  }

  test("per-group sample keeps at most k lowest-id docs per lang") {
    val out = Sampling.samplePerGroup(docs, k = 10).collect()
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      assert(rows.length <= 10)
      val ids = rows.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("doc_id"))
      assert(ids.sorted.sameElements(ids), "quota must take lowest ids in order")
    }
  }
}
