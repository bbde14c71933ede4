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

  test("per-group sample keeps at most k lowest-id docs per lang") {
    val out = Sampling.samplePerGroup(docs, k = 10).collect()
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      assert(rows.length <= 10)
      val ids = rows.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("doc_id"))
      assert(ids.sorted.sameElements(ids), "quota must take lowest ids in order")
    }
  }
}
