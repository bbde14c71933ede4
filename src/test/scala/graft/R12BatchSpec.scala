package graft

import graft.ext.{Dedup, Similarity}
import graft.ops.RankStats

/** r12 operator batch, re-derived from first principles on designed
  * fixtures: Conover squared-ranks (hand-computed ranks/moments),
  * duplicated-ngram coverage (planted boilerplate), the dedup threshold
  * curve (known-jaccard pair, monotone non-increasing), and range
  * similarity search (brute-force dual of top-k). */
class R12BatchSpec extends SparkSpec {
  import spark.implicits._

  test("conover squared-ranks: hand-computed statistic on a designed fixture") {
    // class A tight around its mean, class B spread — a pure scale
    // difference. Values in whole dollars so cents are exact.
    val a = Seq(10.0, 10.0, 11.0, 11.0) // mean 10.5, |dev| cents = 50 x4
    val b = Seq(1.0, 6.0, 15.0, 20.0)   // mean 10.5, |dev| = 950,450,450,950
    val rows = a.map(("click", _)) ++ b.map(("view", _))
    val df = rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
      .toDF("event_id", "event_type", "value")
    val out = RankStats.statConoverSquaredRanks(df).collect()(0)
    // combined |dev| sample: 50,50,50,50 (A), 450,450,950,950 (B)
    // avg ranks: 50 -> (1+2+3+4)/4 = 2.5; 450 -> 5.5; 950 -> 7.5
    // T = 4 * 2.5^2 = 25
    assert(out.getAs[Long]("n_a") == 4L && out.getAs[Long]("n_b") == 4L)
    assert(math.abs(out.getAs[Double]("t_stat") - 25.0) < 1e-12)
    // S2 = 4*6.25 + 2*30.25 + 2*56.25 = 198; E[T] = 4*198/8 = 99
    assert(math.abs(out.getAs[Double]("mean_t") - 99.0) < 1e-12)
    // S4 = 4*39.0625 + 2*915.0625 + 2*3164.0625 = 8314.5
    // Var = (16/56)*(8314.5 - 198^2/8) = (2/7)*3414 = 975.428571...
    assert(math.abs(out.getAs[Double]("var_t") - 6828.0 / 7.0) < 1e-9)
    val z = out.getAs[Double]("z_score")
    assert(math.abs(z - (25.0 - 99.0) / math.sqrt(6828.0 / 7.0)) < 1e-12)
    assert(z < -2.0, s"pure scale difference must reject: z = $z")
  }

  test("conover squared-ranks: equal-scale classes give |z| near zero") {
    // identical multisets -> every deviation tied across classes -> T at
    // its expectation exactly
    val vals = Seq(1.0, 5.0, 9.0, 13.0)
    val rows = vals.map(("click", _)) ++ vals.map(("view", _))
    val df = rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
      .toDF("event_id", "event_type", "value")
    val out = RankStats.statConoverSquaredRanks(df).collect()(0)
    assert(math.abs(out.getAs[Double]("t_stat") - out.getAs[Double]("mean_t")) < 1e-9)
  }

  test("dup-ngram coverage: planted boilerplate scores 1.0, unique text 0.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),      // shares all with doc 2
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "one two three four five six seven"),   // unique
      (4L, "too short"),                           // < 3 tokens: no shingles
      (5L, "alpha beta gamma zeta eta theta")      // shares 1 of 4 shingles
    ).toDF("doc_id", "text")
    val out = Dedup.textDupNgramCoverage(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_dup_shingles"),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) == ((3L, 3L, Some(1.0))))
    assert(out(2L) == ((3L, 3L, Some(1.0))))
    assert(out(3L) == ((5L, 0L, Some(0.0))))
    assert(out(4L) == ((0L, 0L, None)))
    assert(out(5L)._1 == 4L && out(5L)._2 == 1L) // "alpha beta gamma" shared
    assert(math.abs(out(5L)._3.get - 0.25) < 1e-15)
  }

  test("dedup threshold curve: all 8 rungs present, non-increasing, known pair") {
    // docs 1/2: 4 and 4 shingles sharing 3 -> jaccard 3/5 = 0.6
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e zz"),
      (3L, "completely different text here now")
    ).toDF("doc_id", "text")
    val rows = Dedup.dedupThresholdCurve(docs).collect()
    assert(rows.length == 8, "every ladder rung must report")
    val byT = rows.map(r => (math.round(r.getAs[Double]("threshold") * 10).toInt,
      (r.getAs[Long]("n_dup_pairs"), r.getAs[Long]("n_docs_droppable")))).toMap
    for (k <- 1 to 6) assert(byT(k) == ((1L, 1L)), s"rung 0.$k")
    for (k <- 7 to 8) assert(byT(k) == ((0L, 0L)), s"rung 0.$k")
    // monotone non-increasing in the threshold
    val ps = (1 to 8).map(k => byT(k)._1)
    assert(ps.zip(ps.tail).forall { case (x, y) => x >= y })
  }

  test("range search is the threshold dual of brute-force cosine") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = Similarity.simSearchRange(emb, nQueries = 5, minCosine = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // brute force from the raw vectors
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i) * y(i); i += 1 }; s
    }
    val want = for {
      q <- vecs.keys.toSeq.filter(_ < 5)
      c <- vecs.keys.toSeq if c != q
      cos = dot(vecs(q), vecs(c)) / (math.sqrt(dot(vecs(q), vecs(q))) *
        math.sqrt(dot(vecs(c), vecs(c))))
      if cos >= 0.3
    } yield (q, c)
    assert(got.map(t => (t._1, t._2)).toSet == want.toSet)
    // ordering contract: per query, cosine descending
    got.groupBy(_._1).values.foreach { g =>
      val cs = g.map(_._3)
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
  }
}
