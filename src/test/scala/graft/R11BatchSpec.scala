package graft

import java.sql.Timestamp
import java.time.LocalDateTime
import org.apache.spark.sql.functions._
import graft.ops.{Aggs, RankStats}

/** r11 batch brute checks: each operator against a literal re-computation
  * on a designed fixture (the house spec discipline — the oracle proves
  * cross-engine parity; these prove the MATH). */
class R11BatchSpec extends SparkSpec {
  import spark.implicits._

  private val base = LocalDateTime.of(2024, 1, 10, 0, 0, 0)
  private def lcg(s: Long): Long = (s * 6364136223846793005L + 1442695040888963407L) >>> 33

  private def relEq(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("stat_kuiper: V = D+ + D- from literal CDF enumeration") {
    // early = a tight middle band, late = a wide mixture straddling it:
    // the CDFs CROSS, so both directional gaps are real (what Kuiper sees
    // and one-sided KS misses)
    val rows = (0 until 600).map { i =>
      val early = i < 300
      val v = if (early) 2.0 + (lcg(i) % 20) / 10.0
              else if (i % 2 == 0) (lcg(i) % 10) / 10.0
              else 5.0 + (lcg(i) % 10) / 10.0
      ("click", Timestamp.valueOf(base.plusDays(if (early) 0L else 10L).plusMinutes(i.toLong)), v)
    }
    val df = rows.toDF("event_type", "ts", "value")
    val r = Aggs.statKuiper(df, cutoff = "2024-01-16 00:00:00").collect()(0)
    val xs = rows.filter(_._2.before(Timestamp.valueOf("2024-01-16 00:00:00"))).map(_._3)
    val ys = rows.filterNot(_._2.before(Timestamp.valueOf("2024-01-16 00:00:00"))).map(_._3)
    val vocab = (xs ++ ys).distinct.sorted
    var c1 = 0L; var c2 = 0L; var dp = 0L; var dm = 0L
    val (n1, n2) = (xs.size.toLong, ys.size.toLong)
    for (v <- vocab) {
      c1 += xs.count(_ == v); c2 += ys.count(_ == v)
      dp = math.max(dp, c1 * n2 - c2 * n1); dm = math.max(dm, c2 * n1 - c1 * n2)
    }
    assert(r.getLong(1) == n1 && r.getLong(2) == n2)
    assert(r.getLong(3) == dp && r.getLong(4) == dm)
    assert(dp > 0 && dm > 0, "fixture must produce gaps in BOTH directions")
    assert(relEq(r.getDouble(5), (dp + dm).toDouble / (n1 * n2).toDouble))
  }

  test("stat_mood_scale: T and permutation-moment z from literal midranks") {
    // same center, different spread -> location tests quiet, Mood loud
    val rows = (0 until 400).flatMap { i =>
      val ts = Timestamp.valueOf(base.plusMinutes(i.toLong))
      Seq(("click", ts, 10.0 + ((lcg(i) % 21) - 10) / 10.0),       // tight
          ("view", ts, 10.0 + ((lcg(i * 3 + 1) % 81) - 40) / 10.0)) // wide
    }
    val df = rows.toDF("event_type", "ts", "value")
    val r = RankStats.statMoodScale(df).collect()(0)
    val xs = rows.filter(_._1 == "click").map(t => math.round(t._3 * 100))
    val ys = rows.filter(_._1 == "view").map(t => math.round(t._3 * 100))
    val all = xs ++ ys
    val n = all.size.toDouble
    // literal midranks over the pooled sorted sample
    val sorted = all.sorted
    val midrank = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> g.map(_._2 + 1).sum.toDouble / g.size }
    val aOf = (v: Long) => math.pow(midrank(v) - (n + 1) / 2.0, 2)
    val t = xs.map(aOf).sum
    val aAll = all.map(aOf)
    val m = xs.size.toDouble; val nb = ys.size.toDouble
    val e = m * aAll.sum / n
    val va = m * nb / (n - 1) * (aAll.map(x => x * x).sum / n - math.pow(aAll.sum / n, 2))
    val z = (t - e) / math.sqrt(va)
    assert(r.getLong(0) == xs.size.toLong && r.getLong(1) == ys.size.toLong)
    assert(relEq(r.getDouble(3) / 4.0, t, 1e-6), s"T: ${r.getDouble(3) / 4.0} vs $t")
    assert(relEq(r.getDouble(4), z, 1e-6), s"z: ${r.getDouble(4)} vs $z")
    assert(r.getDouble(4) < -3.0, "designed spread difference must be loud")
  }

  test("ts_dema_tema and ts_ppo match literal EMA folds") {
    val rows = (0 until 2000).map { i =>
      ("click", Timestamp.valueOf(base.plusHours(i / 40L).plusMinutes(i % 40L)), i.toLong)
    }
    val df = rows.toDF("event_type", "ts", "event_id")
    val counts = rows.groupBy(t => t._2.toLocalDateTime.withMinute(0)).view
      .mapValues(_.size.toDouble).toMap
    val hours = counts.keys.toSeq.sortBy(_.toString)
    val xs = hours.map(counts) // dense: every hour populated by construction
    // dema/tema: alpha = 2/17
    var (e1, e2, e3) = (xs.head, xs.head, xs.head)
    for (x <- xs.tail) {
      e1 = e1 + 2.0 / 17.0 * (x - e1)
      e2 = e2 + 2.0 / 17.0 * (e1 - e2)
      e3 = e3 + 2.0 / 17.0 * (e2 - e3)
    }
    val rd = Aggs.tsDemaTema(df).collect()(0)
    assert(rd.getLong(1) == xs.size.toLong)
    assert(relEq(rd.getDouble(2), e1) &&
      relEq(rd.getDouble(3), 2 * e1 - e2) &&
      relEq(rd.getDouble(4), 3 * e1 - 3 * e2 + e3))
    // ppo: 12/26 EMAs, signal = EMA9 of the ratio series
    var (f, sl, sg) = (xs.head, xs.head, 0.0)
    for (x <- xs.tail) {
      f = f + 2.0 / 13.0 * (x - f)
      sl = sl + 2.0 / 27.0 * (x - sl)
      val p = if (sl != 0.0) 100.0 * (f - sl) / sl else 0.0
      sg = sg + 2.0 / 10.0 * (p - sg)
    }
    val rp = Aggs.tsPpo(df).collect()(0)
    val ppo = if (sl != 0.0) 100.0 * (f - sl) / sl else 0.0
    assert(relEq(rp.getDouble(2), ppo) && relEq(rp.getDouble(3), sg) &&
      relEq(rp.getDouble(4), ppo - sg))
  }

  test("graph_avg_neighbor_degree: knn(k) on a literal star-plus-triangle graph") {
    // minute co-activity: {1,2,3} a triangle at t0; {1,4},{1,5} star arms
    val t0 = Timestamp.valueOf(base); val t1 = Timestamp.valueOf(base.plusMinutes(5))
    val t2 = Timestamp.valueOf(base.plusMinutes(10))
    val rows = Seq((1L, t0), (2L, t0), (3L, t0), (1L, t1), (4L, t1), (1L, t2), (5L, t2))
      .map { case (u, ts) => (u, ts, "click") }
    val df = rows.toDF("user_id", "ts", "event_type")
    val r = graft.ext.Sessions.graphAvgNeighborDegree(df).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    // degrees: 1->4, 2->2, 3->2, 4->1, 5->1
    // deg 1 nodes {4,5}: neighbor sums 4,4 -> knn = 8/(1*2) = 4
    assert(r(1L) == ((2L, 8L, 4.0)))
    // deg 2 nodes {2,3}: each neighbors {1,other} -> 4+2=6 each -> 12/(2*2)=3
    assert(r(2L) == ((2L, 12L, 3.0)))
    // deg 4 node {1}: neighbors 2,2,1,1 -> 6 -> 6/(4*1)=1.5
    assert(r(4L) == ((1L, 6L, 1.5)))
  }

  test("text_zipf_check: rank*freq integers from literal counts") {
    val docs = Seq(
      (1L, "wiki", "a a a a b b b c c d"),
      (2L, "wiki", "a a b c"),
      (3L, "web", "x y x")).toDF("doc_id", "source", "text")
    val r = graft.ext.Text.textZipfCheck(docs, k = 3).collect()
      .map(x => (x.getString(0), x.getLong(1)) -> (x.getString(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(("wiki", 1L)) == (("a", 6L, 6L)))
    assert(r(("wiki", 2L)) == (("b", 4L, 8L)))
    assert(r(("wiki", 3L)) == (("c", 3L, 9L)))
    assert(r(("web", 1L)) == (("x", 2L, 2L)))
    assert(r(("web", 2L)) == (("y", 1L, 2L)))
  }

  test("emb_top_component recovers a planted dominant direction") {
    // vectors = s * d + noise, d = (1, 1, 0, ..., 0)/sqrt(2): the Gram's
    // top eigenvector must align with d and carry most of the trace
    val dims = 64
    val rows = (0 until 300).map { i =>
      val s = 10.0 + (lcg(i) % 100) / 10.0
      val arr = Array.tabulate(dims) { j =>
        val noise = ((lcg(i * 131 + j) % 200) - 100) / 1000.0f
        if (j < 2) (s / math.sqrt(2.0)).toFloat + noise else noise
      }
      (i.toLong, arr)
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = graft.ext.Similarity.embTopComponent(df).collect()
    assert(out.length == dims)
    val v = out.sortBy(_.getLong(0)).map(_.getDouble(1))
    val nrm = math.sqrt(v.map(x => x * x).sum)
    val cos = (v(0) + v(1)) / math.sqrt(2.0) / nrm
    assert(math.abs(cos) > 0.999, s"alignment with planted direction: $cos")
    val share = out(0).getDouble(3)
    assert(share > 0.9 && share <= 1.0, s"planted direction carries the trace: $share")
    assert(out(0).getDouble(2) > 0.0)
  }
}
