package graft

import java.sql.Timestamp
import java.time.LocalDateTime
import org.apache.spark.sql.DataFrame
import graft.ext.{Sampling, Sessions, Similarity, Text}

/** Brute-force + designed-fixture checks for the r10b pipeline batch:
  * resource-allocation link prediction (literal 1/deg enumeration),
  * BFS hop census (hand-built graph with a known layer structure and an
  * unreachable component), k-fold assignment (recomputed md5 buckets),
  * temporal split with embargo (rows placed AT the boundary arithmetic),
  * OCR-garbage signals (crafted failure shapes), segmented TTR (known
  * type counts), and MIPS top-k (literal dot products + the reduction's
  * norm-invariance witness). */
class PipelineR10bSpec extends SparkSpec {
  import spark.implicits._

  private val base = LocalDateTime.of(2024, 4, 1, 0, 0, 0)
  private def ts(min: Int) = Timestamp.valueOf(base.plusMinutes(min.toLong))

  /** events fixture building an exact co-activity graph:
    * minute-coactive pairs {1-2, 2-3, 3-4, 5-6} + a triangle {7,8,9}. */
  private lazy val graphEvents: DataFrame = Seq(
    (1L, ts(0)), (2L, ts(0)),
    (2L, ts(1)), (3L, ts(1)),
    (3L, ts(2)), (4L, ts(2)),
    (5L, ts(3)), (6L, ts(3)),
    (7L, ts(4)), (8L, ts(4)),
    (8L, ts(5)), (9L, ts(5)),
    (7L, ts(6)), (9L, ts(6))
  ).toDF("user_id", "ts").withColumn("event_type",
    org.apache.spark.sql.functions.lit("click"))

  test("graph_resource_alloc matches literal 1/deg wedge enumeration") {
    // graph edges: 1-2,2-3,3-4,5-6,7-8,8-9,7-9; degrees: 1:1 2:2 3:2 4:1
    // 5:1 6:1 7:2 8:2 9:2. Non-edge pairs with common neighbors:
    //  (1,3) via 2 (deg 2) -> 1/2 ; (2,4) via 3 (deg 2) -> 1/2
    //  (1,4)? no common. triangle pairs are all edges -> excluded.
    val rows = Sessions.graphResourceAlloc(graphEvents).collect()
    val scored = rows.map(r => ((r.getLong(1), r.getLong(2)), (r.getLong(3), r.getDouble(4)))).toMap
    assert(scored.keySet == Set((1L, 3L), (2L, 4L)), s"got ${scored.keySet}")
    for (((_, _), (common, ra)) <- scored) {
      assert(common == 1L)
      assert(math.abs(ra - 0.5) < 1e-12, s"ra $ra")
    }
    // rank order: equal scores tie-break by (a, b)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows(0).getLong(1) == 1L && rows(1).getLong(1) == 2L)
  }

  test("graph_hop_histogram: layers from the hub, unreachable bucketed at -1") {
    // hub = max degree, ties by id -> user 2 (deg 2, smallest id among
    // the deg-2 nodes). Layers: hop0={2}, hop1={1,3}, hop2={4};
    // unreachable {5,6,7,8,9} -> 5 rows at hop -1.
    val got = Sessions.graphHopHistogram(graphEvents).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(-1L -> 5L, 0L -> 1L, 1L -> 2L, 2L -> 1L), s"got $got")
  }

  test("sample_kfold: md5-bucket assignment recomputed, folds partition the corpus") {
    val docs = (0L until 200L).map(i => (i, s"text $i", "en", "web", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Sampling.sampleKfold(docs).collect()
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16) % 100 % 5
    }
    val expected = (0L until 200L).groupBy(bucket).view.mapValues(_.size.toLong).toMap
    assert(got.map(r => r.getLong(0) -> r.getLong(1)).toMap == expected)
    assert(got.map(_.getLong(1)).sum == 200L)
    // exact ppm floor
    for (r <- got)
      assert(r.getLong(4) == r.getLong(1) * 1000000L / 200L)
  }

  test("sample_group_kfold: md5(source) assignment keeps groups whole") {
    val docs = (0L until 300L).map(i => (i, s"text $i", "en", s"src${i % 23}", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Sampling.sampleGroupKfold(docs).collect()
    def bucket(src: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(src.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16) % 100 % 5
    }
    val bySrc = (0L until 300L).groupBy(i => s"src${i % 23}")
    val expected = bySrc.groupBy { case (s, _) => bucket(s) }
      .map { case (f, m) => f -> (m.values.map(_.size).sum.toLong, m.size.toLong) }
    assert(got.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap == expected)
    assert(got.map(_.getLong(1)).sum == 300L)
  }

  test("graph_degree_histogram matches literal log2 buckets") {
    val got = Sessions.graphDegreeHistogram(graphEvents).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // degrees: 1:1 2:2 3:2 4:1 5:1 6:1 7:2 8:2 9:2 -> deg 1 x4 (bucket 0),
    // deg 2 x5 (bucket 1)
    assert(got == Map(0L -> (4L, 1L, 1L), 1L -> (5L, 2L, 2L)), s"got $got")
  }

  test("sample_temporal_split: boundary and embargo arithmetic lands rows exactly") {
    // span 0..100 h; cut80 = 80 h, cut90 = 90 h, embargo 1 h.
    // hours: 0 (train), 78 (train: < 79), 79.5 (embargo), 80 (valid),
    // 89.5 (embargo: [89, 90) is the strip), 90 (test), 100 (test)
    def at(minutes: Long) = Timestamp.valueOf(base.plusMinutes(minutes))
    val ev = Seq(
      at(0), at(78 * 60), at(79 * 60 + 30), at(80 * 60),
      at(89 * 60 + 30), at(90 * 60), at(100 * 60)
    ).map(t => (t, 1L)).toDF("ts", "event_id")
    val got = Sampling.sampleTemporalSplit(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("train" -> 2L, "embargo" -> 2L, "valid" -> 1L, "test" -> 2L),
      s"got $got")
  }

  test("text_ocr_garbage: crafted failure shapes trip exactly their signal") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away", "en", "web"),
      (2L, "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) ____", "en", "web"),
      (3L, "x7k2q a8b9c d3e4f g5h6i j7k8l m9n0p q1r2s t3u4v", "en", "web"),
      (4L, "a " + ("supercalifragilistic" + "expialidocious") + " b", "en", "web"),
      (5L, "bcdfg hjklm npqrst vwxz bcdf hjkl the the the the", "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
    val got = Text.textOcrGarbage(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!got(1L).getBoolean(6), "clean text must not flag")
    assert(got(2L).getBoolean(6) && got(2L).getLong(2) > 100000, "symbol soup")
    assert(got(3L).getBoolean(6) && got(3L).getLong(3) > 200000, "digit-letter shrapnel")
    assert(got(4L).getBoolean(6) && got(4L).getLong(4) > 100000, "runaway token")
    assert(got(5L).getBoolean(6) && got(5L).getLong(5) > 300000, "consonant clusters")
  }

  test("text_ttr_segmented: known type counts per 50-token slice; short docs excluded") {
    // doc 1: 100 tokens = tokens "t0..t49" twice -> seg1 has 50 distinct,
    // seg2 has 50 distinct -> sttr = 1.0 (ppm 1000000)
    // doc 2: "a" * 100 -> both segments 1 type -> ppm = 2*1e6/100 = 20000
    // doc 3: 49 tokens -> excluded
    val d1 = ((0 until 50) ++ (0 until 50)).map(i => s"t$i").mkString(" ")
    val d2 = Seq.fill(100)("a").mkString(" ")
    val d3 = (0 until 49).map(i => s"u$i").mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val got = Text.textTtrSegmented(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L).getLong(2) == 2L && got(1L).getLong(3) == 100L &&
      got(1L).getLong(4) == 1000000L)
    assert(got(2L).getLong(3) == 2L && got(2L).getLong(4) == 20000L)
  }

  test("sim_search_mips matches literal inner products; reduction witness holds") {
    val vecs = (0L until 30L).map { i =>
      (i, Array.tabulate(8)(j => ((i * 7 + j * 3) % 11 - 5).toFloat / 4f))
    }
    val df = vecs.toDF("vec_id", "embedding")
      .withColumn("label", org.apache.spark.sql.functions.lit(0))
    val got = Similarity.simSearchMips(df, nQueries = 3, k = 5).collect()
    val dv = vecs.map { case (i, a) => i -> a.map(_.toDouble) }.toMap
    def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map(p => p._1 * p._2).sum
    val m2 = dv.values.map(v => dot(v, v)).max
    for (q <- 0L until 3L) {
      val expected = dv.keys.filter(_ != q).toSeq
        .map(c => (c, dot(dv(q), dv(c))))
        .sortBy { case (c, d) => (-d, c) }.take(5)
      val rows = got.filter(_.getLong(0) == q).sortBy(_.getLong(1))
      assert(rows.map(_.getLong(2)).toSeq == expected.map(_._1), s"q$q ids")
      for ((r, (c, d)) <- rows.zip(expected)) {
        assert(math.abs(r.getDouble(3) - d) < 1e-9, s"q$q dot vs $d")
        val aug = r.getDouble(4)
        assert(aug >= 0 && math.abs(aug * aug + dot(dv(c), dv(c)) - m2) < 1e-9,
          s"q$q aug witness")
      }
    }
  }
}
