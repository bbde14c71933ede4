package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** r9 (verdict #6): the merge-based Kendall escape must be EQUAL to the
  * pair-join form — bit-for-bit on every output column — on the fixture
  * and on adversarial synthetic series (heavy ties, monotone, reversed,
  * constant). The unit inversion counter is additionally checked against
  * a brute-force O(n²) count on random arrays. */
class KendallMergeSpec extends SparkSpec {
  import spark.implicits._

  private def assertEqualForms(events: org.apache.spark.sql.DataFrame, tag: String): Unit = {
    val a = graft.ops.Inference.statKendallTau(events).collect()
    val b = graft.ops.Inference.statKendallTauMerge(events).collect()
    assert(a.length == 1 && b.length == 1, tag)
    assert(a(0) == b(0), s"$tag:\npair  ${a(0)}\nmerge ${b(0)}")
  }

  test("merge form equals pair-join form on the fixtures") {
    assertEqualForms(Tables.events(spark, "/root/testdata/sf0.001"), "sf0.001")
    assertEqualForms(Tables.events(spark, "/root/testdata/sf0.01"), "sf0.01")
  }

  test("merge form equals pair-join form on adversarial synthetic series") {
    val rnd = new scala.util.Random(9)
    def mkEvents(xs: Seq[Long], ys: Seq[Long]) = {
      // one synthetic hour per index; x clicks and y purchases in it
      val rows = xs.zip(ys).zipWithIndex.flatMap { case ((x, y), h) =>
        val ts = Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
          .plusSeconds(h * 3600L))
        Seq.fill(x.toInt)(("click", ts)) ++ Seq.fill(y.toInt)(("purchase", ts))
      }
      rows.toDF("event_type", "ts")
    }
    val n = 40
    val cases = Seq(
      "random"   -> (Seq.fill(n)(rnd.nextInt(6).toLong + 1), Seq.fill(n)(rnd.nextInt(6).toLong + 1)),
      "monotone" -> ((1L to n).toSeq, (1L to n).toSeq),
      "reversed" -> ((1L to n).toSeq, (1L to n).reverse.toSeq),
      "constant" -> (Seq.fill(n)(3L), Seq.fill(n)(rnd.nextInt(4).toLong + 1)),
      "tied"     -> (Seq.fill(n)(rnd.nextInt(2).toLong + 1), Seq.fill(n)(rnd.nextInt(2).toLong + 1)))
    cases.foreach { case (tag, (xs, ys)) => assertEqualForms(mkEvents(xs, ys), tag) }

    // sanity anchors: monotone => tau_b = 1, reversed => tau_b = -1
    val mono = graft.ops.Inference.statKendallTauMerge(mkEvents((1L to n).toSeq, (1L to n).toSeq)).collect()(0)
    assert(mono.getAs[Double]("tau_b") == 1.0)
    val rev = graft.ops.Inference.statKendallTauMerge(mkEvents((1L to n).toSeq, (1L to n).reverse.toSeq)).collect()(0)
    assert(rev.getAs[Double]("tau_b") == -1.0)
  }

  test("unit inversion counter matches brute force on random arrays") {
    val rnd = new scala.util.Random(17)
    (0 until 50).foreach { trial =>
      val n = rnd.nextInt(200)
      val a = Array.fill(n)(rnd.nextInt(20).toLong)
      val brute = (for (i <- 0 until n; j <- i + 1 until n if a(i) > a(j)) yield 1L).sum
      val (inv, sorted) = graft.ops.Inference.mergeCountInv(a)
      assert(inv == brute, s"trial $trial: $inv vs $brute on ${a.mkString(",")}")
      assert(sorted.toSeq == a.sorted.toSeq)
    }
  }
}
