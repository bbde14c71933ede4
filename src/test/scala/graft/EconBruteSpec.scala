package graft

import java.sql.Timestamp
import java.time.LocalDateTime
import org.apache.spark.sql.DataFrame
import graft.ops.Inference

/** Brute-force checks for the r10b econometric cells (`stat_chow_test`,
  * `stat_goldfeld_quandt`, `stat_kpss`): each statistic is recomputed by
  * the textbook centered-moment formulas in plain doubles on a
  * deterministic fixture with a DELIBERATE structural break, variance
  * growth, and a trending (non-stationary) class, and compared to 1e-9
  * relative. The fixture also pins the qualitative verdicts: the broken
  * class must trip Chow, the fanning class must push GQ's F ≫ 1, the
  * trending class must fail KPSS while the flat class passes. */
class EconBruteSpec extends SparkSpec {
  import spark.implicits._

  private val base = LocalDateTime.of(2024, 3, 4, 0, 0, 0)

  // deterministic per-class hourly series, 120 observed hours each:
  //  - "click": flat noise (stationary, no break, homoskedastic)
  //  - "purchase": level jump at hour 60 (Chow must fire)
  //  - "view": strong linear trend (KPSS must reject stationarity)
  private def level(c: String, h: Int): Int = {
    val s = ((c.hashCode.toLong * 2654435761L + h * 40503L) >>> 16) % 5
    val noise = s.toInt
    c match {
      case "click"    => 10 + noise
      case "purchase" => (if (h < 60) 8 else 40) + noise
      case "view"     => 5 + h / 2 + (noise * (1 + h / 30)) // trend + fanning
      case _          => 1
    }
  }

  private val hours = 0 until 120
  private val classes = Seq("click", "purchase", "view")

  private lazy val events: DataFrame = {
    val rows = for {
      c <- classes; h <- hours; k <- 0 until level(c, h)
    } yield (c, Timestamp.valueOf(base.plusHours(h.toLong).plusSeconds(k.toLong)), k.toLong)
    rows.toDF("event_type", "ts", "event_id")
  }

  private def series(c: String): Seq[(Double, Double)] =
    hours.map(h => (h.toDouble, level(c, h).toDouble))

  private def sse(pts: Seq[(Double, Double)]): Double = {
    val n = pts.size.toDouble
    val xb = pts.map(_._1).sum / n
    val yb = pts.map(_._2).sum / n
    val sxx = pts.map(p => (p._1 - xb) * (p._1 - xb)).sum
    val sxy = pts.map(p => (p._1 - xb) * (p._2 - yb)).sum
    val syy = pts.map(p => (p._2 - yb) * (p._2 - yb)).sum
    syy - sxy * sxy / sxx
  }

  private def relEq(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("stat_chow_test matches the textbook split-F and fires on the level jump") {
    val got = Inference.statChowTest(events).collect()
      .map(r => r.getString(0) -> r).toMap
    for (c <- classes) {
      val pts = series(c)
      val n = pts.size
      val half = n / 2
      val (s1, s2) = pts.splitAt(half)
      val f = ((sse(pts) - sse(s1) - sse(s2)) / 2.0) /
        ((sse(s1) + sse(s2)) / (n - 4.0))
      val r = got(c)
      assert(r.getLong(1) == n.toLong, s"$c n_hours")
      assert(r.getLong(2) == half.toLong && r.getLong(3) == (n - half).toLong)
      assert(relEq(r.getDouble(4), f), s"$c F: ${r.getDouble(4)} vs $f")
    }
    assert(got("purchase").getLong(5) == 1L, "level jump must trip Chow")
    assert(got("click").getLong(5) == 0L, "flat class must not trip Chow")
  }

  test("stat_goldfeld_quandt matches the tail-segment variance ratio and flags fanning") {
    val got = Inference.statGoldfeldQuandt(events).collect()
      .map(r => r.getString(0) -> r).toMap
    for (c <- classes) {
      val pts = series(c)
      val m = pts.size * 2 / 5
      val lo = pts.take(m)
      val hi = pts.takeRight(m)
      val f = (sse(hi) / (m - 2.0)) / (sse(lo) / (m - 2.0))
      val r = got(c)
      assert(r.getLong(1) == m.toLong && r.getLong(2) == m.toLong)
      assert(relEq(r.getDouble(3), f), s"$c GQ F: ${r.getDouble(3)} vs $f")
    }
    assert(got("view").getDouble(3) > 3.0, "fanning class must push GQ F >> 1")
    assert(got("click").getDouble(3) < 3.0, "flat class must not")
  }

  test("stat_kpss matches the Bartlett lag-4 eta; trend rejects, flat passes") {
    val got = Inference.statKpss(events).collect()
      .map(r => r.getString(0) -> r).toMap
    for (c <- classes) {
      val ys = series(c).map(_._2)
      val n = ys.size
      val mean = ys.sum / n
      val e = ys.map(_ - mean)
      val s = e.scanLeft(0.0)(_ + _).tail
      val num = s.map(v => v * v).sum / (n.toDouble * n)
      val g = (0 to 4).map(l => (0 until n - l).map(t => e(t + l) * e(t)).sum)
      val lrv = (g(0) + 2.0 * (1 to 4).map(l => (1.0 - l / 5.0) * g(l)).sum) / n
      val eta = num / lrv
      val r = got(c)
      assert(r.getLong(1) == n.toLong)
      assert(relEq(r.getDouble(2), eta, 1e-9), s"$c eta: ${r.getDouble(2)} vs $eta")
    }
    assert(got("view").getLong(3) == 0L, "trending class must reject level stationarity")
    assert(got("click").getLong(3) == 1L, "flat class must pass")
  }
}
