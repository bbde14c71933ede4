package graft

import java.sql.Timestamp
import java.time.LocalDateTime
import org.apache.spark.sql.DataFrame
import graft.ops.Windows

/** Brute-force checks for the r10b window-exact TA additions
  * (`window_pivot_points`, `window_fractal`, `window_emv`,
  * `window_force_index`, `window_ultimate_osc`, `window_dpo`): rebuild
  * the class-hour/class-day bars in plain Scala from the same fixture and
  * recompute every indicator by its textbook formula, comparing integer
  * columns exactly and the final doubles to 1e-12 relative. The fixture
  * has multiple readings per hour (real h/l/cl spreads), flat bars, and
  * designed swing points so the fractal detector has strict extrema to
  * find. */
class TaWindowBruteSpec extends SparkSpec {
  import spark.implicits._

  private val base = LocalDateTime.of(2024, 5, 6, 0, 0, 0)
  private val classes = Seq("click", "view")
  private val nHours = 72

  private def lcg(seed: Long): Long = (seed * 6364136223846793005L + 1442695040888963407L) >>> 33

  /** Deterministic per-(class, hour) readings in cents: a slow sine-ish
    * swing plus LCG noise, 1-4 readings per hour. */
  private def readings(c: String, h: Int): Seq[Long] = {
    val swing = ((h % 24) - 12) * ((h % 24) - 12) * 5 // parabolic day cycle
    val n = 1 + (lcg(c.hashCode.toLong * 31 + h) % 4).toInt.abs
    (0 until n).map { k =>
      1000L + swing + (lcg(c.hashCode.toLong * 131 + h * 17 + k) % 200)
    }
  }

  private lazy val events: DataFrame = {
    val rows = for {
      c <- classes; h <- 0 until nHours
      (cents, k) <- readings(c, h).zipWithIndex
    } yield (c, Timestamp.valueOf(base.plusHours(h.toLong).plusMinutes(k.toLong)),
      cents / 100.0, (h * 100 + k).toLong)
    rows.toDF("event_type", "ts", "value", "event_id")
  }

  private case class Bar(h: Long, l: Long, cl: Long, vol: Long)
  private def bars(c: String): Seq[Bar] =
    (0 until nHours).map { h =>
      val r = readings(c, h)
      Bar(r.max, r.min, r.last, r.size.toLong)
    }

  private def relEq(a: Double, b: Double, tol: Double = 1e-12): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("window_pivot_points matches the prior-day OHLC level grid") {
    val got = Windows.windowPivotPoints(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    for (c <- classes) {
      // class-day bars
      val dayBars = (0 until nHours / 24).map { d =>
        val rs = (0 until 24).flatMap(hh => readings(c, d * 24 + hh))
        Bar(rs.max, rs.min, rs.last, rs.size.toLong)
      }
      for (d <- 1 until dayBars.size) {
        val p = dayBars(d - 1); val cur = dayBars(d)
        val p3 = p.h + p.l + p.cl
        val key = (c, f"2024-05-${6 + d}%02d 00:00:00")
        val r = got(key)
        assert(relEq(r.getDouble(3), p3.toDouble / 3.0 / 100.0), s"$key pivot")
        assert(relEq(r.getDouble(4), (2 * p3 - 3 * p.l).toDouble / 3.0 / 100.0), s"$key r1")
        assert(relEq(r.getDouble(5), (2 * p3 - 3 * p.h).toDouble / 3.0 / 100.0), s"$key s1")
        assert(relEq(r.getDouble(6), (p3 + 3 * (p.h - p.l)).toDouble / 3.0 / 100.0), s"$key r2")
        assert(relEq(r.getDouble(7), (p3 - 3 * (p.h - p.l)).toDouble / 3.0 / 100.0), s"$key s2")
        assert(r.getBoolean(8) == (3 * cur.cl > p3), s"$key above_pivot")
      }
    }
  }

  test("window_fractal finds exactly the strict 2-wing extrema") {
    val got = Windows.windowFractal(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    for (c <- classes) {
      val b = bars(c)
      val expected = (2 until nHours - 2).flatMap { i =>
        val hi = b(i).h > Seq(b(i - 2), b(i - 1), b(i + 1), b(i + 2)).map(_.h).max
        val lo = b(i).l < Seq(b(i - 2), b(i - 1), b(i + 1), b(i + 2)).map(_.l).min
        val hrS = base.plusHours(i.toLong)
        val s = f"${hrS.getYear}-${hrS.getMonthValue}%02d-${hrS.getDayOfMonth}%02d ${hrS.getHour}%02d:00:00"
        (if (hi) Seq((c, s, "high")) else Nil) ++ (if (lo) Seq((c, s, "low")) else Nil)
      }.toSet
      assert(expected.nonEmpty, s"$c fixture must contain fractals")
      assert(got.filter(_._1 == c) == expected, s"$c fractal set")
    }
  }

  test("window_emv matches the per-bar distance/box chain") {
    val got = Windows.windowEmv(events).collect()
      .filter(_.getString(0) == "click").sortBy(_.getString(1))
    val b = bars("click")
    assert(got.length == nHours - 1)
    for (i <- 1 until nHours) {
      val d2x = (b(i).h + b(i).l) - (b(i - 1).h + b(i - 1).l)
      val emv = (d2x.toDouble / 2.0) * ((b(i).h - b(i).l).toDouble / 100.0) / b(i).vol.toDouble
      val r = got(i - 1)
      assert(r.getLong(2) == d2x)
      assert(relEq(r.getDouble(4), emv), s"hour $i emv")
      assert(r.getBoolean(5) == (d2x > 0 && b(i).h > b(i).l))
    }
  }

  test("window_force_index matches the 13-bar integer sum of move x volume") {
    val got = Windows.windowForceIndex(events).collect()
      .filter(_.getString(0) == "click").sortBy(_.getString(1))
    val b = bars("click")
    val fi = (1 until nHours).map(i => (b(i).cl - b(i - 1).cl) * b(i).vol)
    // first complete 13-window ends at bar index 13
    assert(got.length == nHours - 13)
    for ((r, j) <- got.zipWithIndex) {
      val endBar = j + 13
      val s = (endBar - 12 to endBar).map(i => fi(i - 1)).sum
      assert(r.getLong(2) == fi(endBar - 1), s"fi1 at $endBar")
      assert(r.getLong(3) == s, s"fsum at $endBar")
      assert(relEq(r.getDouble(4), s.toDouble / 13.0 / 100.0))
    }
  }

  test("window_ultimate_osc matches the three-horizon weighted blend") {
    val got = Windows.windowUltimateOsc(events).collect()
      .filter(_.getString(0) == "click").sortBy(_.getString(1))
    val b = bars("click")
    val bp = (1 until nHours).map(i => b(i).cl - math.min(b(i).l, b(i - 1).cl))
    val tr = (1 until nHours).map(i => math.max(b(i).h, b(i - 1).cl) - math.min(b(i).l, b(i - 1).cl))
    assert(got.length == nHours - 28)
    for ((r, j) <- got.zipWithIndex) {
      val e = j + 27 // index into bp/tr
      def s(v: Seq[Long], k: Int) = (e - k + 1 to e).map(v(_)).sum
      val uo = 100.0 * (4.0 * s(bp, 7).toDouble / s(tr, 7).toDouble +
        2.0 * s(bp, 14).toDouble / s(tr, 14).toDouble +
        s(bp, 28).toDouble / s(tr, 28).toDouble) / 7.0
      assert(r.getLong(2) == s(bp, 28) && r.getLong(3) == s(tr, 28))
      assert(relEq(r.getDouble(4), uo), s"uo at $e")
    }
  }

  test("window_rvi matches the (1,2,2,1)-weighted vigor/range ratio") {
    val got = Windows.windowRvi(events).collect()
      .filter(_.getString(0) == "click").sortBy(_.getString(1))
    val b = bars("click")
    val co = (1 until nHours).map(i => b(i).cl - b(i - 1).cl) // co(i-1) ~ bar i
    val hl = (0 until nHours).map(i => b(i).h - b(i).l)
    def num6(t: Int) = co(t - 1) + 2 * co(t - 2) + 2 * co(t - 3) + co(t - 4)
    def den6(t: Int) = hl(t) + 2 * hl(t - 1) + 2 * hl(t - 2) + hl(t - 3)
    // num6 defined from bar 4; the 10-count completes at bar 13
    assert(got.length == nHours - 13)
    for ((r, j) <- got.zipWithIndex) {
      val t = j + 13
      val sn = (t - 9 to t).map(num6).sum
      val sd = (t - 9 to t).map(den6).sum
      assert(r.getLong(2) == sn && r.getLong(3) == sd, s"bar $t sums")
      if (sd > 0) assert(relEq(r.getDouble(4), sn.toDouble / sd.toDouble))
    }
  }

  test("window_awesome_osc matches the exact 34*s5 - 5*s34 midpoint spread") {
    val got = Windows.windowAwesomeOsc(events).collect()
      .filter(_.getString(0) == "click").sortBy(_.getString(1))
    val b = bars("click")
    val m2 = b.map(x => x.h + x.l)
    assert(got.length == nHours - 33)
    var prev = Option.empty[Long]
    for ((r, j) <- got.zipWithIndex) {
      val t = j + 33
      val s5 = (t - 4 to t).map(m2(_)).sum
      val s34 = (t - 33 to t).map(m2(_)).sum
      val ao340 = 34 * s5 - 5 * s34
      assert(r.getLong(2) == ao340, s"bar $t ao340")
      assert(relEq(r.getDouble(3), ao340.toDouble / 340.0 / 100.0))
      assert(r.getBoolean(4) == (ao340 > 0))
      prev match {
        case Some(p) => assert(r.getBoolean(5) == (ao340 > p))
        case None    => assert(r.isNullAt(5))
      }
      prev = Some(ao340)
    }
  }

  test("window_tsf matches the textbook rolling-OLS endpoint") {
    val got = Windows.windowTsf(events).collect()
      .filter(_.getString(0) == "click").sortBy(_.getString(1))
    val b = bars("click")
    assert(got.length == nHours - 19)
    for ((r, j) <- got.zipWithIndex) {
      val t = j + 19 // 0-based bar index; x = bar index + 1
      val pts = (t - 19 to t).map(i => ((i + 1).toDouble, b(i).cl.toDouble))
      val n = 20.0
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = (sy - slope * sx) / n
      val fit = a + slope * (t + 1).toDouble
      assert(relEq(r.getDouble(3), slope / 100.0, 1e-9), s"bar $t slope")
      assert(relEq(r.getDouble(4), fit / 100.0, 1e-9), s"bar $t tsf")
      assert(relEq(r.getDouble(5), (b(t).cl - fit) / 100.0, 1e-6), s"bar $t dev")
      assert(r.getBoolean(6) == (n * sxy - sx * sy > 0))
    }
  }

  test("window_dpo matches the n-scaled shifted detrend") {
    val got = Windows.windowDpo(events).collect()
      .filter(_.getString(0) == "click").sortBy(_.getString(1))
    val b = bars("click")
    assert(got.length == nHours - 19)
    for ((r, j) <- got.zipWithIndex) {
      val t = j + 19 // current bar index: the 20-window completes at 19
                     // (lag 11 is already non-null there)
      val s20 = (t - 19 to t).map(b(_).cl).sum
      val dpon = 20L * b(t - 11).cl - s20
      assert(r.getLong(2) == dpon, s"dpon at $t")
      assert(relEq(r.getDouble(3), dpon.toDouble / 20.0 / 100.0))
      assert(r.getBoolean(4) == (dpon > 0))
    }
  }
}
