package graft

import java.sql.Timestamp
import java.time.{DayOfWeek, LocalDateTime}
import org.apache.spark.sql.DataFrame
import graft.ops.Association

/** Brute-force checks for the r10b association/dependence cells: each test
  * regenerates the statistic by literal enumeration (all-pairs dominance
  * for Cliff's delta, full midrank grids for Kendall's W, the textbook
  * rank-jump formula for Chatterjee's xi, the direct weighted-proportion
  * chain for Cochran-Armitage) on a deliberately lumpy deterministic
  * fixture (ties, zero-hours, weekend/weekday asymmetry) and compares the
  * operator's exact integer counts EXACTLY and its final doubles to 1e-12
  * relative. */
class AssociationBruteSpec extends SparkSpec {
  import spark.implicits._

  // one week starting Monday 2024-03-04; LCG-driven per-(class, hour)
  // multiplicities with deliberate ties and zero-hours
  private val base = LocalDateTime.of(2024, 3, 4, 0, 0, 0)
  private val classes = Seq("click", "purchase", "view")

  private def lcg(seed: Long): Long = (seed * 6364136223846793005L + 1442695040888963407L) >>> 33

  /** (class, hourOffset) -> event multiplicity (0..6, frequent ties). */
  private def multiplicity(c: String, h: Int): Int = {
    val s = lcg(c.hashCode.toLong * 1000003L + h * 7919L)
    val m = (s % 7).toInt
    if (m < 0) m + 7 else m
  }

  private val hours = 0 until (7 * 24) by 3 // 56 hours across the week

  private lazy val events: DataFrame = {
    val rows = for {
      c <- classes
      h <- hours
      k <- 0 until multiplicity(c, h)
    } yield (c, Timestamp.valueOf(base.plusHours(h).plusMinutes(k.toLong)), k.toLong)
    rows.toDF("event_type", "ts", "event_id")
  }

  private def hourlyCounts(c: String): Seq[(Int, Long)] =
    hours.map(h => h -> multiplicity(c, h).toLong).filter(_._2 > 0)

  private def relEq(a: Double, b: Double, tol: Double = 1e-12): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("stat_cliff_delta matches all-pairs dominance enumeration") {
    val got = Association.statCliffDelta(events).collect()
      .map(r => r.getString(0) -> r).toMap
    for (c <- classes) {
      val byHour = hourlyCounts(c)
      val (wd, we) = byHour.partition { case (h, _) =>
        base.plusHours(h.toLong).getDayOfWeek.getValue <= 5
      }
      val a = wd.map(_._2)
      val b = we.map(_._2)
      val gt = (for (x <- a; y <- b if x > y) yield 1L).sum
      val lt = (for (x <- a; y <- b if x < y) yield 1L).sum
      val r = got(c)
      assert(r.getLong(1) == a.size.toLong, s"$c n_wd")
      assert(r.getLong(2) == b.size.toLong, s"$c n_we")
      assert(r.getLong(3) == gt, s"$c n_gt")
      assert(r.getLong(4) == lt, s"$c n_lt")
      val delta = (gt - lt).toDouble / (a.size.toDouble * b.size.toDouble)
      assert(relEq(r.getDouble(5), delta), s"$c delta: ${r.getDouble(5)} vs $delta")
    }
  }

  test("stat_kendall_w matches full midrank-grid enumeration (and the Friedman relation)") {
    // densified grid: every (class, observed-hour) cell, zeros included
    val obsHours = hours.filter(h => classes.exists(multiplicity(_, h) > 0))
    val n = obsHours.size
    val k = classes.size
    val rankSums = scala.collection.mutable.Map(classes.map(_ -> 0.0): _*)
    for (h <- obsHours) {
      val vals = classes.map(c => c -> multiplicity(c, h).toLong)
      for ((c, v) <- vals) {
        val below = vals.count(_._2 < v)
        val tied = vals.count(_._2 == v)
        rankSums(c) += below + (tied + 1) / 2.0 // midrank
      }
    }
    val mean = n * (k + 1) / 2.0
    val s = classes.map(c => math.pow(rankSums(c) - mean, 2)).sum
    val w = 12.0 * s / (n.toDouble * n * k * (k * k - 1))
    val chi2 = n * (k - 1) * w
    val r = Association.statKendallW(events).collect()(0)
    assert(r.getLong(0) == k.toLong && r.getLong(1) == n.toLong)
    assert(relEq(r.getDouble(3), w), s"W: ${r.getDouble(3)} vs $w")
    assert(relEq(r.getDouble(4), chi2), s"chi2: ${r.getDouble(4)} vs $chi2")
  }

  test("stat_xi_corr matches the textbook tie-general rank-jump formula") {
    // paired hourly series over hours where ANY class fired
    val obsHours = hours.filter(h => classes.exists(multiplicity(_, h) > 0))
    val series = obsHours.map(h =>
      (multiplicity("click", h).toLong, multiplicity("purchase", h).toLong, h))
    val n = series.size
    val ys = series.map(_._2)
    def rOf(y: Long) = ys.count(_ <= y).toLong
    def lOf(y: Long) = ys.count(_ >= y).toLong
    val ordered = series.sortBy(t => (t._1, t._3)) // asc x, tie-break hour
    val sdr = ordered.sliding(2).map {
      case Seq(p, c) => math.abs(rOf(c._2) - rOf(p._2))
      case _         => 0L
    }.sum
    val den = ys.map(y => lOf(y) * (n - lOf(y))).sum
    val xi = 1.0 - n.toDouble * sdr.toDouble / (2.0 * den.toDouble)
    val r = Association.statXiCorr(events).collect()(0)
    assert(r.getLong(0) == n.toLong)
    assert(r.getLong(1) == sdr)
    assert(r.getLong(2) == 2L * den)
    assert(relEq(r.getDouble(3), xi), s"xi: ${r.getDouble(3)} vs $xi")
  }

  test("stat_xi_corr is high on a deterministic non-monotone dependence") {
    // y = (x % 8 - 4)^2: a V-shaped function Pearson/Kendall score ~0 on,
    // xi must score high (y IS a function of x) — the coefficient's point
    val rows = (0 until 240).flatMap { i =>
      val x = i % 48
      val y = { val m = x % 8 - 4; (m * m).toLong }
      Seq.fill(x + 1)(("click", Timestamp.valueOf(base.plusHours(i.toLong)), 0L)) ++
        Seq.fill(y.toInt + 1)(("purchase", Timestamp.valueOf(base.plusHours(i.toLong)), 0L))
    }
    val df = rows.toDF("event_type", "ts", "event_id")
    val xi = Association.statXiCorr(df).collect()(0).getDouble(3)
    assert(xi > 0.5, s"functional dependence should score high, got $xi")
  }

  test("stat_cochran_armitage matches the direct weighted-proportion chain") {
    // per hour-of-day: n = clicks + purchases, r = purchases
    val cells = (0 until 24).map { g =>
      val n = hours.filter(h => h % 24 == g).map(h =>
        multiplicity("click", h) + multiplicity("purchase", h)).sum.toLong
      val r = hours.filter(h => h % 24 == g).map(h =>
        multiplicity("purchase", h)).sum.toLong
      (g.toLong, n, r)
    }.filter(_._2 > 0)
    val nT = cells.map(_._2).sum
    val rT = cells.map(_._3).sum
    val swn = cells.map(c => c._1 * c._2).sum
    val swr = cells.map(c => c._1 * c._3).sum
    val sw2n = cells.map(c => c._1 * c._1 * c._2).sum
    val a = nT * swr - rT * swn
    val b = BigInt(rT) * (nT - rT) * (BigInt(nT) * sw2n - BigInt(swn) * swn)
    val z = a.toDouble * math.sqrt(nT.toDouble) / math.sqrt(b.toDouble)
    val r = Association.statCochranArmitage(events).collect()(0)
    assert(r.getLong(0) == nT && r.getLong(1) == rT)
    assert(r.getLong(2) == a)
    assert(relEq(r.getDouble(3), z, 1e-9), s"z: ${r.getDouble(3)} vs $z")
  }
}
