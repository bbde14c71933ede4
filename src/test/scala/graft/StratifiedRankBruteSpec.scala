package graft

import java.sql.Timestamp
import java.time.LocalDateTime
import org.apache.spark.sql.DataFrame
import graft.ext.Sessions
import graft.ops.RankStats

/** Brute-force checks for the r10b Behrens-Fisher/stratified cells:
  * Fligner–Policello by literal placement enumeration, CMH by the direct
  * per-stratum chain folded in band order, audience overlap by literal
  * set arithmetic. Fixtures are deliberately asymmetric (weekend louder
  * AND more dispersed than weekday; conversion share varying by band) so
  * the statistics are far from degenerate. */
class StratifiedRankBruteSpec extends SparkSpec {
  import spark.implicits._

  private val base = LocalDateTime.of(2024, 3, 4, 0, 0, 0) // Monday

  private def lcg(s: Long): Long = (s * 6364136223846793005L + 1442695040888963407L) >>> 33

  /** hourly multiplicities over two weeks; weekend hours run hotter and
    * wilder for "click". */
  private def mult(c: String, h: Int): Int = {
    val dow = (h / 24) % 7 // 0 = Monday
    val weekend = dow >= 5
    val noise = (lcg(c.hashCode.toLong * 31 + h) % 5).toInt
    if (c == "click") (if (weekend) 8 + 3 * noise else 4 + noise)
    else 2 + noise % 3
  }

  private val hours = 0 until (14 * 24) by 2

  private lazy val events: DataFrame = {
    val rows = for {
      c <- Seq("click", "purchase"); h <- hours; k <- 0 until mult(c, h)
    } yield (c, Timestamp.valueOf(base.plusHours(h.toLong).plusMinutes(k.toLong)), k.toLong)
    rows.toDF("event_type", "ts", "event_id")
  }

  private def relEq(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("stat_fligner_policello matches literal placement enumeration") {
    val got = RankStats.statFlignerPolicello(events).collect()
      .map(r => r.getString(0) -> r).toMap
    for (c <- Seq("click", "purchase")) {
      val (we, wd) = hours.map(h => (h, mult(c, h).toLong)).filter(_._2 > 0)
        .partition { case (h, _) => (h / 24) % 7 >= 5 }
      val xs = wd.map(_._2); val ys = we.map(_._2)
      def plc(v: Long, other: Seq[Long]) = // placement with half-credit ties
        other.count(_ < v) + other.count(_ == v) / 2.0
      val p = xs.map(plc(_, ys)); val q = ys.map(plc(_, xs))
      val pBar = p.sum / p.size; val qBar = q.sum / q.size
      val v1 = p.map(x => (x - pBar) * (x - pBar)).sum
      val v2 = q.map(x => (x - qBar) * (x - qBar)).sum
      val u = (p.sum - q.sum) / (2.0 * math.sqrt(v1 + v2 + pBar * qBar))
      val r = got(c)
      assert(r.getLong(1) == xs.size.toLong && r.getLong(2) == ys.size.toLong)
      assert(r.getLong(3) == p.map(_ * 2).map(_.toLong).sum)
      assert(r.getLong(4) == q.map(_ * 2).map(_.toLong).sum)
      assert(relEq(r.getDouble(5), u), s"$c U: ${r.getDouble(5)} vs $u")
    }
  }

  test("stat_mantel_haenszel matches the band-ordered per-stratum chain") {
    // brute cells per band
    val cells = (0 until 4).map { band =>
      def cnt(weekend: Boolean, typ: String) = hours
        .filter(h => h % 24 / 6 == band && ((h / 24) % 7 >= 5) == weekend)
        .map(h => mult(typ, h)).sum.toDouble
      (cnt(true, "purchase"), cnt(true, "click"),
        cnt(false, "purchase"), cnt(false, "click"))
    }
    var se = 0.0; var sv = 0.0; var sad = 0.0; var sbc = 0.0; var nt = 0.0
    for ((a, b, c, d) <- cells) {
      val n = a + b + c + d
      se += a - (a + b) * (a + c) / n
      sv += ((a + b) * (c + d) * (a + c) * (b + d)) / (n * n * (n - 1))
      sad += a * d / n
      sbc += b * c / n
      nt += n
    }
    val chi2 = math.pow(math.max(math.abs(se) - 0.5, 0.0), 2) / sv
    val or = sad / sbc
    val r = RankStats.statMantelHaenszel(events).collect()(0)
    assert(r.getLong(0) == nt.toLong)
    assert(relEq(r.getDouble(1), se), s"sum a-E: ${r.getDouble(1)} vs $se")
    assert(relEq(r.getDouble(2), chi2), s"chi2: ${r.getDouble(2)} vs $chi2")
    assert(relEq(r.getDouble(3), or), s"OR: ${r.getDouble(3)} vs $or")
  }

  test("stat_mantel_haenszel skips n<=1 strata instead of NaN-ing the fold") {
    // bands 0-2 carry real 2x2 cells; band 3 holds EXACTLY ONE event,
    // whose variance term would divide by n-1 = 0 and NaN everything
    val rows = (for {
      band <- 0 until 3; k <- 0 until 12
      typ = if (k % 3 == 0) "purchase" else "click"
      dow = if (k % 2 == 0) 5 else 1 // weekend / weekday mix
    } yield (typ,
      Timestamp.valueOf(base.plusDays(dow.toLong).plusHours(band * 6L)
        .plusMinutes(k.toLong)), k.toLong)) :+
      (("purchase", Timestamp.valueOf(base.plusHours(19L)), 99L)) // band 3, n=1
    val df = rows.toDF("event_type", "ts", "event_id")
    val r = RankStats.statMantelHaenszel(df).collect()(0)
    // totals count only the SURVIVING strata (bands 0-2: 36 events)
    assert(r.getLong(0) == 36L, s"n_total: ${r.getLong(0)}")
    assert(!r.isNullAt(2) && !r.getDouble(2).isNaN, "chi2 must not NaN")
    assert(!r.isNullAt(3) && !r.getDouble(3).isNaN, "OR must not NaN")
  }

  test("stat_ad_twosample matches the literal Scholz-Stephens chain") {
    // value samples: click vs view with different spreads
    val rows = (0 until 400).flatMap { i =>
      val ts = Timestamp.valueOf(base.plusMinutes(i.toLong))
      val click = ("click", ts, 10.0 + (lcg(i.toLong * 7) % 300).toInt / 100.0)
      val view = ("view", ts, 10.0 + (lcg(i.toLong * 13 + 1) % 900).toInt / 100.0)
      Seq(click, view)
    }
    val df = rows.toDF("event_type", "ts", "value")
    val r = RankStats.statAdTwosample(df).collect()(0)
    // brute: integer cents, pooled distinct values ascending
    val xs = rows.filter(_._1 == "click").map(t => math.round(t._3 * 100))
    val ys = rows.filter(_._1 == "view").map(t => math.round(t._3 * 100))
    val m = xs.size.toLong; val n = ys.size.toLong; val nt = m + n
    val vocab = (xs ++ ys).distinct.sorted
    var maCum = 0L; var bCum = 0L; var s = 0.0
    for (v <- vocab) {
      val ca = xs.count(_ == v).toLong; val cb = ys.count(_ == v).toLong
      maCum += ca; bCum += ca + cb
      if (bCum < nt) {
        val d = nt * maCum - m * bCum
        s += (ca + cb).toDouble * (d.toDouble * d.toDouble) /
          (bCum.toDouble * (nt.toDouble - bCum.toDouble))
      }
    }
    val a2 = (1.0 / nt) * (1.0 / m + 1.0 / n) * s
    assert(r.getLong(0) == m && r.getLong(1) == n)
    assert(r.getLong(2) == vocab.size.toLong)
    assert(relEq(r.getDouble(3), a2), s"A2: ${r.getDouble(3)} vs $a2")
    // the wider-spread view sample must push A2 far above the null mean 1
    assert(r.getDouble(3) > 2.0, s"designed spread difference must reject: $a2")
  }

  test("events_audience_overlap matches literal set arithmetic") {
    // overlapping but distinct audiences by construction
    val rows = (0L until 100L).flatMap { u =>
      val ts = Timestamp.valueOf(base.plusMinutes(u))
      Seq(
        if (u % 2 == 0) Some(("click", ts, u)) else None,
        if (u % 3 == 0) Some(("view", ts, u)) else None,
        if (u % 5 == 0) Some(("purchase", ts, u)) else None).flatten
    }
    val df = rows.toDF("event_type", "ts", "user_id")
    val got = Sessions.eventsAudienceOverlap(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap // (a, b)
    def users(m: Long) = (0L until 100L).filter(_ % m == 0).toSet
    val sets = Map("click" -> users(2), "view" -> users(3), "purchase" -> users(5))
    for (Seq(a, b) <- sets.keys.toSeq.sorted.combinations(2)) {
      val r = got((a, b))
      val inter = (sets(a) & sets(b)).size.toLong
      val uni = (sets(a) | sets(b)).size.toLong
      assert(r.getLong(2) == sets(a).size.toLong && r.getLong(3) == sets(b).size.toLong)
      assert(r.getLong(4) == inter)
      assert(relEq(r.getDouble(5), inter.toDouble / uni, 1e-12))
    }
  }
}
