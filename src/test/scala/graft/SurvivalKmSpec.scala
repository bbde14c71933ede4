package graft

import java.sql.Timestamp

/** Brute-force check of `events_survival_km`: literal Kaplan–Meier
  * enumeration (sorted durations, risk-set countdown, running product in
  * exact BigInt micro-units — the same S ← (S·(n−e)) div n recursion the
  * operator documents) over hand-built event streams with closed gaps,
  * censored tails, and duration ties between events and censorings.
  * Offsets are integer MINUTES so hour-floor boundaries are exact. */
class SurvivalKmSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000000000000L // micros

  /** (event_type, user, offsets-in-minutes) → event rows. */
  private def frame(streams: Seq[(String, Long, Seq[Long])]) = {
    val rows = for {
      ((et, u, offs), si) <- streams.zipWithIndex
      (o, i) <- offs.zipWithIndex
    } yield (si * 1000L + i, new Timestamp((base + o * 60000000L) / 1000L),
      u, et, 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Literal KM per class: durations in floor-hours, censored tail at the
    * global max ts, risk sets by countdown, BigInt ppt recursion. */
  private def brute(streams: Seq[(String, Long, Seq[Long])])
      : Map[(String, Long), (Long, Long, Long, Long)] = {
    val maxMin = streams.flatMap(_._3).max
    val durs = streams.flatMap { case (et, _, offs) =>
      val s = offs.sorted
      val closed = s.zip(s.tail).map { case (a, b) => (et, (b - a) / 60, false) }
      closed :+ ((et, (maxMin - s.last) / 60, true))
    }
    durs.groupBy(_._1).flatMap { case (et, ds) =>
      val byDur = ds.groupBy(_._2).toSeq.sortBy(_._1)
      var atRisk = ds.size.toLong
      var s = BigInt(1000000000000L)
      byDur.map { case (d, group) =>
        val e = group.count(!_._3).toLong
        val c = group.count(_._3).toLong
        val n = atRisk
        s = s * (n - e) / n
        atRisk -= e + c
        (et, d) -> (n, e, c, s.toLong)
      }
    }
  }

  test("KM survival matches literal enumeration incl. censoring and ties") {
    val streams = Seq(
      ("a", 1L, Seq(0L, 90L, 240L, 252L)),    // gaps 1h, 2h, 0h + censored 5h
      ("a", 2L, Seq(30L, 150L, 540L)),        // gaps 2h, 6h + censored 1h
      ("a", 3L, Seq(600L)),                   // single event: censored 0h
      ("b", 1L, Seq(0L, 180L, 360L, 600L)),   // 3h gaps + 4h + censored 0h
      ("b", 4L, Seq(60L, 240L))               // gap 3h + censored 6h
    )
    val got = ext.Sessions.eventsSurvivalKm(frame(streams)).collect()
    val want = brute(streams)
    assert(got.length == want.size, "row count")
    for (r <- got) {
      val key = (r.getAs[String]("event_type"), r.getAs[Long]("dur_h"))
      val (n, e, c, s) = want(key)
      assert(r.getAs[Long]("n_risk") == n, s"$key n_risk")
      assert(r.getAs[Long]("d_events") == e, s"$key d_events")
      assert(r.getAs[Long]("c_censored") == c, s"$key c_censored")
      assert(r.getAs[Long]("surv_ppt") == s, s"$key surv_ppt")
    }
  }

  test("KM survival is monotone non-increasing and starts at the full risk set") {
    val df = ext.Sessions.eventsSurvivalKm(
      frame(Seq(("a", 1L, Seq(0L, 120L, 420L)), ("a", 2L, Seq(60L, 180L, 210L)))))
      .collect()
    val ss = df.map(_.getAs[Long]("surv_ppt")).toSeq
    assert(ss == ss.sorted.reverse, "monotone")
    assert(df.head.getAs[Long]("n_risk") == 6L, "first risk set = all gaps")
  }
}
