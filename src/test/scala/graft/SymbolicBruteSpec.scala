package graft

import java.sql.Timestamp
import java.time.LocalDateTime
import org.apache.spark.sql.DataFrame
import graft.ops.Symbolic

/** Brute-force checks for the r10b symbolic-representation pair: PAA
  * segment occupancy/sums re-derived by literal integer arithmetic, and
  * SAX z/symbols recomputed by the textbook chain on a fixture with a
  * designed shape (a rising staircase must read ≈ "a..d" in order; a
  * flat class must hit the sigma = 0 -> 'b' convention). */
class SymbolicBruteSpec extends SparkSpec {
  import spark.implicits._

  private val base = LocalDateTime.of(2024, 6, 3, 0, 0, 0)
  private val nHours = 100 // not divisible by 16 — exercises n mod S

  // "click": rising staircase 1..100; "view": constant 7
  private def level(c: String, h: Int): Int =
    if (c == "click") h + 1 else 7

  private lazy val events: DataFrame = {
    val rows = for {
      c <- Seq("click", "view"); h <- 0 until nHours
      k <- 0 until level(c, h)
    } yield (c, Timestamp.valueOf(base.plusHours(h.toLong).plusSeconds(k.toLong)), k.toLong)
    rows.toDF("event_type", "ts", "event_id")
  }

  private def segOf(rn: Int): Long = ((rn - 1).toLong * 16) / nHours

  test("ts_paa: equal-occupancy segments, exact sums, means") {
    val got = Symbolic.tsPaa(events).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    for (c <- Seq("click", "view"); seg <- 0L until 16L) {
      val members = (1 to nHours).filter(rn => segOf(rn) == seg)
      val sum = members.map(rn => level(c, rn - 1).toLong).sum
      val r = got((c, seg))
      assert(r.getLong(2) == members.size.toLong, s"$c/$seg n_obs")
      assert(r.getLong(5) == sum, s"$c/$seg sum")
      assert(math.abs(r.getDouble(6) - sum.toDouble / members.size) < 1e-12)
    }
    // occupancy balance: segment sizes differ by at most 1
    val sizes = (0L until 16L).map(s => (1 to nHours).count(rn => segOf(rn) == s))
    assert(sizes.max - sizes.min <= 1)
  }

  test("ts_sax_symbols: textbook z chain; staircase reads a->d; flat reads all b") {
    val got = Symbolic.tsSaxSymbols(events).collect()
    val click = got.filter(_.getString(0) == "click").sortBy(_.getLong(1))
    val ys = (1 to nHours).map(_.toDouble)
    val mu = ys.sum / nHours
    val sigma = math.sqrt((nHours * ys.map(y => y * y).sum - math.pow(ys.sum, 2)) / (nHours.toDouble * nHours))
    for (r <- click) {
      val seg = r.getLong(1)
      val members = (1 to nHours).filter(rn => segOf(rn) == seg)
      val mean = members.map(_.toDouble).sum / members.size
      val z = (mean - mu) / sigma
      assert(math.abs(r.getDouble(4) - z) < 1e-9, s"seg $seg z")
      val sym = if (z < -0.6745) "a" else if (z < 0) "b" else if (z < 0.6745) "c" else "d"
      assert(r.getString(5) == sym, s"seg $seg symbol")
    }
    // the staircase word must be non-decreasing a..d and hit all 4 letters
    val word = click.map(_.getString(5)).mkString
    assert(word == word.split("").sorted.mkString, s"word $word must be sorted")
    assert(Set("a", "b", "c", "d").subsetOf(word.split("").toSet))
    // flat class: sigma = 0 -> null z, all 'b'
    val view = got.filter(_.getString(0) == "view")
    assert(view.forall(r => r.isNullAt(4) && r.getString(5) == "b"))
  }
}
