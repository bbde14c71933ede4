package graft

import org.apache.spark.sql.DataFrame
import graft.ops.RankStats

/** Brute-force checks for the closed-form tie-range machinery inside
  * `stat_ansari_bradley` (triangular score sums over a tie range that may
  * straddle the midpoint — the case where avg(min(r, N+1−r)) is NOT
  * min(r̄, N+1−r̄)) and `stat_cramer_von_mises` (exact 4·Σ(R2−2i)² range
  * sums). Each case pools two samples with heavy deliberate ties, computes
  * the statistics by literal rank enumeration, and compares against the
  * operators (AB to its documented 1e-6-per-distinct-value micro-unit
  * quantization; CvM exactly to double round-off). */
class RankDispersionSpec extends SparkSpec {
  import spark.implicits._

  private def frame(a: Seq[Double], b: Seq[Double]): DataFrame =
    (a.map(("click", _)) ++ b.map(("view", _)))
      .toDF("event_type", "value")

  /** Averaged Ansari–Bradley scores by literal enumeration. */
  private def bruteAb(a: Seq[Double], b: Seq[Double]): (Double, Double, Double) = {
    val pooled = (a.map((_, 0)) ++ b.map((_, 1))).sortBy(_._1)
    val n = pooled.size
    // averaged score per tie group
    val scores = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && pooled(j)._1 == pooled(i)._1) j += 1
      val avg = (i until j).map(r0 => math.min(r0 + 1, n - r0)).sum.toDouble / (j - i)
      (i until j).foreach(scores(_) = avg)
      i = j
    }
    val ab = pooled.zipWithIndex.collect { case ((_, 0), k) => scores(k) }.sum
    val meanScore = scores.sum / n
    val mean = a.size * meanScore
    val popVar = scores.map(s => s * s).sum / n - meanScore * meanScore
    val varAb = a.size.toDouble * b.size / (n - 1) * popVar
    (ab, mean, varAb)
  }

  /** CvM T by literal midrank enumeration. */
  private def bruteCvm(a: Seq[Double], b: Seq[Double]): Double = {
    val pooled = (a.map((_, 0)) ++ b.map((_, 1))).sortBy(_._1)
    val n = pooled.size
    val rank = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && pooled(j)._1 == pooled(i)._1) j += 1
      val mid = (i + 1 + j).toDouble / 2.0
      (i until j).foreach(rank(_) = mid)
      i = j
    }
    val ra = pooled.zipWithIndex.collect { case ((_, 0), k) => rank(k) }
    val rb = pooled.zipWithIndex.collect { case ((_, 1), k) => rank(k) }
    val na = ra.size; val nb = rb.size
    val u = na * ra.zipWithIndex.map { case (r, idx) =>
      val d = r - (idx + 1); d * d }.sum +
      nb * rb.zipWithIndex.map { case (r, idx) =>
        val d = r - (idx + 1); d * d }.sum
    u / (n.toDouble * na * nb) - (4.0 * na * nb - 1.0) / (6.0 * n)
  }

  // deterministic pseudo-random samples with heavy ties (values snap to a
  // small lattice so tie groups straddle the midpoint often)
  private def cases: Seq[(Seq[Double], Seq[Double])] = {
    def gen(seed: Long, m: Int, spread: Int, shift: Double): Seq[Double] = {
      var x = seed
      (1 to m).map { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        ((math.floorMod(x >>> 16, spread.toLong)).toDouble + shift) / 4.0
      }
    }
    Seq(
      (gen(1, 40, 5, 0), gen(2, 35, 5, 0)),      // same lattice, heavy ties
      (gen(3, 25, 3, 0), gen(4, 50, 9, -3)),     // B wider spread
      (gen(5, 30, 1, 0), gen(6, 30, 1, 0)),      // ALL values tied
      (gen(7, 7, 4, 0), gen(8, 9, 4, 1)),        // tiny, shifted
      (Seq(1.0), Seq(1.0, 1.0, 2.0))             // degenerate sizes
    )
  }

  test("ansari-bradley matches brute-force averaged scores incl. straddling ties") {
    for (((a, b), idx) <- cases.zipWithIndex) {
      val row = RankStats.statAnsariBradley(frame(a, b)).collect()(0)
      val (ab, mean, varAb) = bruteAb(a, b)
      assert(row.getAs[Long]("n_a") == a.size, s"case $idx n_a")
      assert(math.abs(row.getAs[Double]("ab_stat") - ab) < 1e-3,
        s"case $idx ab: ${row.getAs[Double]("ab_stat")} vs $ab")
      assert(math.abs(row.getAs[Double]("mean_ab") - mean) < 1e-6,
        s"case $idx mean")
      assert(math.abs(row.getAs[Double]("var_ab") - varAb) < 1e-3,
        s"case $idx var: ${row.getAs[Double]("var_ab")} vs $varAb")
    }
  }

  test("cramer-von-mises matches brute-force midrank enumeration") {
    for (((a, b), idx) <- cases.zipWithIndex) {
      val row = RankStats.statCramerVonMises(frame(a, b)).collect()(0)
      val t = bruteCvm(a, b)
      assert(math.abs(row.getAs[Double]("t_stat") - t) < 1e-9,
        s"case $idx t: ${row.getAs[Double]("t_stat")} vs $t")
    }
  }

  test("hodges-lehmann matches the literal lower median of all pair differences") {
    for (((a, b), idx) <- cases.zipWithIndex) {
      val row = RankStats.statHodgesLehmann(frame(a, b)).collect()(0)
      val diffs = (for (x <- a; y <- b) yield
        math.round(x * 100) - math.round(y * 100)).sorted
      val want = diffs((diffs.size + 1) / 2 - 1) // lower median, 1-based ⌈W/2⌉
      assert(row.getAs[Long]("n_pairs") == diffs.size.toLong, s"case $idx pairs")
      assert(row.getAs[Long]("hl_cents") == want,
        s"case $idx hl: ${row.getAs[Long]("hl_cents")} vs $want")
    }
  }

  test("cucconi matches brute-force midrank enumeration") {
    for (((a, b), idx) <- cases.zipWithIndex) {
      val row = RankStats.statCucconi(frame(a, b)).collect()(0)
      // literal midranks of the pooled sample, class-B squared-rank sums
      val pooled = (a.map((_, 0)) ++ b.map((_, 1))).sortBy(_._1)
      val n = pooled.size
      val rank = new Array[Double](n)
      var i = 0
      while (i < n) {
        var j = i
        while (j < n && pooled(j)._1 == pooled(i)._1) j += 1
        val mid = (i + 1 + j).toDouble / 2.0
        (i until j).foreach(rank(_) = mid)
        i = j
      }
      val rb = pooled.zipWithIndex.collect { case ((_, 1), k) => rank(k) }
      val (na, nb) = (a.size, b.size)
      val s1 = rb.map(r => r * r).sum
      val s2 = rb.map(r => (n + 1 - r) * (n + 1 - r)).sum
      val den = math.sqrt(
        na.toDouble * nb * (n + 1) * (2 * n + 1) * (8 * n + 11) / 5.0)
      val u = (6.0 * s1 - nb.toDouble * (n + 1) * (2 * n + 1)) / den
      val v = (6.0 * s2 - nb.toDouble * (n + 1) * (2 * n + 1)) / den
      val rho = 2.0 * (n.toDouble * n - 4.0) /
        ((2.0 * n + 1.0) * (8.0 * n + 11.0)) - 1.0
      val c = (u * u + v * v - 2.0 * rho * u * v) / (2.0 * (1.0 - rho * rho))
      assert(math.abs(row.getAs[Double]("u") - u) < 1e-9, s"case $idx u")
      assert(math.abs(row.getAs[Double]("v") - v) < 1e-9, s"case $idx v")
      assert(math.abs(row.getAs[Double]("c_stat") - c) < 1e-9,
        s"case $idx c: ${row.getAs[Double]("c_stat")} vs $c")
    }
  }

  test("hodges-lehmann vocab budget fails loudly") {
    val (a, b) = cases.head
    val err = intercept[IllegalArgumentException] {
      RankStats.statHodgesLehmann(frame(a, b), maxVocab = 1L).collect()
    }
    assert(err.getMessage.contains("budget"))
  }
}
