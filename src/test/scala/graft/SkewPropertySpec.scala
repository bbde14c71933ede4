package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll
import graft.ops.Skew

/** ScalaCheck equivalence properties for the skew-mitigation operators:
  * salting must be a pure execution-strategy change — bit-identical
  * results to the unsalted plan on ARBITRARY key distributions (empty
  * inputs, single hot key, all-distinct keys, duplicate fact rows), not
  * just the oracle fixture's 5-type column. */
class SkewPropertySpec extends SparkSpec {
  import spark.implicits._

  private val checkParams = SCTest.Parameters.default.withMinSuccessfulTests(12)

  // key pools deliberately tiny so samples range from all-one-hot-key
  // (maximal skew) to all-distinct; values rounded to cents so decimal
  // accumulation is exact in both plans
  private val factRows: Gen[List[(String, Double)]] = for {
    pool <- Gen.chooseNum(1, 4).map(n => (0 until n).map(i => s"k$i"))
    n <- Gen.chooseNum(0, 60)
    rs <- Gen.listOfN(n, for {
      k <- Gen.oneOf(pool)
      v <- Gen.chooseNum(-1e4, 1e4).map(x => math.rint(x * 100) / 100)
    } yield (k, v))
  } yield rs

  test("property: saltedGroupSum equals plain groupBy on arbitrary distributions") {
    val prop = forAll(factRows) { rs =>
      val df = rs.toDF("key", "value")
      val salted = Skew.saltedGroupSum(df, "key", "value").collect()
        .map(r => (r.getAs[String]("key"), r.getAs[Double]("sum_value"), r.getAs[Long]("n")))
        .sortBy(_._1).toSeq
      val plain = df.groupBy(col("key"))
        .agg(sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getAs[String]("key"), r.getAs[Double]("sum_value"), r.getAs[Long]("n")))
        .sortBy(_._1).toSeq
      salted == plain
    }
    val res = SCTest.check(checkParams, prop)
    assert(res.passed, s"saltedGroupSum diverged from plain groupBy: $res")
  }

  test("property: banded quantiles equal the single-sort exact path on arbitrary data") {
    // negative values, duplicate values, single-row types, band-boundary
    // values (exact multiples of the width) — the cases the fixture's
    // benign distribution never exercises
    val eventRows: Gen[List[(Long, String, Double)]] = for {
      nTypes <- Gen.chooseNum(1, 3)
      n <- Gen.chooseNum(1, 80)
      rs <- Gen.listOfN(n, for {
        t <- Gen.chooseNum(0, nTypes - 1).map(i => s"t$i")
        v <- Gen.oneOf(
          Gen.chooseNum(-500.0, 500.0).map(x => math.rint(x * 4) / 4),
          Gen.chooseNum(-20, 20).map(_ * 25.0)) // exactly on band edges
      } yield (t, v))
    } yield rs.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
    val prop = forAll(eventRows) { rs =>
      val df = rs.toDF("event_id", "event_type", "value")
      def render(out: org.apache.spark.sql.DataFrame) =
        out.collect().map(_.toString).toSeq
      render(graft.ops.Aggs.aggQuantilesBanded(df)) ==
        render(graft.ops.Aggs.aggQuantiles(df))
    }
    val res = SCTest.check(checkParams, prop)
    assert(res.passed, s"banded quantiles diverged from the exact path: $res")
  }

  test("property: saltedJoin equals plain left join on arbitrary distributions") {
    val inputs = for {
      n <- Gen.chooseNum(0, 40)
      facts <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "c", "hot") // "hot" dominates some samples
        v <- Gen.chooseNum(0, 1000)
      } yield (k, v))
      dims <- Gen.someOf(List(("a", 1), ("b", 2), ("hot", 3), ("x", 9)))
    } yield (facts, dims.toList)
    val prop = forAll(inputs) { case (facts, dims) =>
      val f = facts.toDF("key", "v")
      val d = dims.toDF("key", "attr")
      def render(df: org.apache.spark.sql.DataFrame): Seq[(String, Int, String)] =
        df.select(col("key"), col("v"), col("attr")).collect()
          .map(r => (r.getAs[String]("key"), r.getAs[Int]("v"),
            String.valueOf(r.get(2)))) // multiset compare: sort, keep dupes
          .sorted.toSeq
      render(Skew.saltedJoin(f, d, "key")) ==
        render(f.join(d, Seq("key"), "left_outer"))
    }
    val res = SCTest.check(checkParams, prop)
    assert(res.passed, s"saltedJoin diverged from plain left join: $res")
  }
}
