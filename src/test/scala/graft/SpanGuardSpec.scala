package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.{Aggs, Guards}

/** r10 (VERDICT r9 #5): the fold/bar tier's shared span budget.
  *  - `boundedSeries` / `boundedSpanLen` are passthrough under budget and
  *    raise loudly (operator name + fix in the message) past it;
  *  - the densified-grid operators trip the guard on a corrupt
  *    18th-century timestamp BEFORE materializing the multi-million-slot
  *    hour grid — the exact silent-executor-eater the budget closes;
  *  - a sane decade-ish span still folds normally (the budget cannot
  *    false-positive at any realistic contract size). */
class SpanGuardSpec extends SparkSpec {
  import spark.implicits._

  test("boundedSeries: passthrough under budget, loud past it") {
    val df = Seq((1L, Seq(1L, 2L, 3L))).toDF("k", "arr")
    val ok = df.select(Guards.boundedSeries(col("arr"), "test_op", 3L).as("a"))
      .collect()(0).getSeq[Long](0)
    assert(ok == Seq(1L, 2L, 3L))
    val e = intercept[Exception] {
      df.select(Guards.boundedSeries(col("arr"), "test_op", 2L)).collect()
    }
    assert(e.getMessage.contains("test_op") &&
      e.getMessage.contains("span budget"), e.getMessage)
  }

  test("boundedSpanLen: passthrough under budget, loud past it") {
    val df = Seq(Tuple1(100L)).toDF("len")
    assert(df.select(Guards.boundedSpanLen(col("len"), "test_op", 100L))
      .collect()(0).getLong(0) == 100L)
    val e = intercept[Exception] {
      df.select(Guards.boundedSpanLen(col("len"), "test_op", 99L)).collect()
    }
    assert(e.getMessage.contains("dense grid span"), e.getMessage)
  }

  private def corruptFrame = Seq(
    ("click", Timestamp.valueOf("1800-01-01 00:00:00"), 1.0),
    ("click", Timestamp.valueOf("2026-01-01 00:00:00"), 2.0)
  ).toDF("event_type", "ts", "value").withColumn("event_id", lit(1L))
    .withColumn("user_id", lit(1L))

  test("dense-grid fold ops trip loudly on a corrupt epoch-distant timestamp") {
    // 1800 → 2026 is ~1.98M hours — past the 1M budget; the guard must
    // fire without materializing the grid
    for ((name, q) <- Seq[(String, org.apache.spark.sql.DataFrame)](
      "ts_macd" -> Aggs.tsMacd(corruptFrame),
      "stat_holt_winters" -> Aggs.statHoltWinters(corruptFrame),
      "stat_page_hinkley" -> Aggs.statPageHinkley(corruptFrame),
      "ts_ewm_stats" -> Aggs.tsEwmStats(corruptFrame))) {
      val e = intercept[Exception] { q.collect() }
      assert(e.getMessage.contains(name) &&
        e.getMessage.contains("span budget"), s"$name: ${e.getMessage}")
    }
  }

  test("a sane multi-year span still folds normally") {
    val df = Seq(
      ("click", Timestamp.valueOf("2016-01-01 00:00:00"), 1.0),
      ("click", Timestamp.valueOf("2026-01-01 00:00:00"), 2.0)
    ).toDF("event_type", "ts", "value").withColumn("event_id", lit(1L))
      .withColumn("user_id", lit(1L))
    val row = Aggs.tsMacd(df).collect()(0)
    assert(row.getAs[Long]("n_hours") == 87673L) // decade of hourly slots
  }
}
