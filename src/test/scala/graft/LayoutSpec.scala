package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Storage-layout proofs: partition pruning actually prunes, bucketed
  * joins actually skip the shuffle. */
class LayoutSpec extends SparkSpec {

  test("day-partitioned write prunes partitions on a day predicate") {
    val dir = Files.createTempDirectory("graft_layout").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    Layout.writeTimePartitioned(events, s"$dir/events", "ts")
    val back = Layout.readTimePartitioned(spark, s"$dir/events")
    val oneDay = back.filter(col("ds") === "2024-01-05")
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ds"))
    // pruned scan reads only that day's rows
    val expected = events.filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-05").count()
    assert(oneDay.count() == expected && expected > 0)
  }

  test("co-bucketed self-join on the bucket key plans without a shuffle") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    Layout.writeBucketed(events.select(col("event_id"), col("user_id"), col("value")),
      "events_bucketed", "user_id", buckets = 8)
    val t = spark.table("events_bucketed")
    val agg = t.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange hashpartitioning"),
      s"bucketed aggregation should not shuffle:\n$aggPlan")
    val joined = t.as("a").join(t.as("b"), "user_id")
    val joinPlan = joined.queryExecution.executedPlan.toString
    assert(!joinPlan.contains("Exchange hashpartitioning"),
      s"co-bucketed join should not shuffle:\n$joinPlan")
  }
}
