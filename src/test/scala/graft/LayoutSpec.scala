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

  test("joining on the partition key injects a dynamic partition pruning filter") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dpp").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    Layout.writeTimePartitioned(events, s"$dir/events", "ts")
    val back = Layout.readTimePartitioned(spark, s"$dir/events")
    // a filtered dim joined on ds: Spark must prune fact partitions at
    // RUNTIME from the dim's surviving keys (static pruning can't see
    // them). The dim must be a real source with a surviving Filter — a
    // local Seq constant-folds into a LocalTableScan and DPP's
    // selective-predicate heuristic never fires.
    Seq("2024-01-05", "2024-01-06", "2024-01-07").toDF("ds_wanted")
      .write.parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
      .filter(col("ds_wanted") =!= "2024-01-07")
    val joined = back.join(dim, col("ds") === col("ds_wanted"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic partition pruning subquery in the scan:\n$plan")
    val expected = events.filter(
      date_format(col("ts"), "yyyy-MM-dd").isin("2024-01-05", "2024-01-06")).count()
    assert(joined.count() == expected && expected > 0)
  }

  test("binaryFile source reads opaque blobs with path/length metadata") {
    val dir = Files.createTempDirectory("graft_bin").toString
    val payload = Array[Byte](1, 2, 3, 4, 5)
    Files.write(java.nio.file.Paths.get(s"$dir/a.bin"), payload)
    Files.write(java.nio.file.Paths.get(s"$dir/b.bin"), Array[Byte](9, 8))
    // the ingestion path for multimodal corpora: files land as (path,
    // length, content) rows, the ext.Multimodal operators take over after
    val df = spark.read.format("binaryFile").load(dir)
    val rows = df.select(col("path"), col("length"), col("content"))
      .orderBy("path").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("length") == 5L &&
      rows(0).getAs[Array[Byte]]("content").toSeq == payload.toSeq)
  }

  test("ORC round-trip is value-exact and pushes filters into the ORC scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    events.write.orc(s"$dir/events")
    val back = spark.read.orc(s"$dir/events")
    assert(back.orderBy("event_id").collect().toSeq ==
      events.orderBy("event_id").collect().toSeq,
      "ORC round-trip must be value-exact")
    val filtered = back.filter(col("event_type") === "purchase")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("event_type"),
      s"predicate must reach the ORC scan:\n$plan")
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

  test("compaction collapses micro-batch files and preserves every row") {
    import scala.jdk.CollectionConverters._
    def parquetFiles(dir: String): Map[String, Int] =
      Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .toSeq.groupBy(_.getParent.getFileName.toString)
        .map { case (ds, fs) => ds -> fs.length }
    val dir = Files.createTempDirectory("graft_compact").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    // simulate a micro-batched ingest: 16 appends of tiny slices
    (0 until 16).foreach { i =>
      Layout.writeTimePartitioned(
        events.filter(pmod(col("event_id"), lit(16)) === i), s"$dir/src", "ts")
    }
    val srcFiles = parquetFiles(s"$dir/src")
    assert(srcFiles.values.max >= 16, s"expected micro-batch file litter: $srcFiles")
    Layout.compactTimePartitioned(spark, s"$dir/src", s"$dir/dst")
    val dstFiles = parquetFiles(s"$dir/dst")
    // every day collapses to ~1 file at the (huge) default advisory size
    assert(dstFiles.values.max <= 2, s"compaction left small files: $dstFiles")
    // and the rewrite is lossless
    val a = spark.read.parquet(s"$dir/src").drop("ds").orderBy("event_id").collect().toSeq
    val b = spark.read.parquet(s"$dir/dst").drop("ds").orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("compaction splits an oversized partition at the advisory size") {
    val dir = Files.createTempDirectory("graft_compact_split").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    // micro-batched source: every day's rows spread over 8 files — AQE's
    // rebalance skew-split divides at MAPPER boundaries, so a day can
    // only split if its rows arrive from several map tasks
    (0 until 8).foreach { i =>
      Layout.writeTimePartitioned(
        events.filter(pmod(col("event_id"), lit(8)) === i), s"$dir/src", "ts")
    }
    // fine-grained scan (one mapper per small file) + ~1 KB advisory
    // target: each day is a few KB of shuffle bytes and must split
    val prev = (spark.conf.get("spark.sql.files.maxPartitionBytes"),
      spark.conf.get("spark.sql.files.openCostInBytes"))
    spark.conf.set("spark.sql.files.maxPartitionBytes", (8L << 10).toString)
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try Layout.compactTimePartitioned(spark, s"$dir/src", s"$dir/dst",
      advisoryBytes = 1L << 10)
    finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prev._1)
      spark.conf.set("spark.sql.files.openCostInBytes", prev._2)
    }
    import scala.jdk.CollectionConverters._
    val perDay = Files.walk(java.nio.file.Paths.get(s"$dir/dst")).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .toSeq.groupBy(_.getParent.getFileName.toString).map(_._2.length)
    assert(perDay.exists(_ >= 2),
      s"skew split should emit multiple files for a hot day: $perDay")
    assert(spark.read.parquet(s"$dir/dst").count() == events.count())
  }
}
