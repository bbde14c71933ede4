package graft

import graft.functions.{KmvBuffer, KmvDistinct}
import graft.functions.KmvDistinct.kmv_distinct
import org.apache.spark.sql.functions._

/** The native KMV distinct aggregate: buffer laws, estimate equivalence
  * with the query-spelled sketch it replaces, the partial-aggregation
  * plan shape that is its reason to exist, and the SQL registration. */
class KmvSketchSpec extends SparkSpec {

  test("buffer keeps the k smallest distinct hashes under any insertion order") {
    val entries = Seq(0.9, 0.1, 0.5, 0.1, 0.3, 0.7, 0.3, 0.05)
    val expect = Seq(0.05, 0.1, 0.3) // 3 smallest of the 6 distinct
    for (perm <- entries.permutations.take(40)) {
      val buf = new KmvBuffer(3)
      perm.foreach(buf.insert)
      assert(buf.hs.take(buf.size).toSeq == expect, s"order $perm")
    }
  }

  test("merge of split buffers equals one buffer over the union") {
    val entries = (1 to 100).map(i => ((i * 37) % 50) / 50.0)
    for (cut <- Seq(0, 13, 50, 100)) {
      val (l, r) = entries.splitAt(cut)
      val bl = new KmvBuffer(8); l.foreach(bl.insert)
      val br = new KmvBuffer(8); r.foreach(br.insert)
      val one = new KmvBuffer(8); entries.foreach(one.insert)
      KmvDistinct(null, 8).merge(bl, br)
      assert(bl.hs.take(bl.size).toSeq == one.hs.take(one.size).toSeq, s"cut $cut")
    }
  }

  test("estimate equals the query-form sketch, at any partitioning") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val queryForm = graft.ops.Aggs.aggDistinctKmv(events, k = 64).collect()(0)
    for (parts <- Seq(1, 13)) {
      val native = graft.ops.Aggs
        .aggDistinctKmvNative(events.repartition(parts), k = 64).collect()(0)
      assert(native.getAs[Double]("est_distinct")
        == queryForm.getAs[Double]("est_distinct"), s"parts $parts")
    }
  }

  test("below k distinct hashes the sketch is exhaustive and exact") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1 to 30).map(i => (i % 10).toDouble / 10.0).toDF("h")
    val out = df.agg(kmv_distinct(col("h"), 64).as("sk"))
      .select(col("sk.m"), col("sk.theta"), col("sk.est_distinct")).collect()(0)
    assert((out.getLong(0), out.getDouble(1), out.getDouble(2)) == ((10L, 1.0, 10.0)))
  }

  test("plan: partial ObjectHashAggregate pair bounds the exchange at k doubles") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val plan = graft.ops.Aggs.aggDistinctKmvNative(events)
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(2000))
    assert(!plan.contains("Sort"), "no global hash sort in the native form")
  }

  test("sketch aggregates incrementally under streaming state, batch-equal") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val spark2 = spark
    import spark2.implicits._
    def sketch(df: org.apache.spark.sql.DataFrame) =
      df.select(graft.ops.Aggs.kmvHash(col("value")).as("h"))
        .agg(kmv_distinct(col("h"), 16).as("sk"))
        .select(col("sk.m").as("m"), col("sk.est_distinct").as("est"))
    val input = MemoryStream[Long]
    val q = sketch(input.toDF()).writeStream.format("memory")
      .queryName("kmv_stream").outputMode("complete").start()
    try {
      input.addData(1L to 10L: _*)
      q.processAllAvailable()
      val r1 = spark.sql("SELECT * FROM kmv_stream").collect()(0)
      assert(r1.getAs[Long]("m") == 10L && r1.getAs[Double]("est") == 10.0)
      // second batch overlaps the first: the STATE must dedup and re-trim
      input.addData(5L to 30L: _*)
      q.processAllAvailable()
      val r2 = spark.sql("SELECT * FROM kmv_stream").collect()(0)
      val batch = sketch((1L to 30L).toDF("value")).collect()(0)
      assert(r2.getAs[Long]("m") == batch.getAs[Long]("m") &&
        r2.getAs[Double]("est") == batch.getAs[Double]("est"))
    } finally q.stop()
  }

  test("SQL registration: kmv_distinct callable from spark.sql") {
    graft.functions.VectorDot.register(spark) // same session-injection path
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("kmv_distinct"),
      KmvDistinct.info, KmvDistinct.builder _)
    val est = spark.sql(
      "SELECT kmv_distinct(CAST(id AS DOUBLE) / 1000.0, 8).est_distinct AS e " +
        "FROM range(100)").collect()(0).getDouble(0)
    assert(est > 0.0)
  }
}
