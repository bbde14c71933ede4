package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorDot
import graft.functions.VectorDot.vector_dot
import graft.ext.Similarity

/** The custom codegen'd VectorDot expression: agreement with the HOF fold,
  * SQL registration, null and type behavior. */
class VectorDotSpec extends SparkSpec {
  import spark.implicits._

  val df = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.1, 0.2, 0.3), Array(-1.0, 0.5, 2.0))
  ).toDF("id", "a", "b")

  test("matches the zip_with/aggregate fold bit-for-bit") {
    val out = df.select(
      vector_dot(col("a"), col("b")).as("native"),
      Similarity.dot(col("a"), col("b")).as("fold")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(out(0).getDouble(0) == 32.0)
  }

  test("registered SQL function works and agrees") {
    VectorDot.register(spark)
    df.createOrReplaceTempView("vd")
    val out = spark.sql("SELECT vector_dot(a, b) AS d FROM vd ORDER BY id").collect()
    assert(out(0).getDouble(0) == 32.0)
  }

  test("NULL array yields NULL; wrong type fails analysis") {
    val withNull = Seq((1L, Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("id", "a", "b")
    val r = withNull.select(vector_dot(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
    val bad = intercept[Exception] {
      df.select(vector_dot(col("id"), col("a"))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("vector_dot") ||
      bad.getMessage.toLowerCase.contains("datatype_mismatch") ||
      bad.getMessage.toLowerCase.contains("cannot resolve"))
  }

  test("null ELEMENT yields NULL — exact vs the HOF fold (ADVICE r3)") {
    // aggregate(zip_with(v,v,*),0.0,+) is NULL when v has a null element;
    // vector_dot must agree or the injected rewrite would silently change
    // user SQL results on containsNull=true arrays.
    val withNullElem = Seq(
      (1L, Array(Option(1.0), None, Option(3.0))),
      (2L, Array(Option(1.0), Option(2.0), Option(3.0)))
    ).toDF("id", "v").selectExpr("id", "CAST(v AS array<double>) AS v")
    val out = withNullElem.select(
      col("id"),
      expr("aggregate(zip_with(v, v, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x)").as("hof"),
      vector_dot(col("v"), col("v")).as("native"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2), "null element must null both forms")
    assert(out(1).getDouble(1) == 14.0 && out(1).getDouble(2) == 14.0)
  }

  test("different lengths dot over common prefix (documented semantics)") {
    val uneven = Seq((1L, Array(1.0, 2.0, 3.0), Array(10.0, 10.0)))
      .toDF("id", "a", "b")
    assert(uneven.select(vector_dot(col("a"), col("b"))).collect().head.getDouble(0) == 30.0)
  }

  test("vector_dot is SQL-callable after per-session registration") {
    graft.functions.VectorDot.register(spark)
    val v = spark.sql("SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(v == 11.0)
  }

  test("GraftExtensions injects vector_dot at session build (deployment conf path)") {
    import org.apache.spark.sql.SparkSession
    // getOrCreate returns the active session and ignores new extensions —
    // clear active/default so a FRESH session (same SparkContext) is built
    // with the extensions applied, exactly as spark.sql.extensions would
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      // no VectorDot.register call: the function must come from injection
      val v = s2.sql("SELECT vector_dot(array(1.0d, 2.0d, 3.0d), array(1.0d, 1.0d, 1.0d)) AS d")
        .collect().head.getDouble(0)
      assert(v == 6.0)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("injected optimizer rule rewrites the self-HOF dot (norm) to vector_dot") {
    import org.apache.spark.sql.SparkSession
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      // parquet-backed data: a LocalRelation would be constant-folded away
      // before the rewritten expression is visible in the optimized plan
      val e = Tables.embeddings(s2, "/root/testdata/sf0.001")
        .selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")
      val hofNorm = e.selectExpr("vec_id",
        "aggregate(zip_with(v, v, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x) AS d")
      assert(hofNorm.queryExecution.optimizedPlan.toString.contains("vector_dot"),
        s"norm HOF not rewritten:\n${hofNorm.queryExecution.optimizedPlan}")
      val native = e.select(col("vec_id"), vector_dot(col("v"), col("v")).as("d"))
      assert(hofNorm.orderBy("vec_id").collect().map(_.getDouble(1)).toSeq ==
        native.orderBy("vec_id").collect().map(_.getDouble(1)).toSeq,
        "rewritten values must be bit-identical to the native kernel")
      // two DIFFERENT arrays must NOT rewrite: zip_with pads the shorter
      // side with NULL (aggregate -> NULL) while vector_dot dots the prefix
      val different = e.selectExpr(
        "aggregate(zip_with(slice(v, 1, 3), slice(v, 1, 2), (x, y) -> x * y), 0.0d, (acc, x) -> acc + x) AS d")
      assert(!different.queryExecution.optimizedPlan.toString.contains("vector_dot"),
        "unsound rewrite of a two-array HOF dot")
      assert(different.limit(1).collect().head.isNullAt(0), "padding semantics preserved")
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("works on the real embeddings inside whole-stage codegen") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("v"))
    val s = e.select(sum(vector_dot(col("v"), col("v"))).as("ss")).collect().head.getDouble(0)
    assert(s > 0.0)
  }
}
