package graft

import graft.functions.{TopKBuffer, TopKBy}
import graft.functions.TopKBy.top_k_by
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The bounded top-k aggregate: buffer semantics, equivalence with the
  * rank-window form it replaces, and the partial-aggregation plan shape
  * that is its whole reason to exist. */
class TopKBySpec extends SparkSpec {

  test("buffer keeps the k best by (score desc, id asc) under any insertion order") {
    val entries = Seq((1.0, 10L), (3.0, 30L), (2.0, 20L), (3.0, 29L), (0.5, 5L))
    val expect = Seq((3.0, 29L), (3.0, 30L), (2.0, 20L))
    for (perm <- entries.permutations.take(24)) {
      val buf = new TopKBuffer(3)
      perm.foreach { case (s, i) => buf.insert(s, i) }
      val got = (0 until buf.size).map(i => (buf.scores(i), buf.ids(i)))
        .sortBy { case (s, i) => (-s, i) }
      assert(got == expect, s"order $perm")
    }
  }

  test("merge of split buffers equals one buffer over the union") {
    val entries = (1 to 100).map(i => ((i % 13).toDouble, i.toLong))
    for (cut <- Seq(0, 17, 50, 100)) {
      val (l, r) = entries.splitAt(cut)
      val bl = new TopKBuffer(5); l.foreach { case (s, i) => bl.insert(s, i) }
      val br = new TopKBuffer(5); r.foreach { case (s, i) => br.insert(s, i) }
      val one = new TopKBuffer(5); entries.foreach { case (s, i) => one.insert(s, i) }
      val agg = TopKBy(null, null, 5)
      agg.merge(bl, br)
      def render(b: TopKBuffer) =
        (0 until b.size).map(i => (b.scores(i), b.ids(i))).sortBy { case (s, i) => (-s, i) }
      assert(render(bl) == render(one), s"cut $cut")
    }
  }

  test("aggregate equals the rank window on real pairs, at any partitioning") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val viaAgg = graft.ext.Similarity.simKnnJoin(emb, k = 4).collect().map(_.toString)
    val viaWin = {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("cosine").desc, col("neighbor_id"))
      graft.ext.Similarity.simKnnJoin(emb.repartition(7), k = 64)
        .withColumn("rn2", row_number().over(w).cast("long"))
        .filter(col("rn2") <= 4)
        .select(col("vec_id"), col("rn2").as("rn"), col("neighbor_id"), col("cosine"))
        .orderBy("vec_id", "rn")
        .collect().map(_.toString)
    }
    assert(viaAgg.nonEmpty && viaAgg.sameElements(viaWin))
  }

  test("plan: partial ObjectHashAggregate before the key shuffle, no rank window") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = graft.ext.Similarity.simKnnJoin(emb, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    // partial + final pair: the aggregate appears on both sides of the
    // exchange, which is what bounds the shuffle at k rows per task
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(2000))
    assert(!plan.contains("Window"), "rank window should be gone")
  }

  test("null score or id rows are skipped, not ranked") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double, java.lang.Long)](
      (1L, 9.0, 1L), (1L, null, 2L), (1L, 8.0, null), (1L, 7.0, 4L))
      .toDF("key", "s", "i")
    val out = df.groupBy(col("key")).agg(top_k_by(col("s"), col("i"), 3).as("nn"))
      .select(posexplode(col("nn")).as(Seq("pos", "e")))
      .select(col("e.score"), col("e.id")).collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(out == Seq((9.0, 1L), (7.0, 4L)))
  }
}
