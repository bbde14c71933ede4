package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (SURVEY.md §2.10 X3 plus the
  * LSH-bucketed scale path and embedding-based near-dup detection).
  *
  * Dot products are Catalyst-native (`zip_with` + `aggregate` fold) — no
  * UDFs; the fold is a sequential left fold so results are reproducible
  * bit-for-bit across engines and partitionings.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def withNorm(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** X3: brute-force cosine top-k — queries (vec_id < nQueries) broadcast
    * against the full corpus; ranking ties broken by vec_id. The corpus
    * side stays partitioned; only the query side replicates, so this is
    * the correct baseline even on a large cluster. */
  def simSearchCosineTopk(embeddings: DataFrame, nQueries: Int = 10, k: Int = 10): DataFrame = {
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val pairs = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    pairs.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn"), col("vec_id"), col("cosine"))
      .orderBy("query_id", "rn")
  }

  /** Sign-bucket key over the first `bits` dimensions — a deterministic
    * hyperplane-LSH stand-in (axis-aligned planes). */
  private def signBucket(v: Column, bits: Int): Column =
    concat((1 to bits).map(i =>
      when(element_at(v, i) > 0, lit("1")).otherwise(lit("0"))): _*)

  /** LSH-bucketed cosine search: candidates restricted to the query's sign
    * bucket, exact cosine inside the bucket, top-k per query. The bucket
    * equi-join replaces the cross join — the 100 TB path. */
  def simSearchLshBucketed(embeddings: DataFrame, nQueries: Int = 50,
                           k: Int = 5, bits: Int = 6): DataFrame = {
    val e = withNorm(embeddings).withColumn("bucket", signBucket(col("v"), bits))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket"))
    val pairs = e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    pairs.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn"), col("vec_id"), col("cosine"))
      .orderBy("query_id", "rn")
  }

  /** Embedding-cosine near-dup pairs: all (a < b) with cosine ≥ threshold.
    * Brute force here; the LSH bucket join above is the scale path. */
  def dedupEmbeddingCosine(embeddings: DataFrame, threshold: Double = 0.35): DataFrame = {
    val e = withNorm(embeddings)
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine",
        dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cosine"))
      .orderBy("vec_a", "vec_b")
  }
}
