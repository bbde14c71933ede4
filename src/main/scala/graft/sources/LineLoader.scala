package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S6: line-file → document-store loader with line numbering — the Spark
  * form of the reference's text-file → MongoDB loader
  * (QuerryGenerator.py:9-16: {Name, Line, "Line Number"}).
  *
  * Line numbers come from zipWithIndex (stable per file order), not
  * monotonically_increasing_id (which is partition-dependent and
  * non-contiguous). */
object LineLoader {

  def load(spark: SparkSession, path: String, name: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).rdd.zipWithIndex()
      .map { case (line, idx) => (name, line, idx + 1) } // 1-based like the reference
      .toDF("name", "line", "line_number")
  }
}
