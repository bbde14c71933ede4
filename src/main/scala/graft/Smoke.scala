package graft

import org.apache.spark.sql.SparkSession

/** Local smoke harness mirroring the driver's t1 check: entry() on sf0.001
  * must return rows, plus spot-runs of the public query Map. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println("ENTRY ROWS=" + df.count())
    df.show(5, truncate = false)
    val q = SparkEntry.queries("agg_metrics_summary")(spark, "/root/testdata/sf0.001")
    println("PROBE sf0.001 agg_metrics_summary rows=" + q.count())
    try SparkEntry.queries("agg_count_by_type")(spark, "/root/testdata/nope").count()
    catch { case e: Throwable => println("PROBE bad-dir -> " + e.getClass.getSimpleName) }
    spark.stop()
  }
}
