package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Det._

/** Source scans (SURVEY.md §2.1). */
object Scans {

  /** S1: full fact-table scan (the Postgres SELECT implied by the graphing
    * exports, graphdata.py:42-69). Timestamp rendered to string for oracle
    * parity; everything else passes through untouched. */
  def scanParquet(lineitem: DataFrame): DataFrame =
    lineitem.select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"),
      fmtTsSec(col("l_shipdate")).as("ship_ts"))
      // (l_orderkey, l_linenumber) is NOT unique in the fixture data —
      // total order needs every output column.
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "ship_ts")
}
