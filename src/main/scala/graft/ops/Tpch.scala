package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Det._

/** Classic warehouse (TPC-H-shaped) query suite over the driver's
  * `lineitem`/`orders`/`customer`/`supplier`/`part`/`nation`/`region`
  * fixtures — the multi-way-join OLAP surface a 100 TB deployment of this
  * engine actually runs. The reference's only "analytics" are per-node
  * filters and overlay plots (`graphdata.py:90-192`); these queries are the
  * scaled-up dimensional form of the same question set (what happened, per
  * class, per region, who is the worst offender), re-expressed in the
  * declarative shapes Catalyst plans best.
  *
  * Design rules shared by the suite:
  *  - every fact-side sum routes through [[graft.Det.dsum]] (DECIMAL(28,6)
  *    accumulation — order-independent, so results hash-match DuckDB);
  *  - per-row price arithmetic is a fixed-order chain of correctly-rounded
  *    double ops (`price * (1 - disc)`, then `* (1 + tax)`) mirrored
  *    verbatim in the oracle SQL — identical bit patterns in both engines;
  *  - genuinely bounded dims (nation: 25 rows, region: 5) are hint-kept
  *    broadcasts; SF-scaled sides (part, supplier, customer, orders) are
  *    left unhinted so AQE picks broadcast at bench scale and shuffled
  *    hash/sort-merge at 100 TB — the hint would be a lie at scale;
  *  - every query ends in a total order (desc sums tie-broken by key).
  */
object Tpch {

  /** Per-row discounted revenue: one subtract + one multiply, both
    * correctly rounded — DuckDB spelling `l_extendedprice * (1 - l_discount)`. */
  private def discPrice: org.apache.spark.sql.Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Q1 shape — pricing summary report: per (returnflag, linestatus)
    * quantity/price/revenue/charge totals and means over all items shipped
    * by a cutoff. THE canonical scan-heavy aggregate: one predicate-pushed
    * scan collapsing 100 TB of lineitem into 6 groups through a map-side
    * partial agg; no join, no window. Charge extends the revenue chain by
    * one more rounded multiply (`* (1 + l_tax)`), still fixed-order. */
  def tpchPricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(discPrice).as("sum_disc_price"),
        dsum(discPrice * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q3 shape — shipping priority: the 10 highest-revenue unshipped orders
    * for one market segment at a date cutoff. Segment-filtered customer
    * keys reduce orders BEFORE the fact join (the selective dim filter is
    * the point of the query); both dim joins are left unhinted — customer
    * and orders scale with SF, so AQE broadcasts at bench scale and
    * shuffles at 100 TB. Revenue is decimal-exact, top-10 tie-broken by
    * order key, so the cut is deterministic. */
  def tpchShippingPriority(lineitem: DataFrame, orders: DataFrame,
                           customer: DataFrame): DataFrame = {
    val cut = lit("1997-01-01 00:00:00").cast("timestamp")
    val c = customer.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = orders.filter(col("o_orderdate") < cut)
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    lineitem.filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(discPrice).as("revenue"))
      .select(col("o_orderkey"), fmtTsSec(col("o_orderdate")).as("o_orderdate_s"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
  }

  /** Q5 shape — local-supplier volume: revenue per nation for one region
    * and year, counting only orders where the customer and the supplier
    * share a nation. The 6-table join every star/snowflake benchmark
    * grades: nation⋈region collapses to a ≤25-row broadcast, supplier and
    * customer ride unhinted equi-joins (AQE decides), and the
    * customer⋈order hop carries the extra c_nationkey = s_nationkey
    * equality as a join-condition conjunct — no post-join filter, so the
    * join output never inflates. */
  def tpchLocalSupplierVolume(lineitem: DataFrame, orders: DataFrame,
                              customer: DataFrame, supplier: DataFrame,
                              nation: DataFrame, region: DataFrame): DataFrame = {
    val o = orders
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val asiaNations = nation
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    lineitem.select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(discPrice).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  /** Q6 shape — revenue-change forecast: what revenue would have been kept
    * had discounts in a band been dropped, for one shipping year. A pure
    * scan query — every predicate (date range, discount band, quantity
    * cap) pushes to the parquet reader, the sum is one map-side partial
    * agg; the whole thing is a single-stage plan at any scale. The
    * discount band compares stored doubles against the same double
    * literals in both engines — no rounding enters. */
  def tpchRevenueForecast(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
              col("l_discount").between(0.04, 0.06) &&
              col("l_quantity") < 24.0)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))

  /** Q14 shape — promotion effect: the share of one month's revenue that
    * came from promotional parts. First use of the `part` table: the
    * part⋈lineitem hop is unhinted (part scales with SF — 200 k rows per
    * TPC-H SF unit; AQE broadcasts it at bench scale only). The share is
    * (100 · promo) / total with both sums decimal-exact and ONE division
    * at the end — spelled identically in the oracle, so even the ratio
    * hash-matches. */
  def tpchPromoRevenue(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1996-09-01 00:00:00").cast("timestamp") &&
              col("l_shipdate") < lit("1996-10-01 00:00:00").cast("timestamp"))
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .join(part.select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        dsum(when(col("p_type") === "PROMO", discPrice).otherwise(lit(0.0)))
          .as("promo_revenue"),
        dsum(discPrice).as("total_revenue"),
        count(lit(1)).as("n_items"))
      .select(col("promo_revenue"), col("total_revenue"), col("n_items"),
        (lit(100.0) * col("promo_revenue") / col("total_revenue")).as("promo_share_pct"))

  /** Q4 shape — late-shipment priority check: orders from one quarter with
    * at least one item shipped more than 90 days after the order date,
    * counted per priority. The existence test is a LEFT SEMI join with the
    * lateness predicate folded into the join condition (equi on orderkey +
    * the non-equi conjunct) — each order emits at most once regardless of
    * how many items were late, and no lineitem columns survive the join,
    * so nothing inflates before the 5-row count. */
  def tpchLateShipmentPriority(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit("1996-07-01 00:00:00").cast("timestamp") &&
              col("o_orderdate") < lit("1996-10-01 00:00:00").cast("timestamp"))
      .join(lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy("o_orderpriority")

  /** Q10 shape — returned-item revenue loss: the 20 customers who returned
    * the most revenue in one quarter. The fact side collapses FIRST (the
    * returnflag filter + quarter-scoped orders join + per-custkey agg run
    * before any customer attribute is touched), then the bounded per-
    * customer frame joins customer for names — the dimensional attributes
    * never ride the fact-table shuffle. Top-20 tie-broken by custkey. */
  def tpchReturnedRevenue(lineitem: DataFrame, orders: DataFrame,
                          customer: DataFrame): DataFrame = {
    val o = orders
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("o_orderdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(dsum(discPrice).as("revenue"), count(lit(1)).as("n_returned_items"))
      .join(customer.select(col("c_custkey"), col("c_name"), col("c_acctbal")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey").as("c_custkey"), col("c_name"), col("c_acctbal"),
        col("revenue"), col("n_returned_items"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }
}
