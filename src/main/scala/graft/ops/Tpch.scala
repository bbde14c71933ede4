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

  /** Q7 shape — nation trade volume: revenue shipped between two trading
    * nations (supplier side vs customer side), per direction per ship year.
    * The symmetric pair predicate rides the two ≤25-row broadcast nation
    * joins as a single disjunctive filter on the joined names — both nation
    * hops are map-side, so the fact row acquires its (supp_nation,
    * cust_nation) labels without a shuffle and the first exchange is the
    * final 4-group agg. Year comes from integer `year()` — identical in
    * both engines. */
  def tpchNationTradeVolume(lineitem: DataFrame, orders: DataFrame,
                            customer: DataFrame, supplier: DataFrame,
                            nation: DataFrame): DataFrame = {
    val n1 = nation.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n2 = nation.select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    lineitem.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .filter((col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_11") ||
              (col("supp_nation") === "NATION_11" && col("cust_nation") === "NATION_7"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("ship_year"))
      .agg(dsum(discPrice).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "ship_year")
  }

  /** Q8 shape — market share: of all revenue that EUROPE customers spent on
    * STANDARD parts, what fraction came through NATION_7 suppliers, per
    * order year. The share numerator is a CONDITIONAL decimal sum inside
    * the same aggregate as the denominator (one pass, no self-join); the
    * final divide is one correctly-rounded double op spelled identically in
    * the oracle, so the ratio itself hash-matches. Customer-side region
    * scoping collapses nation⋈region to a bounded broadcast; part is left
    * unhinted (SF-scaled — AQE broadcasts at bench scale only). */
  def tpchMarketShare(lineitem: DataFrame, orders: DataFrame,
                      customer: DataFrame, supplier: DataFrame, part: DataFrame,
                      nation: DataFrame, region: DataFrame): DataFrame = {
    val mktNations = nation
      .join(broadcast(region.filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val suppNation = nation.select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation"))
    lineitem.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(part.filter(col("p_type") === "STANDARD").select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(mktNations), col("c_nationkey") === col("n_nationkey"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey").as("s_nkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(
        dsum(when(col("supp_nation") === "NATION_7", discPrice).otherwise(lit(0.0)))
          .as("nation_revenue"),
        dsum(discPrice).as("total_revenue"),
        count(lit(1)).as("n_items"))
      .select(col("order_year"), col("nation_revenue"), col("total_revenue"),
        col("n_items"),
        (col("nation_revenue") / col("total_revenue")).as("mkt_share"))
      .orderBy("order_year")
  }

  /** Q13 shape — customer order-count distribution: how many customers
    * placed exactly k orders. The LEFT OUTER join keeps zero-order
    * customers (count of a null key is 0, the row every inner-join form
    * silently drops); both aggregates are pure integer counts. Orders
    * collapses to per-custkey counts BEFORE meeting customer — the join
    * carries one row per customer, not one per order. */
  def tpchCustomerDistribution(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey"))
      .join(orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("c_count")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))

  /** Q15 shape — top supplier: the supplier(s) with the maximum revenue over
    * one ship quarter. The max is computed on the ALREADY-AGGREGATED
    * per-supplier frame (bounded by supplier count, not fact rows) and
    * joined back on revenue EQUALITY — safe only because revenue is
    * decimal-exact (a float sum's equality would be partitioning-dependent);
    * Catalyst folds the 1-row cross join + equality filter into a broadcast
    * HASH join on the normalized revenue key — the scalar probe costs one
    * broadcast, never a loop (plan-gated). */
  def tpchTopSupplier(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(dsum(discPrice).as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(supplier.select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_suppkey").as("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Q17 shape — small-quantity-order revenue: weekly revenue lost if
    * orders below 20 % of a part's average quantity were not stocked, for
    * one brand. The per-part average rides a WINDOW over the brand-filtered
    * fact slice (one l_partkey shuffle; the agg+rejoin form would shuffle
    * the same rows AND add a join) — with the average spelled decimal-exact
    * so the `qty < 0.2·avg` cut never sits on an FP boundary that could
    * differ between engines. */
  def tpchSmallQtyRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_partkey"))
    lineitem.select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(part.filter(col("p_brand") === "Brand#4").select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty",
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(28, 6))).over(w)
          .cast("double") / count(col("l_quantity")).over(w))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_items"))

  }

  /** Q18 shape — large-volume orders: the customers behind every order
    * whose total quantity exceeds 250. The HAVING runs on the per-order
    * aggregate (map-side combine collapses the fact scan to one row per
    * order) BEFORE any dimension is touched, so orders and customer join a
    * ~p99-selective frame; top rows deterministic via (qty desc, orderkey). */
  def tpchBigOrderCustomers(lineitem: DataFrame, orders: DataFrame,
                            customer: DataFrame): DataFrame =
    lineitem.groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 250.0)
      .join(orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice")), col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        fmtTsSec(col("o_orderdate")).as("o_orderdate_s"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(desc("total_qty"), col("o_orderkey"))

  /** Q19 shape — bracketed revenue: revenue from three disjunctive
    * (brand, size band, quantity band) brackets, reported per bracket. The
    * join stays a plain partkey EQUI-join (the disjunction is a residual
    * filter, not a join condition — no nested-loop anywhere); brackets are
    * mutually exclusive by brand so the `when` chain is a total labeling.
    * All band predicates compare stored doubles/ints to literals — no
    * arithmetic, nothing to round. */
  def tpchBracketRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val b1 = col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
      col("l_quantity").between(1.0, 20.0)
    val b2 = col("p_brand") === "Brand#19" && col("p_size").between(10, 30) &&
      col("l_quantity").between(10.0, 30.0)
    val b3 = col("p_brand") === "Brand#2" && col("p_size").between(20, 50) &&
      col("l_quantity").between(20.0, 40.0)
    lineitem.select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .join(part.select(col("p_partkey"), col("p_brand"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(b1 || b2 || b3)
      .select(when(b1, "bracket_1").when(b2, "bracket_2").otherwise("bracket_3")
        .as("bracket"), col("l_extendedprice"), col("l_discount"), col("l_quantity"))
      .groupBy(col("bracket"))
      .agg(dsum(discPrice).as("revenue"), dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy("bracket")
  }

  /** Q22 shape — idle customer balance: per nation, the count and held
    * balance of above-average-balance customers with no order since 2000
    * (dormant capital). The positive-balance average is a 1-row aggregate
    * shipped as an explicit broadcast nested-loop (single-row build side,
    * allowlisted in PlanLintSpec — a map-side literal in effect); the
    * "no recent order" test is a LEFT ANTI join against the date-filtered
    * order keys; nation is the bounded broadcast. The `acctbal > avg`
    * comparison is double-vs-double with the average built decimal-exact —
    * identical bits both engines. */
  def tpchIdleCustomerBalance(customer: DataFrame, orders: DataFrame,
                              nation: DataFrame): DataFrame = {
    val avgBal = customer.filter(col("c_acctbal") > 0.0)
      .agg(davg(col("c_acctbal")).as("avg_bal"))
    val recent = orders
      .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
      .select(col("o_custkey"))
    customer.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("total_bal"))
      .orderBy("n_name")
  }

  /** Q11 shape — value concentration: the parts whose discounted revenue
    * exceeds a fraction of the WHOLE corpus's revenue (the "important
    * stock" cut — where is value concentrated?). The grand total is a
    * 1-row decimal-exact aggregate broadcast against the per-part frame
    * (allowlisted 1-row nested-loop, a map-side literal in effect); the
    * threshold compare is double-vs-double with both sides built from the
    * same decimal sums, so the cut is engine-exact. Per-part and grand
    * totals come from ONE scan: the grand total re-aggregates the
    * per-part frame (part-bounded), never the fact table twice. */
  def tpchPartValueConcentration(lineitem: DataFrame,
                                 fraction: Double = 0.00075): DataFrame = {
    val perPart = lineitem
      .groupBy(col("l_partkey"))
      .agg(dsum(discPrice).as("part_value"), count(lit(1)).as("n_items"))
    val total = perPart.agg(sum(col("part_value").cast(
      org.apache.spark.sql.types.DecimalType(28, 6))).cast("double").as("total_value"))
    perPart.crossJoin(broadcast(total))
      .filter(col("part_value") > lit(fraction) * col("total_value"))
      .select(col("l_partkey"), col("part_value"), col("n_items"),
        col("total_value"))
      .orderBy(desc("part_value"), col("l_partkey"))
  }

  /** Q2 shape — minimum-cost supplier: for each part in a size/type slice,
    * the EUROPE supplier(s) quoting the lowest observed unit price. The
    * canonical correlated scalar subquery (`WHERE cost = (SELECT min ...)`)
    * is re-expressed as aggregate + join-back: per-(part, supplier) min
    * unit price, re-aggregated per part, equi-joined on (partkey, cost).
    * Unit price is ONE double divide (correctly rounded, identical both
    * engines) and min is a selection, so the double equality join key is
    * engine-exact. Both aggs shuffle on l_partkey — the join-back reuses
    * the partitioning; supplier attributes join AFTER the collapse, so
    * names never ride the fact shuffle. (No `partsupp` fixture exists, so
    * observed lineitem prices stand in for published supply costs — same
    * plan shape, same correlation structure.) */
  def tpchMinCostSupplier(lineitem: DataFrame, part: DataFrame,
                          supplier: DataFrame, nation: DataFrame,
                          region: DataFrame): DataFrame = {
    val euSupp = supplier
      .join(broadcast(nation
          .join(broadcast(region.filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val slice = part
      .filter(col("p_type") === "STANDARD" && col("p_size") === 15)
      .select(col("p_partkey"))
    val cost = lineitem
      .join(slice, col("l_partkey") === col("p_partkey"))
      .join(euSupp.select(col("s_suppkey")), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val best = cost.groupBy(col("l_partkey").as("bp"))
      .agg(min(col("unit_cost")).as("min_cost"))
    cost
      .join(best, col("l_partkey") === col("bp") &&
        col("unit_cost") === col("min_cost"))
      .join(euSupp, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("unit_cost"))
      .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** Q9 shape — product-line profit: per (supplier nation, order year)
    * profit on one part family. Profit per item extends the revenue chain
    * with a proxy supply cost (`0.1 * p_retailprice * l_quantity`, left-
    * associated — no `partsupp.ps_supplycost` fixture exists): subtract of
    * two fixed-order double chains, decimal-summed. The part-name filter
    * collapses part to a keys+price frame before the fact join; nation is
    * the bounded broadcast; supplier/orders ride unhinted equi-joins. */
  def tpchProductProfit(lineitem: DataFrame, part: DataFrame,
                        supplier: DataFrame, orders: DataFrame,
                        nation: DataFrame): DataFrame = {
    val p = part.filter(col("p_name").contains("gear"))
      .select(col("p_partkey"), col("p_retailprice"))
    val profit = discPrice -
      lit(0.1) * col("p_retailprice") * col("l_quantity")
    lineitem
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(orders.select(col("o_orderkey"), year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(dsum(profit).as("sum_profit"), count(lit(1)).as("n_items"))
      .orderBy(col("n_name"), desc("o_year"))
  }

  /** Q12 shape — shipping-latency priority audit: did slow shipments carry
    * critical orders? Lines shipped in one year are banded by order-to-ship
    * latency (no `l_shipmode` fixture exists; latency tiers are the
    * behavioral stand-in), counting critical (URGENT/HIGH) vs other orders
    * per band. `datediff` is exact integer day arithmetic; the CASE bands
    * and conditional counts are the canonical Q12 aggregate. One equi-join
    * + one 3-group agg — the fact side collapses map-side. */
  def tpchShipLatencyPriority(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val lat = datediff(col("l_shipdate"), col("o_orderdate"))
    val tier = when(lat >= 60, "SLOW").when(lat >= 30, "MEDIUM").otherwise("FAST")
    val critical = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(tier.as("latency_tier"))
      .agg(sum(when(critical, 1L).otherwise(0L)).as("n_critical"),
        sum(when(critical, 0L).otherwise(1L)).as("n_other"))
      .orderBy("latency_tier")
  }

  /** Q16 shape — supplier diversity per part class: how many distinct
    * suppliers have shipped each (brand, type, size) outside one excluded
    * brand, excluding flagged suppliers (negative account balance — the
    * "customer complaints" stand-in; no comment columns exist). The flagged
    * list is a LEFT ANTI join (canonical `NOT IN`), part attributes join a
    * distinct (part, supp) frame — the fact table collapses to distinct
    * pairs FIRST, so the attribute join and the count-distinct agg run on
    * pair cardinality, never item cardinality. */
  def tpchSupplierPartCounts(lineitem: DataFrame, part: DataFrame,
                             supplier: DataFrame): DataFrame = {
    val flagged = supplier.filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
    val pairs = lineitem.select(col("l_partkey"), col("l_suppkey")).distinct()
    pairs
      .join(flagged, pairs("l_suppkey") === flagged("s_suppkey"), "left_anti")
      .join(part.filter(col("p_brand") =!= "Brand#2")
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Q20 shape — dominant part suppliers: ASIA suppliers who shipped more
    * than half of a part family's total 1996 volume (the concentration
    * risk the canonical "excess inventory" probe measures; shipped volume
    * stands in for `ps_availqty`). Nested aggregate + threshold + semi
    * join: per-(part, supp) quantities re-aggregate to per-part totals
    * (shuffle reused on l_partkey), the >50 % cut compares two decimal-
    * exact doubles, and the surviving supplier keys SEMI-join supplier —
    * output is supplier rows, never pair rows. */
  def tpchDominantPartSupplier(lineitem: DataFrame, part: DataFrame,
                               supplier: DataFrame, nation: DataFrame,
                               region: DataFrame): DataFrame = {
    val slice = part.filter(col("p_name").startsWith("red"))
      .select(col("p_partkey"))
    val shipped = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      .join(slice, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(dsum(col("l_quantity")).as("supp_qty"))
    val totals = shipped.groupBy(col("l_partkey").as("tp"))
      .agg(sum(col("supp_qty").cast(
        org.apache.spark.sql.types.DecimalType(28, 6))).cast("double").as("total_qty"))
    val dominant = shipped
      .join(totals, col("l_partkey") === col("tp"))
      .filter(col("supp_qty") > lit(0.5) * col("total_qty"))
      .select(col("l_suppkey")).distinct()
    supplier
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(nation
          .join(broadcast(region.filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_suppkey"))
  }

  /** Q21 shape — suppliers who kept orders waiting: for finished multi-
    * supplier orders, the suppliers who were the ONLY late shipper (late =
    * shipped > 75 days after order; no commit/receipt date fixtures). The
    * canonical EXISTS + NOT EXISTS double correlation collapses to ONE
    * aggregate pass: per-(order, supplier) late flags roll up to per-order
    * supplier/late-supplier counts, and "blamed" rows are late suppliers on
    * orders with > 1 supplier and exactly 1 late one — same semantics, one
    * shuffle on the order key instead of two correlated re-scans (the form
    * both engines evaluate deterministically; the oracle spells the
    * identical aggregate). Supplier attributes join after the per-supplier
    * collapse. */
  def tpchWaitingSuppliers(lineitem: DataFrame, orders: DataFrame,
                           supplier: DataFrame, nation: DataFrame): DataFrame = {
    val perOrderSupp = lineitem
      .join(orders.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 75 DAYS"), 1L).otherwise(0L))
        .as("supp_late"))
    val perOrder = perOrderSupp.groupBy(col("l_orderkey").as("ok"))
      .agg(count(lit(1)).as("n_supp"), sum(col("supp_late")).as("n_late_supp"))
    perOrderSupp
      .filter(col("supp_late") === 1L)
      .join(perOrder, col("l_orderkey") === col("ok") &&
        col("n_supp") > 1L && col("n_late_supp") === 1L)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(supplier.select(col("s_suppkey"), col("s_name"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_3")
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
      .limit(25)
  }

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
