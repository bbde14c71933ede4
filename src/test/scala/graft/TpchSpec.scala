package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Tpch

/** Unit + plan-shape checks for the classic warehouse (TPC-H-shaped)
  * suite. Values are verified on literal frames small enough to check by
  * hand; plan gates pin the scale-relevant choices (map-side partial agg
  * on the scan-heavy queries, semi-join multiplicity, fact-collapse-
  * before-dimension-join). */
class TpchSpec extends SparkSpec {
  import spark.implicits._

  private val ts = (s: String) => Timestamp.valueOf(s)

  private def li(rows: (Long, Long, Long, Double, Double, Double, Double, String, String, String)*) =
    rows.toSeq.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "ship")
      .withColumn("l_shipdate", col("ship").cast("timestamp")).drop("ship")

  test("pricing summary: exact sums, charge chain, cutoff filter") {
    val df = li(
      (1L, 1L, 1L, 10.0, 100.0, 0.1, 0.05, "A", "F", "1996-01-01 00:00:00"),
      (2L, 1L, 1L, 20.0, 200.0, 0.0, 0.10, "A", "F", "1996-02-01 00:00:00"),
      (3L, 1L, 1L, 99.0, 999.0, 0.5, 0.50, "A", "F", "1999-01-01 00:00:00"), // past cutoff
      (4L, 1L, 1L, 5.0, 50.0, 0.2, 0.00, "R", "O", "1996-03-01 00:00:00"))
    val out = Tpch.tpchPricingSummary(df).collect()
    assert(out.length == 2)
    val af = out(0)
    assert(af.getAs[String]("l_returnflag") == "A")
    assert(af.getAs[Double]("sum_qty") == 30.0)
    assert(af.getAs[Double]("sum_base_price") == 300.0)
    // 100*0.9 + 200*1.0 = 290; charge: 90*1.05 + 200*1.1 = 94.5 + 220
    assert(af.getAs[Double]("sum_disc_price") == 290.0)
    assert(af.getAs[Double]("sum_charge") == 314.5)
    assert(af.getAs[Double]("avg_qty") == 15.0)
    assert(af.getAs[Long]("count_order") == 2L)
    val r = out(1)
    assert(r.getAs[String]("l_returnflag") == "R")
    assert(r.getAs[Double]("sum_disc_price") == 40.0)
  }

  test("pricing summary plan: partial agg before the one exchange, no join") {
    val plan = Tpch.tpchPricingSummary(
      Tables.lineitem(spark, "/root/testdata/sf0.001"))
      .queryExecution.executedPlan.toString
    assert("\\bHashAggregate\\b".r.findAllIn(plan).size == 2, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("revenue forecast: band + quantity filters, single-row result") {
    val df = li(
      (1L, 1L, 1L, 10.0, 100.0, 0.05, 0.0, "A", "F", "1996-06-01 00:00:00"), // in
      (2L, 1L, 1L, 30.0, 100.0, 0.05, 0.0, "A", "F", "1996-06-01 00:00:00"), // qty too big
      (3L, 1L, 1L, 10.0, 100.0, 0.10, 0.0, "A", "F", "1996-06-01 00:00:00"), // disc out of band
      (4L, 1L, 1L, 10.0, 100.0, 0.05, 0.0, "A", "F", "1995-06-01 00:00:00")) // wrong year
    val out = Tpch.tpchRevenueForecast(df).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("revenue") == 5.0) // 100 * 0.05
    assert(out(0).getAs[Long]("n_items") == 1L)
  }

  test("late-shipment priority: order counted once despite two late items") {
    val orders = Seq(
      (10L, ts("1996-07-15 00:00:00"), "1-URGENT"),
      (11L, ts("1996-07-15 00:00:00"), "1-URGENT"),  // no late items
      (12L, ts("1996-12-01 00:00:00"), "2-HIGH"))    // outside quarter
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val items = Seq(
      (10L, ts("1996-12-01 00:00:00")),  // late (139 days)
      (10L, ts("1996-12-15 00:00:00")),  // late again — must not double-count
      (11L, ts("1996-07-20 00:00:00")),  // on time
      (12L, ts("1997-06-01 00:00:00")))  // late but order outside quarter
      .toDF("l_orderkey", "l_shipdate")
    val out = Tpch.tpchLateShipmentPriority(orders, items).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("o_orderpriority") == "1-URGENT")
    assert(out(0).getAs[Long]("n_late_orders") == 1L)
  }

  test("promo revenue: share is (100 * promo) / total") {
    val items = li(
      (1L, 100L, 1L, 1.0, 100.0, 0.0, 0.0, "A", "F", "1996-09-10 00:00:00"),
      (2L, 200L, 1L, 1.0, 300.0, 0.0, 0.0, "A", "F", "1996-09-20 00:00:00"),
      (3L, 100L, 1L, 1.0, 999.0, 0.0, 0.0, "A", "F", "1996-10-05 00:00:00")) // outside month
    val part = Seq((100L, "PROMO"), (200L, "STANDARD")).toDF("p_partkey", "p_type")
    val out = Tpch.tpchPromoRevenue(items, part).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("promo_revenue") == 100.0)
    assert(out(0).getAs[Double]("total_revenue") == 400.0)
    assert(out(0).getAs[Double]("promo_share_pct") == 25.0)
  }

  test("shipping priority: segment + date gates, revenue-desc top-k") {
    val customers = Seq((1L, "BUILDING"), (2L, "AUTOMOBILE"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (10L, 1L, ts("1996-06-01 00:00:00"), "1-URGENT"),
      (11L, 1L, ts("1996-06-02 00:00:00"), "2-HIGH"),
      (12L, 2L, ts("1996-06-03 00:00:00"), "3-MEDIUM"),   // wrong segment
      (13L, 1L, ts("1997-06-01 00:00:00"), "4-NOT SPECIFIED")) // ordered after cutoff
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val items = li(
      (10L, 1L, 1L, 1.0, 100.0, 0.0, 0.0, "N", "O", "1997-02-01 00:00:00"),
      (10L, 1L, 1L, 1.0, 50.0, 0.0, 0.0, "N", "O", "1997-03-01 00:00:00"),
      (11L, 1L, 1L, 1.0, 900.0, 0.0, 0.0, "N", "O", "1997-02-01 00:00:00"),
      (11L, 1L, 1L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-02-01 00:00:00"),  // shipped before cutoff
      (12L, 1L, 1L, 1.0, 500.0, 0.0, 0.0, "N", "O", "1997-02-01 00:00:00"),
      (13L, 1L, 1L, 1.0, 700.0, 0.0, 0.0, "N", "O", "1997-07-01 00:00:00"))
    val out = Tpch.tpchShippingPriority(items, orders, customers).collect()
    assert(out.map(_.getAs[Long]("o_orderkey")).toSeq == Seq(11L, 10L))
    assert(out(0).getAs[Double]("revenue") == 900.0)
    assert(out(1).getAs[Double]("revenue") == 150.0)
  }

  test("local supplier volume: customer and supplier must share a nation") {
    val region = Seq((0, "ASIA"), (1, "EUROPE")).toDF("r_regionkey", "r_name")
    val nation = Seq((100, "JAPAN", 0), (101, "INDIA", 0), (200, "FRANCE", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((1L, 100), (2L, 101), (3L, 200))
      .toDF("s_suppkey", "s_nationkey")
    val customer = Seq((7L, 100), (8L, 200)).toDF("c_custkey", "c_nationkey")
    val orders = Seq(
      (10L, 7L, ts("1996-03-01 00:00:00")),
      (11L, 8L, ts("1996-03-01 00:00:00")),
      (12L, 7L, ts("1995-03-01 00:00:00")))  // wrong year
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val items = li(
      (10L, 1L, 1L, 1.0, 100.0, 0.0, 0.0, "N", "O", "1996-03-05 00:00:00"), // JP cust × JP supp: counts
      (10L, 1L, 2L, 1.0, 40.0, 0.0, 0.0, "N", "O", "1996-03-05 00:00:00"),  // JP cust × IN supp: filtered
      (11L, 1L, 3L, 1.0, 70.0, 0.0, 0.0, "N", "O", "1996-03-05 00:00:00"),  // FR×FR but not ASIA
      (12L, 1L, 1L, 1.0, 999.0, 0.0, 0.0, "N", "O", "1996-03-05 00:00:00")) // order outside year
    val out = Tpch.tpchLocalSupplierVolume(items, orders, customer, supplier,
      nation, region).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("n_name") == "JAPAN")
    assert(out(0).getAs[Double]("revenue") == 100.0)
  }

  test("returned revenue: fact collapses before the customer attribute join") {
    val customers = Seq((7L, "Alice", 10.0), (8L, "Bob", 20.0))
      .toDF("c_custkey", "c_name", "c_acctbal")
    val orders = Seq(
      (10L, 7L, ts("1996-02-01 00:00:00")),
      (11L, 8L, ts("1996-02-01 00:00:00")),
      (12L, 7L, ts("1996-06-01 00:00:00")))  // outside quarter
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val items = li(
      (10L, 1L, 1L, 1.0, 100.0, 0.0, 0.0, "R", "F", "1996-03-01 00:00:00"),
      (10L, 1L, 1L, 1.0, 60.0, 0.0, 0.0, "N", "F", "1996-03-01 00:00:00"),  // not returned
      (11L, 1L, 1L, 1.0, 30.0, 0.0, 0.0, "R", "F", "1996-03-01 00:00:00"),
      (12L, 1L, 1L, 1.0, 500.0, 0.0, 0.0, "R", "F", "1996-07-01 00:00:00")) // outside quarter
    val out = Tpch.tpchReturnedRevenue(items, orders, customers).collect()
    assert(out.map(r => (r.getAs[Long]("c_custkey"), r.getAs[Double]("revenue"))).toSeq
      == Seq((7L, 100.0), (8L, 30.0)))
    assert(out(0).getAs[String]("c_name") == "Alice")
  }

  test("nation trade volume: both directions kept, others dropped") {
    val nation = Seq((100, "NATION_7", 0), (101, "NATION_11", 0), (102, "NATION_3", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((1L, 100), (2L, 101), (3L, 102))
      .toDF("s_suppkey", "s_nationkey")
    val customer = Seq((7L, 101), (8L, 100), (9L, 102))
      .toDF("c_custkey", "c_nationkey")
    val orders = Seq((10L, 7L), (11L, 8L), (12L, 9L))
      .toDF("o_orderkey", "o_custkey")
    val items = li(
      (10L, 1L, 1L, 1.0, 100.0, 0.0, 0.0, "N", "O", "1996-03-05 00:00:00"), // 7 -> 11
      (11L, 1L, 2L, 1.0, 40.0, 0.0, 0.0, "N", "O", "1997-03-05 00:00:00"),  // 11 -> 7
      (12L, 1L, 1L, 1.0, 70.0, 0.0, 0.0, "N", "O", "1996-03-05 00:00:00"))  // 7 -> 3: dropped
    val out = Tpch.tpchNationTradeVolume(items, orders, customer, supplier, nation)
      .collect()
    assert(out.map(r => (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"),
      r.getAs[Int]("ship_year"), r.getAs[Double]("revenue"))).toSeq
      == Seq(("NATION_11", "NATION_7", 1997, 40.0), ("NATION_7", "NATION_11", 1996, 100.0)))
  }

  test("market share: conditional numerator inside the one aggregate") {
    val region = Seq((1, "EUROPE"), (2, "ASIA")).toDF("r_regionkey", "r_name")
    val nation = Seq((100, "NATION_7", 1), (101, "NATION_5", 1), (102, "NATION_9", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((1L, 100), (2L, 101)).toDF("s_suppkey", "s_nationkey")
    val customer = Seq((7L, 101), (9L, 102)).toDF("c_custkey", "c_nationkey")
    val orders = Seq((10L, 7L, ts("1996-03-01 00:00:00")),
      (11L, 9L, ts("1996-03-01 00:00:00")))  // customer outside EUROPE
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val part = Seq((1L, "STANDARD"), (2L, "PROMO")).toDF("p_partkey", "p_type")
    val items = li(
      (10L, 1L, 1L, 1.0, 100.0, 0.0, 0.0, "N", "O", "1996-03-05 00:00:00"), // NATION_7 supp
      (10L, 1L, 2L, 1.0, 300.0, 0.0, 0.0, "N", "O", "1996-03-05 00:00:00"), // other supp
      (10L, 2L, 1L, 1.0, 999.0, 0.0, 0.0, "N", "O", "1996-03-05 00:00:00"), // wrong part type
      (11L, 1L, 1L, 1.0, 999.0, 0.0, 0.0, "N", "O", "1996-03-05 00:00:00")) // non-EUROPE cust
    val out = Tpch.tpchMarketShare(items, orders, customer, supplier, part,
      nation, region).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Int]("order_year") == 1996)
    assert(out(0).getAs[Double]("nation_revenue") == 100.0)
    assert(out(0).getAs[Double]("total_revenue") == 400.0)
    assert(out(0).getAs[Double]("mkt_share") == 0.25)
  }

  test("customer distribution: zero-order customers survive the left join") {
    val customer = Seq(7L, 8L, 9L).toDF("c_custkey")
    val orders = Seq((10L, 7L), (11L, 7L), (12L, 8L)).toDF("o_orderkey", "o_custkey")
    val out = Tpch.tpchCustomerDistribution(customer, orders).collect()
    // one customer with 2 orders, one with 1, one with 0 — all distinct counts
    assert(out.map(r => (r.getAs[Long]("c_count"), r.getAs[Long]("custdist"))).toSet
      == Set((2L, 1L), (1L, 1L), (0L, 1L)))
  }

  test("top supplier: exact-revenue ties all surface; quarter filter applies") {
    val supplier = Seq((1L, "S1"), (2L, "S2"), (3L, "S3"))
      .toDF("s_suppkey", "s_name")
    val items = li(
      (1L, 1L, 1L, 1.0, 60.0, 0.5, 0.0, "N", "O", "1996-02-01 00:00:00"),  // 30
      (2L, 1L, 2L, 1.0, 10.0, 0.0, 0.0, "N", "O", "1996-02-01 00:00:00"),  // 10
      (3L, 1L, 2L, 1.0, 20.0, 0.0, 0.0, "N", "O", "1996-03-01 00:00:00"),  // +20 = 30: tie
      (4L, 1L, 3L, 1.0, 999.0, 0.0, 0.0, "N", "O", "1996-06-01 00:00:00")) // outside quarter
    val out = Tpch.tpchTopSupplier(items, supplier).collect()
    assert(out.map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Double]("total_revenue"))).toSeq
      == Seq((1L, 30.0), (2L, 30.0)))
  }

  test("top supplier plan: the 1-row max frame broadcasts — no cartesian") {
    val plan = Tpch.tpchTopSupplier(
      Tables.lineitem(spark, "/root/testdata/sf0.001"),
      Tables.supplier(spark, "/root/testdata/sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // Catalyst folds the cross join + equality filter into a broadcast
    // HASH join on the (normalized) revenue key — the equality predicate
    // becomes the join key, so not even a nested loop remains
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("small-qty revenue: cut strictly below 20% of the part's average") {
    val part = Seq((1L, "Brand#4"), (2L, "Brand#4"), (3L, "Brand#9"))
      .toDF("p_partkey", "p_brand")
    val items = li(
      // part 1: qtys 1, 19, 40 -> avg 20, threshold 4.0 -> only qty 1 counts
      (1L, 1L, 1L, 1.0, 70.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"),
      (2L, 1L, 1L, 19.0, 100.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"),
      (3L, 1L, 1L, 40.0, 100.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"),
      // part 3: tiny qty but wrong brand
      (4L, 3L, 1L, 1.0, 999.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"))
    val out = Tpch.tpchSmallQtyRevenue(items, part).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("avg_yearly") == 10.0) // 70 / 7
    assert(out(0).getAs[Long]("n_items") == 1L)
  }

  test("small-qty revenue plan: one Window on the brand slice, no rejoin") {
    val plan = Tpch.tpchSmallQtyRevenue(
      Tables.lineitem(spark, "/root/testdata/sf0.001"),
      Tables.part(spark, "/root/testdata/sf0.001"))
      .queryExecution.executedPlan.toString
    assert("\\bWindow\\b".r.findAllIn(plan).size == 1, plan)
    // exactly one join: lineitem x brand-filtered part keys
    assert("Join".r.findAllIn(plan).size == 1, plan)
  }

  test("big-order customers: HAVING cut runs on the per-order aggregate") {
    val customer = Seq((7L, "Alice"), (8L, "Bob")).toDF("c_custkey", "c_name")
    val orders = Seq(
      (10L, 7L, ts("1996-01-01 00:00:00"), 1000.0),
      (11L, 8L, ts("1996-01-01 00:00:00"), 2000.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val items = li(
      (10L, 1L, 1L, 200.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"),
      (10L, 1L, 1L, 100.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"), // 300 > 250
      (11L, 1L, 1L, 249.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00")) // under
    val out = Tpch.tpchBigOrderCustomers(items, orders, customer).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("c_name") == "Alice")
    assert(out(0).getAs[Double]("total_qty") == 300.0)
  }

  test("bracket revenue: disjoint labeling, disjunction filter, equi-join only") {
    val part = Seq(
      (1L, "Brand#4", 10), (2L, "Brand#19", 20), (3L, "Brand#2", 30),
      (4L, "Brand#4", 40))  // size outside bracket 1
      .toDF("p_partkey", "p_brand", "p_size")
    val items = li(
      (1L, 1L, 1L, 10.0, 100.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"), // b1
      (2L, 2L, 1L, 20.0, 200.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"), // b2
      (3L, 3L, 1L, 30.0, 400.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"), // b3
      (4L, 4L, 1L, 10.0, 999.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"), // no bracket
      (5L, 1L, 1L, 45.0, 999.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00")) // qty out
    val out = Tpch.tpchBracketRevenue(items, part).collect()
    assert(out.map(r => (r.getAs[String]("bracket"), r.getAs[Double]("revenue"))).toSeq
      == Seq(("bracket_1", 100.0), ("bracket_2", 200.0), ("bracket_3", 400.0)))
    val plan = Tpch.tpchBracketRevenue(
      Tables.lineitem(spark, "/root/testdata/sf0.001"),
      Tables.part(spark, "/root/testdata/sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("part value concentration: cut against the exact grand total") {
    val items = li(
      (1L, 1L, 1L, 1.0, 700.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"),
      (2L, 2L, 1L, 1.0, 200.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"),
      (3L, 3L, 1L, 1.0, 100.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"))
    // total 1000; fraction 0.25 -> only part 1 (700) survives
    val out = Tpch.tpchPartValueConcentration(items, fraction = 0.25).collect()
    assert(out.map(r => (r.getAs[Long]("l_partkey"), r.getAs[Double]("part_value"),
      r.getAs[Double]("total_value"))).toSeq == Seq((1L, 700.0, 1000.0)))
  }

  test("min-cost supplier: per-part min, ties kept, region + slice gates") {
    val region = Seq((0, "EUROPE"), (1, "ASIA")).toDF("r_regionkey", "r_name")
    val nation = Seq((100, "FRANCE", 0), (101, "JAPAN", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((1L, "S1", 50.0, 100), (2L, "S2", 90.0, 100), (3L, "S3", 10.0, 101))
      .toDF("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    val part = Seq((5L, "STANDARD", 15), (6L, "STANDARD", 15), (7L, "PROMO", 15))
      .toDF("p_partkey", "p_type", "p_size")
    val items = li(
      (1L, 5L, 1L, 2.0, 20.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"),  // unit 10
      (2L, 5L, 2L, 4.0, 40.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"),  // unit 10: tie
      (3L, 6L, 2L, 1.0, 30.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"),  // unit 30, sole
      (4L, 5L, 3L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"),   // cheapest but JAPAN
      (5L, 7L, 1L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"))   // wrong p_type
    val out = Tpch.tpchMinCostSupplier(items, part, supplier, nation, region).collect()
    // ordered by acctbal desc: S2 (90) twice? no — S2 wins part 5 (tie with S1) and part 6
    assert(out.map(r => (r.getAs[String]("s_name"), r.getAs[Long]("p_partkey"))).toSeq
      == Seq(("S2", 5L), ("S2", 6L), ("S1", 5L)))
    assert(out(0).getAs[Double]("unit_cost") == 10.0)
    assert(out(1).getAs[Double]("unit_cost") == 30.0)
  }

  test("product profit: retail-cost proxy subtracts inside the decimal sum") {
    val part = Seq((5L, "hot gear", 100.0), (6L, "red widget", 100.0))
      .toDF("p_partkey", "p_name", "p_retailprice")
    val supplier = Seq((1L, 100)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((100, "N_A")).toDF("n_nationkey", "n_name")
    val orders = Seq((10L, ts("1996-03-01 00:00:00")), (11L, ts("1997-03-01 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val items = li(
      (10L, 5L, 1L, 2.0, 100.0, 0.0, 0.0, "N", "O", "1996-03-05 00:00:00"), // 100 - 20 = 80
      (11L, 5L, 1L, 1.0, 50.0, 0.0, 0.0, "N", "O", "1997-03-05 00:00:00"),  // 50 - 10 = 40
      (10L, 6L, 1L, 1.0, 999.0, 0.0, 0.0, "N", "O", "1996-03-05 00:00:00")) // wrong part family
    val out = Tpch.tpchProductProfit(items, part, supplier, orders, nation).collect()
    assert(out.map(r => (r.getAs[Int]("o_year"), r.getAs[Double]("sum_profit"))).toSeq
      == Seq((1997, 40.0), (1996, 80.0)))
  }

  test("ship latency priority: day bands, critical vs other, year gate") {
    val orders = Seq(
      (10L, ts("1997-01-01 00:00:00"), "1-URGENT"),
      (11L, ts("1997-01-01 00:00:00"), "5-LOW"),
      (12L, ts("1997-01-01 00:00:00"), "2-HIGH"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val items = li(
      (10L, 1L, 1L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1997-03-15 00:00:00"),  // 73d SLOW critical
      (11L, 1L, 1L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1997-02-05 00:00:00"),  // 35d MEDIUM other
      (12L, 1L, 1L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1997-01-10 00:00:00"),  // 9d FAST critical
      (10L, 1L, 1L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1998-03-15 00:00:00"))  // outside ship year
    val out = Tpch.tpchShipLatencyPriority(items, orders).collect()
    assert(out.map(r => (r.getAs[String]("latency_tier"), r.getAs[Long]("n_critical"),
      r.getAs[Long]("n_other"))).toSeq
      == Seq(("FAST", 1L, 0L), ("MEDIUM", 0L, 1L), ("SLOW", 1L, 0L)))
  }

  test("supplier part counts: flagged suppliers anti-joined, brand excluded, pairs distinct") {
    val supplier = Seq((1L, 10.0), (2L, -5.0), (3L, 20.0))
      .toDF("s_suppkey", "s_acctbal")
    val part = Seq((5L, "Brand#1", "SMALL", 3), (6L, "Brand#2", "LARGE", 9))
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    val items = li(
      (1L, 5L, 1L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"),
      (2L, 5L, 1L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"),  // dup pair
      (3L, 5L, 2L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"),  // flagged supp
      (4L, 5L, 3L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"),
      (5L, 6L, 1L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"))  // excluded brand
    val out = Tpch.tpchSupplierPartCounts(items, part, supplier).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("p_brand") == "Brand#1")
    assert(out(0).getAs[Long]("supplier_cnt") == 2L)
  }

  test("dominant part supplier: >50% of part volume, semi-join to region suppliers") {
    val region = Seq((0, "ASIA"), (1, "EUROPE")).toDF("r_regionkey", "r_name")
    val nation = Seq((100, "JAPAN", 0), (101, "FRANCE", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((1L, "S1", 100), (2L, "S2", 100), (3L, "S3", 101))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val part = Seq((5L, "red bolt"), (6L, "blue bolt")).toDF("p_partkey", "p_name")
    val items = li(
      (1L, 5L, 1L, 70.0, 1.0, 0.0, 0.0, "N", "O", "1996-05-01 00:00:00"),  // S1: 70/100
      (2L, 5L, 2L, 30.0, 1.0, 0.0, 0.0, "N", "O", "1996-05-01 00:00:00"),  // S2: 30/100
      (3L, 6L, 3L, 99.0, 1.0, 0.0, 0.0, "N", "O", "1996-05-01 00:00:00"),  // dominant but not red
      (4L, 5L, 2L, 500.0, 1.0, 0.0, 0.0, "N", "O", "1997-05-01 00:00:00")) // outside year
    val out = Tpch.tpchDominantPartSupplier(items, part, supplier, nation, region).collect()
    assert(out.map(_.getAs[String]("s_name")).toSeq == Seq("S1"))
    assert(out(0).getAs[String]("n_name") == "JAPAN")
  }

  test("waiting suppliers: only sole-late supplier on multi-supplier finished orders") {
    val nation = Seq((100, "NATION_3"), (101, "NATION_9")).toDF("n_nationkey", "n_name")
    val supplier = Seq((1L, "S1", 100), (2L, "S2", 100), (3L, "S3", 101))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val orders = Seq(
      (10L, ts("1996-01-01 00:00:00"), "F"),
      (11L, ts("1996-01-01 00:00:00"), "F"),
      (12L, ts("1996-01-01 00:00:00"), "O"),  // not finished
      (13L, ts("1996-01-01 00:00:00"), "F"))
      .toDF("o_orderkey", "o_orderdate", "o_orderstatus")
    val items = li(
      // order 10: S1 late, S2 on time -> S1 blamed
      (10L, 1L, 1L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-06-01 00:00:00"),
      (10L, 1L, 2L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-15 00:00:00"),
      // order 11: both late -> nobody blamed
      (11L, 1L, 1L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-06-01 00:00:00"),
      (11L, 1L, 2L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-06-01 00:00:00"),
      // order 12: sole-late but order not finished
      (12L, 1L, 1L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-06-01 00:00:00"),
      (12L, 1L, 2L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-15 00:00:00"),
      // order 13: single-supplier late -> no other supplier, not blamed
      (13L, 1L, 1L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-06-01 00:00:00"))
    val out = Tpch.tpchWaitingSuppliers(items, orders, supplier, nation).collect()
    assert(out.map(r => (r.getAs[String]("s_name"), r.getAs[Long]("numwait"))).toSeq
      == Seq(("S1", 1L)))
  }

  test("idle customer balance: positive-only average, anti-join on recent orders") {
    val nation = Seq((100, "N_A"), (101, "N_B")).toDF("n_nationkey", "n_name")
    val customer = Seq(
      (7L, 100, 900.0),   // above avg, no recent order: counted
      (8L, 100, 800.0),   // above avg but has recent order
      (9L, 101, 100.0),   // below avg
      (10L, 101, -500.0)) // negative: excluded from the average too
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    // avg over positives = (900 + 800 + 100) / 3 = 600
    val orders = Seq(
      (20L, 8L, ts("2001-01-01 00:00:00")),   // recent: disqualifies 8
      (21L, 7L, ts("1999-06-01 00:00:00")))   // old: does not disqualify 7
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val out = Tpch.tpchIdleCustomerBalance(customer, orders, nation).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("n_name") == "N_A")
    assert(out(0).getAs[Long]("n_customers") == 1L)
    assert(out(0).getAs[Double]("total_bal") == 900.0)
  }
}
