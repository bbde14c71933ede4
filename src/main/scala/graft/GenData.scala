package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** r9 (verdict #1/#7): fixture generator — reproduces the driver's synthetic
  * tables (TESTDATA.md / FIXTURES.md §B schemas, distributions profiled off
  * `/root/testdata/sf0.01`) at ANY scale factor and ANY seed, so the repo
  * can measure what the driver's fixed SFs cannot:
  *
  *  - **sf1 scaling slopes** — a real 10× data point above the bench SF,
  *    validating each 100 TB plan-shape argument with a measured slope
  *    (SURVEY §6); and
  *  - **seed-varied oracle fuzz** — the same schemas under different value
  *    distributions (alternate seeds), defending the hash-match surface
  *    against single-seed fixture luck the way the cross-SF audit script
  *    defends against single-SF luck.
  *
  * All randomness is hash-derived (`xxhash64(id, seed, salt)` → uniforms →
  * inverse-CDF transforms), never `rand()`: every cell is a pure function
  * of (table, id, seed), so output is bit-stable across partitionings,
  * re-runs, and cluster sizes — and generation is embarrassingly parallel
  * (no shuffle anywhere; each table is one projected range scan).
  *
  * Usage: `sbt "runMain graft.GenData <sf> <seed> <outDir> [tables]"`,
  * e.g. `runMain graft.GenData 1.0 42 target/gen/sf1`. The optional 4th
  * arg is a comma-separated table filter (r12, for the embedding-budget
  * probe: `runMain graft.GenData 30 42 target/gen/sf30emb embeddings`
  * generates 600k vectors without paying for 180M lineitem rows).
  *
  * Row counts follow the driver's observed scaling laws:
  * events sf·10⁶ (users sf·15000, 30-day span fixed), lineitem sf·6·10⁶,
  * orders sf·1.5·10⁶, customer sf·150k, supplier sf·10k, part sf·200k,
  * documents max(500, sf·50k), embeddings max(500, sf·20k); region/nation
  * fixed at 5/25 rows.
  */
object GenData {

  private val EPOCH_2024_US = 1704067200000000L // 2024-01-01T00:00:00Z
  private val EPOCH_1995_US = 788918400000000L  // 1995-01-01T00:00:00Z
  private val DAY_US = 86400000000L

  private val VOCAB = Seq("a", "agg", "batch", "big", "column", "customer",
    "data", "dup", "fast", "filter", "group", "hash", "join", "key", "line",
    "merge", "order", "part", "query", "row", "scan", "slow", "small",
    "sort", "spark", "stream", "table", "the", "value", "vector", "window")

  def main(args: Array[String]): Unit = {
    val sf = args(0).toDouble
    val seed = if (args.length > 1) args(1).toLong else 42L
    val out = if (args.length > 2) args(2) else s"target/gen/sf$sf"
    val only: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, sf, seed, out, only)
    spark.stop()
  }

  /** Hash-derived uniform in [0, 1): one per (row id, seed, salt). */
  private def u(seed: Long, salt: Int, idCol: Column = col("id")): Column =
    pmod(xxhash64(idCol, lit(seed), lit(salt)), lit(1L << 40)).cast("double") /
      lit((1L << 40).toDouble)

  /** Uniform pick from a literal string list. */
  private def pick(seed: Long, salt: Int, xs: Seq[String]): Column =
    element_at(array(xs.map(lit): _*), (u(seed, salt) * xs.length).cast("int") + 1)

  /** The table names [[generate]] knows how to produce. */
  val Tables: Set[String] = Set("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def generate(spark: SparkSession, sf: Double, seed: Long, out: String,
               only: Set[String] = Set.empty): Unit = {
    import spark.implicits._
    // r13 (r12 ADVICE): fail fast on an unknown table name — a typo like
    // 'embedding' (singular) used to make every want() false, generate
    // NOTHING, and exit 0, a silent no-op where a probe workflow expects
    // data on disk.
    val unknown = only.diff(Tables)
    require(unknown.isEmpty,
      s"GenData: unknown table name(s) ${unknown.toSeq.sorted.mkString(", ")} " +
        s"— valid names: ${Tables.toSeq.sorted.mkString(", ")}")
    def want(t: String): Boolean = only.isEmpty || only.contains(t)
    def n(base: Long): Long = math.max(1L, math.round(base * sf))
    val nEvents = n(1000000L); val nUsers = math.max(5L, n(15000L))
    val nDocs = math.max(500L, n(50000L)); val nEmb = math.max(500L, n(20000L))
    val nLine = n(6000000L); val nOrders = n(1500000L)
    val nCust = n(150000L); val nSupp = math.max(5L, n(10000L)); val nPart = n(200000L)
    val parts = math.max(8, spark.sparkContext.defaultParallelism)

    def rng(rows: Long) = spark.range(0, rows, 1, parts)

    // region / nation: fixed bounded dims, driver conventions verbatim
    if (want("region"))
      Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"), (4, "MIDDLE EAST"))
        .toDF("r_regionkey", "r_name")
        .repartition(1).write.mode("overwrite").parquet(s"$out/region.parquet")
    if (want("nation"))
      (0 until 25).map(i => (i, s"NATION_$i", i % 5))
        .toDF("n_nationkey", "n_name", "n_regionkey")
        .repartition(1).write.mode("overwrite").parquet(s"$out/nation.parquet")

    // events: ~time-ordered 30-day stream, 5 uniform types, Exp(50) values
    val spanUs = 30L * DAY_US
    if (want("events")) rng(nEvents).select(
      col("id").as("event_id"),
      timestamp_micros(lit(EPOCH_2024_US) +
        ((col("id").cast("double") / nEvents) * spanUs).cast("long") +
        (u(seed, 1) * 60000000.0).cast("long"))
        .cast("timestamp_ntz").as("ts"), // naive us — the fixture encoding
      (u(seed, 2) * nUsers).cast("long").as("user_id"),
      pick(seed, 3, Seq("click", "view", "purchase", "signup", "error")).as("event_type"),
      greatest(round(lit(-50.0) * log(lit(1.0) - u(seed, 4)), 2), lit(0.01)).as("value"),
      concat(lit("{\"k\": "), (u(seed, 5) * 100).cast("int").cast("string"), lit("}")).as("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // documents: 10–100 word texts over the fixed 31-word vocab
    val vocabArr = array(VOCAB.map(lit): _*)
    val word = (i: Column) =>
      element_at(vocabArr,
        pmod(xxhash64(col("id"), lit(seed), lit(7), i), lit(VOCAB.length)).cast("int") + 1)
    if (want("documents")) rng(nDocs).select(
      col("id").as("doc_id"),
      array_join(transform(sequence(lit(1), (lit(10) + u(seed, 6) * 90).cast("int")), word), " ").as("text"),
      when(u(seed, 8) < 0.4, "en").otherwise(pick(seed, 9, Seq("de", "es", "fr", "zh"))).as("lang"),
      concat(lit("src"), (u(seed, 10) * 20).cast("int").cast("string")).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // embeddings: 64-dim Gaussian(0, 0.125) via Box–Muller on hash uniforms
    val gauss = (i: Column) => {
      val u1 = greatest(
        pmod(xxhash64(col("id"), lit(seed), lit(11), i), lit(1L << 40)).cast("double") /
          lit((1L << 40).toDouble), lit(1e-12))
      val u2 = pmod(xxhash64(col("id"), lit(seed), lit(12), i), lit(1L << 40)).cast("double") /
        lit((1L << 40).toDouble)
      (sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2) * lit(0.125)).cast("float")
    }
    if (want("embeddings")) rng(nEmb).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)), gauss).as("embedding"),
      (u(seed, 13) * 10).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // customer / supplier / part: entity dims, TPC-H-ish naming
    if (want("customer")) rng(nCust).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      (u(seed, 14) * 25).cast("int").as("c_nationkey"),
      round(lit(-1000.0) + u(seed, 15) * 11000.0, 2).as("c_acctbal"),
      pick(seed, 16, Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")).as("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    if (want("supplier")) rng(nSupp).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      (u(seed, 17) * 25).cast("int").as("s_nationkey"),
      round(lit(-1000.0) + u(seed, 18) * 11000.0, 2).as("s_acctbal"))
      .write.mode("overwrite").parquet(s"$out/supplier.parquet")

    if (want("part")) rng(nPart).select(
      col("id").as("p_partkey"),
      concat(pick(seed, 19, Seq("cold", "small", "large", "hot", "dim", "bright", "dark", "pale")),
        lit(" "),
        pick(seed, 20, Seq("widget", "bolt", "gear", "plate", "wire", "tube", "cap", "ring"))).as("p_name"),
      concat(lit("Brand#"), ((u(seed, 21) * 25).cast("int") + 1).cast("string")).as("p_brand"),
      pick(seed, 22, Seq("STANDARD", "LARGE", "PROMO", "ECONOMY", "MEDIUM", "SMALL")).as("p_type"),
      ((u(seed, 23) * 50).cast("int") + 1).as("p_size"),
      round(lit(900.0) + pmod(col("id"), lit(1000)).cast("double") * 0.1, 1).as("p_retailprice"))
      .write.mode("overwrite").parquet(s"$out/part.parquet")

    // orders: uniform custkey, 1995..mid-2001 dates
    val orderSpanDays = 2404
    if (want("orders")) rng(nOrders).select(
      col("id").as("o_orderkey"),
      (u(seed, 24) * nCust).cast("long").as("o_custkey"),
      pick(seed, 25, Seq("P", "O", "F")).as("o_orderstatus"),
      round(lit(1000.0) + u(seed, 26) * 499000.0, 2).as("o_totalprice"),
      timestamp_micros(lit(EPOCH_1995_US) +
        (u(seed, 27) * orderSpanDays).cast("long") * DAY_US)
        .cast("timestamp_ntz").as("o_orderdate"),
      pick(seed, 28, Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")).as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    // lineitem: each line picks its order uniformly (lines-per-order is
    // then Binomial(nLine, 1/nOrders) ≈ Poisson(4) incl. zero-line orders,
    // matching the driver's histogram); shipdate independent of orderdate
    val shipSpanDays = 2498
    if (want("lineitem")) rng(nLine).select(
      (u(seed, 29) * nOrders).cast("long").as("l_orderkey"),
      (u(seed, 30) * nPart).cast("long").as("l_partkey"),
      (u(seed, 31) * nSupp).cast("long").as("l_suppkey"),
      (pmod(xxhash64(col("id"), lit(seed), lit(32)), lit(7)).cast("int") + 1).as("l_linenumber"),
      ((u(seed, 33) * 50).cast("int") + 1).cast("double").as("l_quantity"),
      round(lit(900.0) + u(seed, 34) * 104100.0, 2).as("l_extendedprice"),
      round(u(seed, 35) * 0.1, 2).as("l_discount"),
      round(u(seed, 36) * 0.08, 2).as("l_tax"),
      pick(seed, 37, Seq("A", "N", "R")).as("l_returnflag"),
      pick(seed, 38, Seq("O", "F")).as("l_linestatus"),
      timestamp_micros(lit(EPOCH_1995_US) + DAY_US +
        (u(seed, 39) * shipSpanDays).cast("long") * DAY_US)
        .cast("timestamp_ntz").as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    println(s"generated sf=$sf seed=$seed at $out: events=$nEvents lineitem=$nLine " +
      s"orders=$nOrders customer=$nCust part=$nPart docs=$nDocs emb=$nEmb")
  }
}
