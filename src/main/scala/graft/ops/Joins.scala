package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Det._

/** Join operators (SURVEY.md §2.4, J1–J6).
  *
  * Strategy notes for scale: dimension joins broadcast (no shuffle of the
  * fact side); the as-of join is the union+last_value formulation — one
  * shuffle on the key, no cross join, scales linearly with input unlike the
  * naive interval cross-join.
  */
object Joins {

  /** J1: fact ⋈ broadcast dimension, left-outer so unknown keys survive with
    * NULLs (node_dict.get(node, (None,None)), AIRWISEv0.py:41-49,122). */
  def joinBroadcastDim(lineitem: DataFrame, supplier: DataFrame): DataFrame =
    lineitem
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"), "left_outer")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"), col("s_name"))
      .orderBy("l_orderkey", "l_linenumber", "l_suppkey")

  /** J2: dimension = latest record per key (last-writer-wins dict upsert,
    * AIRWISEv0.py:239-254), then enrich the fact stream with it.
    *
    * No broadcast hint: the dim is derived from the fact table, so its size
    * is the key cardinality — unbounded as data grows. AQE picks broadcast
    * at runtime when the dim is actually small, and falls back to a shuffle
    * join when it isn't; a forced hint would OOM at 100× users. */
  def joinLatestDim(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val dim = events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("latest_type"),
        col("ts").as("latest_ts"))
    events
      .join(dim, Seq("user_id"), "left_outer")
      .select(col("event_id"), col("user_id"), col("latest_type"),
        fmtTs(col("latest_ts")).as("latest_ts_s"))
      .orderBy("event_id")
  }

  /** J3: align two sources on a shared time axis by hour bucket
    * (graphdata.py:98-192) — the deterministic form of an as-of join. */
  def joinTimeseriesAlign(events: DataFrame): DataFrame = {
    def hourly(tpe: String, alias: String): DataFrame =
      events.filter(col("event_type") === tpe)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(davg(col("value")).as(alias))
    hourly("click", "click_avg")
      .join(hourly("purchase", "purchase_avg"), Seq("hour"))
      .select(fmtTsSec(col("hour")).as("hour_s"), col("click_avg"), col("purchase_avg"))
      .orderBy("hour_s")
  }

  /** J3 breadth: the reference's full-width comparison analytics
    * (graphdata.py:98-192 overlays six metrics across sources on one time
    * axis). One hash aggregation produces every aligned series — a
    * conditional average per event type plus the row count — instead of
    * N filtered aggregations joined N ways: one shuffle on the hour key
    * total, partial/final map-side combine, no join at all. At 100 TB the
    * N-way self-join form scans the fact table N times and shuffles N
    * aggregates; this form is one scan, one shuffle, regardless of N. */
  def joinTimeseriesAlignMulti(events: DataFrame): DataFrame = {
    val types = Seq("click", "purchase", "view", "signup", "error")
    val aligned = types.map(t =>
      davg(when(col("event_type") === t, col("value"))).as(s"${t}_avg"))
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(aligned.head, aligned.tail :+ count(lit(1)).as("n_events"): _*)
      .select(Seq(fmtTsSec(col("hour")).as("hour_s")) ++
        types.map(t => col(s"${t}_avg")) :+ col("n_events"): _*)
      .orderBy("hour_s")
  }

  /** J4: as-of join — for each purchase, the latest click at or before it,
    * per user (graphdata.py:100-104 nearest-sample alignment).
    *
    * Formulation: union both sides tagged, one window pass per user ordered
    * by (ts, side, id), carry the last non-null click via
    * last(_, ignoreNulls=true), keep purchase rows. One shuffle on user_id,
    * no cross join — survives 100× scale-up where an interval join explodes.
    */
  def joinAsofNearest(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").as("click_value"), lit(0).as("side"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(null).cast("double").as("click_value"), lit(1).as("side"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE running-last over a struct of the click row: value and ts are
    // always taken from the SAME matched click (two independent
    // last(ignoreNulls) exprs would pick different rows when a click's
    // value is NULL — r4 advice item).
    clicks.unionByName(purchases)
      .withColumn("lc", last(
        when(col("side") === 0, struct(col("ts"), col("click_value"))),
        ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), fmtTs(col("ts")).as("ts_s"),
        col("lc.click_value").as("last_click_value"),
        fmtTs(col("lc.ts")).as("last_click_ts_s"))
      .orderBy("event_id")
  }

  /** J4d (r4): as-of join with a staleness tolerance — the enrichment
    * variant every real feature pipeline wants: the most recent click
    * before each purchase counts only if it is at most `tolUs` old,
    * otherwise the purchase reports no (fresh) context rather than a
    * context from hours ago. Same union + running-`last` linear form as
    * [[joinAsofNearest]] (one window shuffle on the user key, no range
    * join), with the tolerance applied as a null-out AFTER the as-of
    * match — semantically "match then age-gate", which is what ASOF
    * tolerance means (a stale match does NOT fall back to an older,
    * even staler one). */
  def joinAsofTolerance(events: DataFrame, tolUs: Long = 600000000L): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").as("click_value"), lit(0).as("side"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(null).cast("double").as("click_value"), lit(1).as("side"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // same single-struct carry as joinAsofNearest: one matched click row
    clicks.unionByName(purchases)
      .withColumn("lc", last(
        when(col("side") === 0, struct(col("ts"), col("click_value"))),
        ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .withColumn("age_us", unix_micros(col("ts")) - unix_micros(col("lc.ts")))
      .withColumn("fresh", col("age_us") <= tolUs)
      .select(col("event_id"), col("user_id"), fmtTs(col("ts")).as("ts_s"),
        when(col("fresh"), col("lc.click_value")).as("click_value"),
        when(col("fresh"), col("age_us")).as("click_age_us"))
      .orderBy("event_id")
  }

  /** J4e (r4): FORWARD as-of join — for each purchase, the EARLIEST click
    * at or after it per user (the attribution question "what did they do
    * NEXT", where [[joinAsofNearest]] answers "what led here"). Same
    * union + linear-window form, mirrored: `first(_, ignoreNulls)` over
    * the (currentRow, unboundedFollowing) frame ordered by (ts, side)
    * with purchases BEFORE clicks at equal ts, so an exactly-simultaneous
    * click still counts as "at". One user-key shuffle, no range join. */
  def joinAsofForward(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(null).cast("double").as("click_value"), lit(0).as("side"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").as("click_value"), lit(1).as("side"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // single-struct carry (mirror of joinAsofNearest): value and ts come
    // from the same earliest click row even when its value is NULL
    purchases.unionByName(clicks)
      .withColumn("nc", first(
        when(col("side") === 1, struct(col("ts"), col("click_value"))),
        ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select(col("event_id"), col("user_id"), fmtTs(col("ts")).as("ts_s"),
        col("nc.click_value").as("next_click_value"),
        fmtTs(col("nc.ts")).as("next_click_ts_s"))
      .orderBy("event_id")
  }

  /** Range join against a (tiny) tier table: classify each reading into
    * the [lo, hi) band it falls in — the sensor-threshold banding the
    * reference hardcodes as if/elif chains (AIRWISEv0.py:165-168 routing,
    * alert thresholds AIRWISEv0.py:20). Non-equi joins can't hash; the
    * scale-correct form when one side is a handful of band rows is a
    * broadcast nested-loop with the FACT side streaming in place — no
    * shuffle of the big side, work linear in facts × bands. (If both sides
    * were large, the standard trick is banding both sides to a common
    * bucket grid and equi-joining on bucket — overkill for a bounded tier
    * dimension.) left_outer keeps out-of-band readings with a NULL tier. */
  def joinRangeTier(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val tiers = Seq(
      ("low", 0.0, 50.0),
      ("mid", 50.0, 200.0),
      ("high", 200.0, 1000000.0)
    ).toDF("tier", "lo", "hi")
    events
      .join(broadcast(tiers), col("value") >= col("lo") && col("value") < col("hi"),
        "left_outer")
      .select(col("event_id"), col("value"), col("tier"))
      .orderBy("event_id")
  }

  /** Big-big range join, banded: for every purchase, count the same
    * user's clicks within ±tolerance — the two-large-sides interval join
    * [[joinRangeTier]]'s doc promises. A naive interval join is a
    * cross-join-with-filter (quadratic); the scale form bands time into
    * tolerance-width buckets: each click lands in ONE bucket, each
    * purchase probes its bucket ±1 (any in-tolerance pair differs by at
    * most one bucket), and the (user, bucket) EQUI-join co-locates
    * candidates before the exact |Δt| filter. Work is linear in rows ×
    * bucket occupancy, shuffle is a plain hash partition — survives 100×
    * where the interval cross-join explodes. Each click has exactly one
    * bucket, so no candidate pair is generated twice (no dedup pass). */
  def joinIntervalBucket(events: DataFrame, toleranceMin: Int = 5): DataFrame = {
    val tolUs = toleranceMin * 60L * 1000000L
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("c_us"))
      .withColumn("bucket", floor(col("c_us") / tolUs))
    val probes = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
      .withColumn("pb", floor(col("p_us") / tolUs))
      .withColumn("bucket", explode(array(col("pb") - 1, col("pb"), col("pb") + 1)))
    probes.join(clicks, Seq("user_id", "bucket"), "left_outer")
      .groupBy(col("event_id"))
      // tolerance folded into the count, not a filter: a purchase whose
      // candidates are ALL out of tolerance must still appear with n = 0
      .agg(count(when(abs(col("c_us") - col("p_us")) <= tolUs, col("c_us")))
        .as("n_nearby_clicks"))
      .orderBy("event_id")
  }

  /** J8 (r4): time-series gap filling with forward fill — the canonical
    * sparse-sensor op (the reference's nodes report irregularly;
    * graphdata.py plots them on a shared axis, which implicitly
    * interpolates). Join-free form: each observed hourly row generates
    * itself PLUS the gap hours up to (but excluding) the node's next
    * observation (`lead` + `explode(sequence)`), carrying its
    * forward-filled value with it — so the spine materializes as a
    * map-side Generate instead of a min/max aggregate + spine equi-join.
    * One hourly hash agg + one (user) window = the whole op; at 100 TB
    * the gap rows never participate in any shuffle, they are born
    * downstream of the last exchange. `filled0` (last non-null over the
    * observed rows) rather than the row's own avg keeps the semantics
    * exact when an hourly group aggregates to NULL. */
  def tsFillGaps(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(davg(col("value")).as("avg_value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
    hourly
      .withColumn("filled0", last(col("avg_value"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("next_hour", lead(col("hour"), 1).over(w))
      .select(col("user_id"), col("hour"), col("avg_value"), col("filled0"),
        explode(sequence(col("hour"),
          coalesce(col("next_hour") - expr("interval 1 hour"), col("hour")),
          expr("interval 1 hour"))).as("h"))
      .select(col("user_id"), fmtTsSec(col("h")).as("hour_s"),
        when(col("h") === col("hour"), col("avg_value")).as("avg_value"),
        col("filled0").as("filled_value"),
        when(col("h") === col("hour"), col("avg_value")).isNull.as("is_gap"))
      .orderBy("user_id", "hour_s")
  }

  /** J8b (r5): hourly resampling with LINEAR interpolation — the
    * interpolating sibling of [[tsFillGaps]]'s forward fill, and exactly
    * what the reference's overlaid plots do visually when matplotlib
    * draws a line across a reporting gap (`graphdata.py:98-112`). Same
    * join-free Generate shape: each observed hourly sample emits itself
    * plus the gap hours up to its user's next sample, carrying BOTH
    * anchors (`lead` value + hour index), so every interpolated row is
    * born map-side downstream of the last exchange — no spine join at
    * any scale. The interpolated value `v + (next_v − v) · (k/m)` is a
    * fixed chain of correctly-rounded double ops (the fraction is one
    * integer/integer divide on hour indices), mirrored verbatim in the
    * oracle ⇒ hash-match. No extrapolation past a user's last sample —
    * interpolation needs both anchors (the trailing-edge fill is
    * [[tsFillGaps]]'s forward-fill job). */
  def tsResampleLinear(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("user_id"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hu"))
      .agg(davg(col("value")).as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hu"))
    hourly
      .withColumn("next_hu", lead(col("hu"), 1).over(w))
      .withColumn("next_v", lead(col("v"), 1).over(w))
      .select(col("user_id"), col("hu"), col("v"), col("next_hu"), col("next_v"),
        explode(sequence(col("hu"),
          coalesce(col("next_hu") - lit(1L), col("hu")))).as("h"))
      .select(col("user_id"),
        fmtTsSec(timestamp_seconds(col("h") * lit(3600L))).as("hour_s"),
        when(col("h") === col("hu"), col("v"))
          .otherwise(col("v") + (col("next_v") - col("v")) *
            ((col("h") - col("hu")).cast("double") /
              (col("next_hu") - col("hu")).cast("double"))).as("value_interp"),
        (col("h") =!= col("hu")).as("is_interp"))
      .orderBy("user_id", "hour_s")
  }

  /** J5: semi join — keys present in the other set (heartbeat ∩ dim,
    * AIRWISEv0.py:80-87). */
  def joinSemiActiveNodes(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** J6: anti join — keys absent from the dimension (the NULL-longname case,
    * AIRWISEv0.py:122 default branch). */
  def joinAntiUnknownNodes(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** J7 (r4): snapshot reconcile — the CDC-style diff of two per-key
    * state snapshots (here: each node's activity before vs after a
    * cutoff), classifying every key as added / removed / changed / same.
    * This is the one FULL OUTER equi-join in the library: both snapshot
    * aggregates map-side combine before their user_id shuffle, the join
    * reuses that same key (no extra exchange under AQE), and the
    * classification is a null-pattern CASE — no driver-side diffing, so
    * a 100 TB snapshot pair reconciles as two aggs + one sort-merge
    * join. */
  /** J7 (r4): blocked fuzzy join — record linkage over a dirty string key
    * (the reference keys nodes by free-text `longname`,
    * AIRWISEv0.py:248-251; renames/typos fragment per-name groupings).
    * Scale-true shape: similarity runs on the DISTINCT-name VOCABULARY
    * (the first hash agg collapses the facts; name vocabularies are
    * orders of magnitude smaller than fact tables), blocked on the first
    * token so each block compares vocab²/blocks candidates, never
    * all-pairs — the standard blocking+verify linkage plan. The verify
    * predicate is `levenshtein` — pure integer arithmetic, identical in
    * both engines, so every matched pair hash-matches. Per-name row
    * counts ride along from the same agg (no second scan). */
  def joinFuzzyBlocked(part: DataFrame, maxDist: Int = 3): DataFrame = {
    val names = part.groupBy(col("p_name")).agg(count(lit(1)).as("n_rows"))
      .withColumn("blk", split(col("p_name"), " ").getItem(0))
    val a = names.select(col("p_name").as("name_a"), col("n_rows").as("n_a"), col("blk"))
    val b = names.select(col("p_name").as("name_b"), col("n_rows").as("n_b"), col("blk"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"), col("n_a"), col("n_b"))
      .orderBy("name_a", "name_b")
  }

  /** J9 (r4): bloom-prefiltered shuffle join — the runtime-filter pattern
    * for a dimension too big to BROADCAST whose key fingerprint is still
    * tiny: build a k-hash bloom over the dim's join keys (m=2^16 bits =
    * 8 KB regardless of dim width), ship it as a plan literal, and drop
    * non-matching fact rows MAP-SIDE before the join's shuffle. Bloom
    * filters have no false negatives, so the exact equi-join that follows
    * returns exactly the unfiltered join's rows; false positives only
    * cost shuffle bytes (≈(nk/m)^k ⇒ ≪1% here). At 100 TB this is the
    * difference between shuffling the whole fact table and shuffling the
    * ~match fraction of it. Spark's own runtime bloom filter
    * (spark.sql.optimizer.runtime.bloomFilter.*) only arms past 10 MB
    * creation-side thresholds and is AQE-heuristic; this is the explicit
    * always-on form with a PORTABLE hash family (4×16-bit md5 slices —
    * the same deterministic family as the MinHash/KMV sketches).
    * Driver traffic: the ≤ m/64 = 1024-row word table (8 KB, bounded by
    * construction — the same boundedness class as IVF's centroid
    * collect). The dim side is intentionally NOT hint-broadcast: the
    * operator models the dim-too-big-to-broadcast regime; AQE may still
    * pick broadcast at fixture scale, which changes nothing about the
    * map-side prefilter. */
  /** Build a portable bloom membership predicate from the distinct values
    * of `keys(keyCol)`: k md5-slice hash positions per key OR'd into an
    * mBits bitmap, returned as a `Column => Column` check that evaluates
    * entirely map-side (the bitmap ships in the plan as an 8 KB array
    * literal). No false negatives ever; false-positive rate ≈ (nk/m)^k.
    * Driver traffic: the ≤ mBits/64-row word table (bounded by
    * construction — the same boundedness class as IVF's centroid
    * collect). */
  def bloomPredicate(keys: DataFrame, keyCol: String,
                     mBits: Int = 1 << 16, kHashes: Int = 4): Column => Column = {
    require(Integer.bitCount(mBits) == 1 && mBits <= (1 << 16),
      "mBits must be a power of two ≤ 2^16 (each hash reads one 4-hex-char slice)")
    // hash family: k independent 16-bit slices of md5(key), masked to mBits
    def positions(key: Column): Seq[Column] =
      (0 until kHashes).map { i =>
        conv(substring(md5(key.cast("string")), i * 4 + 1, 4), 16, 10)
          .cast("long").bitwiseAND(lit((mBits - 1).toLong))
      }
    val setBit = call_function("shiftleft", lit(1L),
      col("pos").bitwiseAND(lit(63L)).cast("int"))
    val words = keys
      .select(explode(array(positions(col(keyCol)): _*)).as("pos"))
      .select(shiftright(col("pos"), 6).cast("int").as("w"), setBit.as("bit"))
      .groupBy(col("w")).agg(expr("bit_or(bit)").as("word"))
      .collect() // bounded: ≤ mBits/64 rows (1024 longs = 8 KB)
    val lut = Array.fill(mBits / 64)(0L)
    words.foreach(r => lut(r.getInt(0)) = r.getLong(1))
    val lutCol = lit(lut)
    key => positions(key).map { p =>
      val word = element_at(lutCol, shiftright(p, 6).cast("int") + lit(1))
      val mask = call_function("shiftleft", lit(1L),
        p.bitwiseAND(lit(63L)).cast("int"))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
  }

  def joinBloomPrefilter(orders: DataFrame, customer: DataFrame,
                         mBits: Int = 1 << 16, kHashes: Int = 4): DataFrame = {
    val dim = customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    val mightContain = bloomPredicate(dim, "c_custkey", mBits, kHashes)
    orders
      .filter(mightContain(col("o_custkey")))
      .join(dim, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
      .orderBy("o_orderkey")
  }

  /** J11 (r4): star-schema rollup — the multi-hop dimensional query every
    * warehouse runs (fact → customer → nation → region revenue rollup;
    * the reference's node→longname enrichment, AIRWISEv0.py:41-49, is
    * the 1-hop special case). All three dimension hops are hint-kept
    * broadcasts (each genuinely bounded: dims grow with entities, not
    * events), so the fact side streams through three map-side hash joins
    * unshuffled and first shuffles at the final (region, nation)
    * rollup — one exchange total at any fact-table size. */
  def joinStarRollup(orders: DataFrame, customer: DataFrame,
                     nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
      .orderBy("r_name", "n_name")

  def snapshotDiff(events: DataFrame): DataFrame = {
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    def snap(df: DataFrame, n: String, lastTs: String): DataFrame =
      df.groupBy(col("user_id"))
        .agg(count(lit(1)).as(n), max(col("ts")).as(lastTs))
    val before = snap(events.filter(col("ts") < cut), "n_before", "last_before")
    val after  = snap(events.filter(col("ts") >= cut), "n_after", "last_after")
    before.join(after, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        fmtTs(col("last_before")).as("last_before_s"),
        fmtTs(col("last_after")).as("last_after_s"),
        when(col("n_before").isNull, "added")
          .when(col("n_after").isNull, "removed")
          .when(col("n_before") === col("n_after"), "same")
          .otherwise("changed").as("status"))
      .orderBy("user_id")
  }

  /** r5c2: snapshot upsert — the lakehouse MERGE INTO, batch form: apply a
    * changeset (latest post-cutoff state per key) onto a base snapshot
    * (latest pre-cutoff state), emitting the MERGED table with per-row
    * actions. [[snapshotDiff]] reports what differs; this produces the new
    * snapshot — the operation every SCD-1 dimension refresh runs. One
    * window per side collapses events to per-key state (both on the
    * user_id shuffle), then the library's FULL OUTER equi-join pattern +
    * null-pattern CASE: inserted (no base) / updated (both) / kept (no
    * change row). Values ride untouched (selections only) ⇒ hash-match. */
  def snapshotUpsert(events: DataFrame): DataFrame = {
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    def latest(df: DataFrame, vName: String, tName: String): DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("value").as(vName), col("ts").as(tName))
    }
    val base = latest(events.filter(col("ts") < cut), "base_value", "base_ts")
    val delta = latest(events.filter(col("ts") >= cut), "delta_value", "delta_ts")
    base.join(delta, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        when(col("base_ts").isNull, "inserted")
          .when(col("delta_ts").isNull, "kept")
          .otherwise("updated").as("action"),
        coalesce(col("delta_value"), col("base_value")).as("value"),
        fmtTs(coalesce(col("delta_ts"), col("base_ts"))).as("state_ts_s"),
        col("base_value").as("prev_value"))
      .orderBy("user_id")
  }

  /** r5c2: largest-triangle-one-bucket plot downsampling — keep, per
    * (user, hour), the point forming the largest triangle with its
    * neighbor buckets' centroids: what the reference's matplotlib charts
    * do implicitly when they rasterize 60 k points into 800 pixels
    * (`graphdata.py:98-192`), made an explicit operator so dashboards pull
    * ~n_buckets rows instead of the raw series. The ONE-bucket variant
    * (fixed neighbor centroids) is used deliberately: canonical LTTB
    * chains each choice into the next bucket — inherently sequential —
    * while LTOB ranks every point independently ⇒ embarrassingly
    * parallel AND engine-portable. Exactness: centroids from exact
    * integer sums (micros, 2-dp-value cents) divided once; the area is a
    * fixed 7-op double chain off those; ranks total-ordered (area desc,
    * ts, event_id). Edge buckets (no prev/next centroid) keep their
    * first/last point — the LTTB endpoint convention. Plan: one hash agg
    * + neighbor lag/lead on the tiny bucket frame (broadcast back), three
    * same-partition windows on the (user, bucket) key. */
  def tsDownsampleLtob(events: DataFrame): DataFrame = {
    val hourUs = 3600L * 1000000L
    val pts = events.select(col("user_id"), col("event_id"),
      expr("unix_micros(ts)").as("x"), col("value").as("y"),
      expr(s"unix_micros(ts) div $hourUs").as("bucket"))
    val cents = pts.groupBy(col("user_id"), col("bucket"))
      .agg((sum(col("x").cast(DecimalType(38, 0))).cast("double") /
        count(lit(1))).as("cx"), davg(col("y")).as("cy"))
    val wB = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
    val nbr = cents
      .withColumn("lx", lag(col("cx"), 1).over(wB))
      .withColumn("ly", lag(col("cy"), 1).over(wB))
      .withColumn("rx", lead(col("cx"), 1).over(wB))
      .withColumn("ry", lead(col("cy"), 1).over(wB))
      .select(col("user_id"), col("bucket"), col("lx"), col("ly"),
        col("rx"), col("ry"))
    val area = abs((col("lx") - col("rx")) * (col("y") - col("ly")) -
      (col("lx") - col("x").cast("double")) * (col("ry") - col("ly")))
    val wP = Window.partitionBy(col("user_id"), col("bucket"))
    val picked = pts.join(nbr, Seq("user_id", "bucket"))
      .withColumn("area", area)
      .withColumn("rn_area", row_number().over(
        wP.orderBy(col("area").desc, col("x"), col("event_id"))))
      .withColumn("rn_first", row_number().over(
        wP.orderBy(col("x"), col("event_id"))))
      .withColumn("rn_last", row_number().over(
        wP.orderBy(col("x").desc, col("event_id").desc)))
      .filter(
        when(col("lx").isNull, col("rn_first") === 1)
          .when(col("rx").isNull, col("rn_last") === 1)
          .otherwise(col("rn_area") === 1))
    picked
      .select(col("user_id"), col("bucket"), col("event_id"),
        fmtTs(timestamp_micros(col("x"))).as("ts_s"), col("y").as("value"),
        col("area"))
      .orderBy("user_id", "bucket")
  }

  /** r6 (verdict #8): CANONICAL largest-triangle-three-buckets next to
    * [[tsDownsampleLtob]]'s parallel one-bucket variant, completing the
    * downsample family (`graphdata.py:98-192` is the behavioral anchor).
    * Canonical LTTB chains selections: the point kept in bucket i forms
    * the triangle anchor for bucket i+1's choice against bucket i+2's
    * centroid — inherently sequential per series, which is WHY the
    * one-bucket variant exists as the embarrassingly-parallel default.
    *
    * Spark shape: this is the repo's one deliberate `mapPartitions`
    * (SURVEY §7.1 preference (d) — composition, Expression and custom
    * plan all cannot express a per-series sequential fold without a
    * global sort). Rows hash-partition on user_id and sort within
    * partitions on (user_id, x, event_id), so each series streams
    * through the chain IN ORDER with memory bounded by TWO buckets
    * (candidates of bucket i are held only until bucket i+1's centroid
    * completes) — never the series, never the partition. At 100 TB the
    * shape is one shuffle + a linear scan per partition.
    *
    * Exactness: bucket centroids use the exact integer/decimal sums of
    * the LTOB contract (micros in DECIMAL(38,0), values in
    * DECIMAL(28,6) with Spark's HALF_UP double→decimal cast, replicated
    * here via java.math.BigDecimal.valueOf(_).setScale(6, HALF_UP));
    * the triangle area is the same fixed 7-op double chain spelled
    * identically in the oracle's recursive CTE; ties break (area desc,
    * x, event_id). Endpoints keep the series' first/last point (the
    * LTTB convention); a single-bucket series keeps its first point. */
  def tsDownsampleLttb(events: DataFrame): DataFrame = {
    val hourUs = 3600L * 1000000L
    val spark = events.sparkSession
    import spark.implicits._
    val pts = events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        expr("unix_micros(ts)").as("x"), col("value").cast("double").as("y"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("x"), col("event_id"))
      .as[(Long, Long, Long, Double)]
    val picked = pts.mapPartitions(rows => Lttb.run(rows, hourUs))
    picked.toDF("user_id", "bucket", "event_id", "x", "y", "area")
      .select(col("user_id"), col("bucket"), col("event_id"),
        fmtTs(timestamp_micros(col("x"))).as("ts_s"), col("y").as("value"),
        col("area"))
      .orderBy("user_id", "bucket")
  }

  /** r5c: interval union — merge each user's overlapping presence
    * intervals (event time padded to [t, t+30 min)) into maximal
    * episodes. The gaps-and-islands sibling of [[graft.ext.Sessions]]'
    * gap sessionization: sessions split on inter-EVENT gaps, interval
    * union merges on interval OVERLAP, so a chain of half-overlapping
    * intervals fuses into one episode even when consecutive starts are
    * further apart than any fixed gap. Algorithm: a new island starts
    * where the interval's start exceeds the running max of all previous
    * ends (running max + running conditional sum over ONE (user, time)
    * window — no self-join, no spine); island ids then group to
    * (start, end, n) rows. Every comparison is exact integer epoch
    * micros, so the output hash-matches any engine. One window + one
    * hash agg, both on the user key. */
  def tsIntervalUnion(events: DataFrame, padMinutes: Int = 30): DataFrame = {
    val padUs = padMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("s_us"), col("event_id"))
    val iv = events.select(col("user_id"), col("event_id"),
      expr("unix_micros(ts)").as("s_us"),
      (expr("unix_micros(ts)") + lit(padUs)).as("e_us"))
    iv
      .withColumn("prev_max_end", max(col("e_us"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("is_new", when(col("prev_max_end").isNull ||
        col("s_us") > col("prev_max_end"), 1L).otherwise(0L))
      .withColumn("island", sum(col("is_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("s_us")).as("start_us"), max(col("e_us")).as("end_us"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("island"), col("start_us"), col("end_us"),
        expr("(end_us - start_us) div 1000000").as("duration_s"),
        col("n_events"))
      .orderBy("user_id", "island")
  }

  /** r6: 1-D Kalman smoother per series — the classic online filter for
    * noisy sensor streams (constant-state model: process noise `q`,
    * measurement noise `r`), the statistically-grounded sibling of
    * [[graft.ops.Windows.windowMovingAvg]]'s fixed-window smoothing and
    * the stream EWMA (`stream/Smooth.scala`): the gain adapts to the
    * filter's own variance instead of a fixed alpha. Inherently
    * sequential per series — state (x̂, P) chains row to row — so it
    * rides the [[tsDownsampleLttb]] shape: hash-partition on the series
    * key, sort within partitions, one O(1)-state linear scan per
    * partition (`mapPartitions`, SURVEY §7.1 preference (d)).
    *
    * Exactness: every step is the fixed 4-op chain P⁻=P+q;
    * K=P⁻/(P⁻+r); x̂′=x̂+K·(z−x̂); P′=(1−K)·P⁻ — each op correctly
    * rounded, spelled token-for-token in the oracle's recursive CTE, so
    * the filtered series hash-matches bit for bit. Init: x̂₀ = first
    * measurement, P₀ = r, gain NULL (nothing to smooth yet). */
  def tsKalmanFilter(events: DataFrame, q: Double = 0.05, r: Double = 4.0): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val pts = events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        expr("unix_micros(ts)").as("xus"), col("value").cast("double").as("z"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("xus"), col("event_id"))
      .as[(Long, Long, Long, Double)]
    val filtered = pts.mapPartitions { it =>
      var curUser = 0L
      var have = false
      var x = 0.0
      var p = 0.0
      it.map { case (u, id, xus, z) =>
        if (!have || u != curUser) {
          curUser = u; have = true
          x = z; p = r
          (u, id, xus, z, x, p, None: Option[Double])
        } else {
          val pPred = p + q
          val k = pPred / (pPred + r)
          x = x + k * (z - x)
          p = (1.0 - k) * pPred
          (u, id, xus, z, x, p, Some(k))
        }
      }
    }
    filtered.toDF("user_id", "event_id", "xus", "z", "x_filt", "p_var", "gain")
      .select(col("event_id"), col("user_id"),
        fmtTs(timestamp_micros(col("xus"))).as("ts_s"),
        col("z").as("value"), col("x_filt"), col("p_var"), col("gain"))
      .orderBy("event_id")
  }

  /** r7: numeric BAND join — click↔purchase events in the same hour whose
    * values agree within ε (5 cents): the "did this interaction price-match
    * that conversion" probe, and the missing member of the non-equi family
    * (asof = nearest in time, range = containment, interval = overlap —
    * this is |Δvalue| ≤ ε). The naive spelling is a θ-join (quadratic per
    * hour); here both sides quantize to integer cents (exact two-engine
    * rounding, the `stat_moments_per_type` contract) and bucket by
    * width-ε truncating division — any two values within ε land in the
    * same or adjacent buckets (buckets are contiguous ordered intervals
    * of width ≥ ε), so probing 3 bucket offsets via EQUI-join covers all
    * matches with no duplicates (each pair meets at exactly one probed
    * (offset, bucket) since the build side's bucket is a single value).
    * Candidates are Θ(matches + near-misses in adjacent buckets), never
    * occupancy². Rolled up per hour; the mean |Δ| divides once at the
    * edge via the split cast. */
  def joinBandNumeric(events: DataFrame, epsCents: Long = 5L): DataFrame = {
    val dec = DecimalType(38, 0)
    def idiv(a: Column, b: Column) = call_function("div", a, b)
    val base = events.filter(col("value").isNotNull)
      .select(expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hu"),
        col("event_type"), col("event_id"),
        (col("value").cast(DecimalType(28, 2)) * 100).cast(dec).cast("long").as("c"))
    val probe = base.filter(col("event_type") === "click")
      .select(col("hu"), col("event_id").as("ida"), col("c").as("ca"))
      .withColumn("off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("bkt", idiv(col("ca"), lit(epsCents)) + col("off"))
    val build = base.filter(col("event_type") === "purchase")
      .select(col("hu").as("hub"), col("event_id").as("idb"),
        col("c").as("cb"), idiv(col("c"), lit(epsCents)).as("bktb"))
    probe.join(build,
        col("hu") === col("hub") && col("bkt") === col("bktb"))
      .filter(abs(col("ca") - col("cb")) <= epsCents)
      .groupBy(col("hu"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(abs(col("ca") - col("cb")).cast(dec)).as("sd"))
      .select(col("hu"), col("n_pairs"),
        col("sd").cast("long").as("sum_absdiff_cents"),
        (graft.Det.decToDouble(col("sd")) / col("n_pairs")).as("avg_absdiff_cents"))
      .orderBy("hu")
  }
}

/** The sequential LTTB chain behind [[Joins.tsDownsampleLttb]]: consumes a
  * partition's rows sorted by (user_id, x, event_id) and emits one selected
  * point per (user, hourly bucket), holding at most two buckets in memory.
  * Input tuples are (user_id, event_id, x_micros, y); output tuples are
  * (user_id, bucket, event_id, x_micros, y, area — None for the endpoint
  * selections, which are kept by convention, not by triangle area). */
private[ops] object Lttb {
  private type Pt = (Long, Long, Double)               // (x, event_id, y)
  private type Out = (Long, Long, Long, Long, Double, Option[Double])

  def run(rows: Iterator[(Long, Long, Long, Double)], hourUs: Long): Iterator[Out] =
    new Iterator[Out] {
      private val in = rows.buffered
      private val out = scala.collection.mutable.Queue.empty[Out]
      private var curUser = 0L
      private var haveUser = false
      private var anchorX = 0.0
      private var anchorY = 0.0
      private var pend: Vector[Pt] = null              // bucket awaiting next centroid
      private var pendBucket = 0L

      override def hasNext: Boolean = { pump(); out.nonEmpty }
      override def next(): Out = { pump(); out.dequeue() }

      /** Exact centroid per the LTOB/davg contract: x as an exact integer
        * sum → correctly-rounded double; y through Spark's double→
        * DECIMAL(28,6) HALF_UP cast, summed exactly, cast back, / n. */
      private def centroid(pts: Vector[Pt]): (Double, Double) = {
        var sx = BigInt(0)
        var sy = java.math.BigDecimal.ZERO
        pts.foreach { case (x, _, y) =>
          sx += x
          sy = sy.add(java.math.BigDecimal.valueOf(y)
            .setScale(6, java.math.RoundingMode.HALF_UP))
        }
        (sx.toDouble / pts.length, sy.doubleValue / pts.length)
      }

      private def emit(u: Long, b: Long, p: Pt, area: Option[Double]): Unit =
        out.enqueue((u, b, p._2, p._1, p._3, area))

      private def setAnchor(p: Pt): Unit = { anchorX = p._1.toDouble; anchorY = p._3 }

      private def pump(): Unit = while (out.isEmpty && in.hasNext) {
        val u = in.head._1
        val isFirst = !haveUser || u != curUser
        if (isFirst) { curUser = u; haveUser = true; pend = null }
        val b = Math.floorDiv(in.head._3, hourUs)
        val buf = Vector.newBuilder[Pt]
        while (in.hasNext && in.head._1 == u && Math.floorDiv(in.head._3, hourUs) == b) {
          val (_, id, x, y) = in.next()
          buf += ((x, id, y))
        }
        val pts = buf.result()
        val isLast = !in.hasNext || in.head._1 != u
        if (isFirst) {
          emit(u, b, pts.head, None)                   // series first point
          setAnchor(pts.head)
        } else {
          if (pend != null) {                          // bucket i+1 complete →
            val (cx, cy) = centroid(pts)               // finalize bucket i
            var best: Pt = null
            var bestArea = -1.0
            pend.foreach { case p @ (x, _, y) =>       // ties: first in (x, id) order
              val a = math.abs((anchorX - cx) * (y - anchorY) -
                (anchorX - x.toDouble) * (cy - anchorY))
              if (best == null || a > bestArea) { best = p; bestArea = a }
            }
            emit(u, pendBucket, best, Some(bestArea))
            setAnchor(best)
            pend = null
          }
          if (isLast) emit(u, b, pts.last, None)       // series last point
          else { pend = pts; pendBucket = b }
        }
      }
    }
}
