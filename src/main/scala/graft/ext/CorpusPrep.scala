package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation — the composite flagship of the
  * LLM-pipeline family (the analogue of `batch.Clean.cleanPipeline` for
  * the reference's CSV chain): quality-gate → exact-dedup → reproducible
  * split, in one declarative plan.
  *
  * Plan shape at scale: the quality gate is pure map-side expressions over
  * the scan; dedup is a partial-aggregated groupBy on md5(text) plus a
  * skew-tolerant join back; the split tag is map-side hash arithmetic.
  * Nothing collects, nothing broadcasts unbounded. */
object CorpusPrep {

  /** Keep docs that pass the quality gate (same scoring terms as
    * `text_quality_score`: ≥20 tokens, has stopwords, low digit ratio —
    * score ≥ 2), drop exact duplicates (lowest doc_id is canonical, as
    * `dedup_exact`), then tag each survivor with its `sample_hash_split`
    * assignment. Output: one row per retained training document. */
  def corpusPrepPipeline(documents: DataFrame, trainPct: Int = 90,
                         valPct: Int = 5): DataFrame = {
    val gated = documents
      .withColumn("n_tokens", size(Text.tokens(col("text"))).cast("long"))
      .withColumn("quality_score", Text.qualityScore)
      .filter(col("quality_score") >= 2.0)
    // exact dedup: canonical = lowest doc_id per identical text, in ONE
    // partial-aggregated pass — min_by carries the canonical doc's whole
    // row through the fingerprint groupBy (constant agg buffer: one
    // struct), so the gate's regex scan runs once and there is no join
    // back (r4 — the r2 groupBy+join form scanned the corpus twice). A
    // window over the fingerprint would instead buffer a pathological
    // duplicate group in one frame — still avoided.
    val deduped = gated
      .groupBy(md5(col("text").cast("binary")).as("fp"))
      .agg(min_by(
        struct(col("doc_id"), col("lang"), col("n_tokens"), col("quality_score")),
        col("doc_id")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
        col("r.n_tokens").as("n_tokens"), col("r.quality_score").as("quality_score"))
    val b = Sampling.hashBucket(col("doc_id"))
    deduped.select(
      col("doc_id"), col("lang"), col("n_tokens"), col("quality_score"),
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  /** r7b: the end-to-end dedup FUNNEL report — the composite a data lead
    * actually asks for ("what did each stage cost, per feed?"): quality
    * gate → exact dedup (min doc_id per md5) → near-dup drop (a survivor
    * with a SMALLER surviving near-dup is dropped — the greedy
    * keep-earliest rule production dedup runs use; transitive chains
    * collapse to their minimum because every later member pairs with an
    * earlier one at this threshold or is caught by its own pair) → per
    * source: input count, per-stage drops, kept count and integer-ppb
    * keep rate. Composes the verified pieces verbatim: the
    * `text_quality_score` gate, `corpus_prep_pipeline`'s one-pass
    * min_by exact dedup, and `dedup_near_minhash`'s banded-LSH pipeline
    * RESTRICTED to the exact-dedup survivors (the memo is plan-keyed, so
    * the survivor frame gets its own cache entry — no cross-query
    * poisoning). Never all-pairs anywhere; the funnel itself is four
    * source-keyed hash aggs left-joined on the tiny source dimension. */
  def corpusDedupFunnel(documents: DataFrame, minQuality: Double = 2.0,
      threshold: Double = 0.3): DataFrame = {
    def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("div", a, b)
    val base = documents
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      .withColumn("q", Text.qualityScore)
    val gated = base.filter(col("q") >= minQuality)
    val exact = gated
      .groupBy(md5(col("text").cast("binary")).as("fp"))
      .agg(min_by(struct(col("doc_id"), col("source"), col("text")),
        col("doc_id")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.source").as("source"),
        col("r.text").as("text"))
    val pairs = Dedup.dedupNearMinhash(
      exact.select(col("doc_id"), col("text")), threshold)
    val dropNear = pairs.select(col("doc_b").as("doc_id")).distinct()
    val kept = exact.join(dropNear, Seq("doc_id"), "left_anti")
    def tally(df: DataFrame, as: String) =
      df.groupBy(col("source")).agg(count(lit(1)).as(as))
    tally(base, "n_input")
      .join(tally(gated, "n_q"), Seq("source"), "left")
      .join(tally(exact, "n_e"), Seq("source"), "left")
      .join(tally(kept, "n_kept0"), Seq("source"), "left")
      .select(col("source"), col("n_input"),
        (col("n_input") - coalesce(col("n_q"), lit(0L))).as("n_quality_drop"),
        (coalesce(col("n_q"), lit(0L)) - coalesce(col("n_e"), lit(0L)))
          .as("n_exact_drop"),
        (coalesce(col("n_e"), lit(0L)) - coalesce(col("n_kept0"), lit(0L)))
          .as("n_near_drop"),
        coalesce(col("n_kept0"), lit(0L)).as("n_kept"),
        idiv(coalesce(col("n_kept0"), lit(0L))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)) * 1000000000L,
          col("n_input")).cast("long").as("kept_ppb"))
      .orderBy("source")
  }

  /** Sequence packing — the step between chunking and the training loader:
    * concatenate documents in doc_id order and cut the stream at
    * `budget`-token boundaries; each doc is assigned to the pack (bin)
    * where it STARTS. The global running token offset is a prefix sum,
    * computed distributed in two phases instead of one all-rows window:
    *
    *  1. per-range totals: docs group into coarse `rangeSize`-wide doc_id
    *     ranges, one hash agg → a tiny (n_docs/rangeSize)-row frame;
    *  2. range base offsets: exclusive cumsum over that tiny frame (the
    *     only single-partition window, over ~1/rangeSize of the rows);
    *  3. local cumsum per range (window partitioned by range — scales
    *     with partitions) + broadcast base = the exact global offset.
    *
    * This is the textbook distributed scan: the naive
    * `sum() OVER (ORDER BY doc_id)` — which IS the oracle's spelling —
    * would funnel 100 TB through one sorted partition. Output: per pack,
    * doc count / token total / doc_id span. */
  def corpusPackSequences(documents: DataFrame, budget: Int = 512,
                          rangeSize: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sized = documents
      .select(col("doc_id"), size(Text.tokens(col("text"))).cast("long").as("n"))
      .withColumn("rng", floor(col("doc_id") / rangeSize))
    val rangeTotals = sized.groupBy(col("rng")).agg(sum(col("n")).as("rn"))
    val base = rangeTotals
      .withColumn("base", coalesce(
        sum(col("rn")).over(Window.orderBy(col("rng"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("rng"), col("base"))
    val w = Window.partitionBy(col("rng")).orderBy(col("doc_id"))
    sized.join(broadcast(base), "rng")
      .withColumn("start_off", col("base") + sum(col("n")).over(w) - col("n"))
      .withColumn("bin", floor(col("start_off") / budget))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("bin")
  }

  /** Corpus mixture report — the "data card" every released training set
    * ships: per (lang, source) document count, char and whitespace-token
    * totals, and each cell's share of the corpus. One partial/final hash
    * agg over one scan (token counts are map-side expressions); the
    * shares ride a window over the already-aggregated langs×sources
    * frame, so the only single-partition step touches a vocabulary-
    * bounded handful of rows. Shares are integer parts-per-billion
    * (DECIMAL(38,0) multiply, integral divide → BIGINT): pure integer
    * arithmetic is bit-identical across engines and engine VERSIONS,
    * where a double division's last ulp is not (r4 driver hash
    * mismatch was exactly that). Consumers wanting a fraction divide
    * by 1e9 at the edge. */
  def corpusMixReport(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = documents
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
        // token class spelled explicitly (not \S+): Java's \s and RE2's \s
        // disagree on \x0B, so the shorthand is not version/engine-proof
        sum(size(regexp_extract_all(col("text"), lit("[^ \\t\\n\\x0B\\f\\r]+"), lit(0))).cast("long"))
          .as("n_tokens"))
    val all = Window.partitionBy()
    cells
      .withColumn("tot_docs", sum(col("n_docs")).over(all))
      .withColumn("tot_tokens", sum(col("n_tokens")).over(all))
      .select(col("lang"), col("source"), col("n_docs"), col("n_chars"), col("n_tokens"),
        expr("CAST(n_docs AS DECIMAL(38,0)) * 1000000000 DIV tot_docs").as("doc_share_ppb"),
        expr("CAST(n_tokens AS DECIMAL(38,0)) * 1000000000 DIV tot_tokens").as("token_share_ppb"))
      .orderBy("lang", "source")
  }

  /** r4: crawl-refresh composite — what a RECURRING ingest actually runs
    * over each new batch, end-to-end: exact dedup against the existing
    * corpus's fingerprint store ([[graft.ext.Dedup.dedupIncremental]]'s
    * convention: doc_id parity splits the fixture into store/fresh),
    * within-batch exact dedup (min-doc_id canonical), then the shared
    * quality gate — every fresh doc emerging with its DISPOSITION
    * (dup_store / dup_batch / low_quality / selected), because a
    * production refresh must account for what it dropped, not just
    * return survivors. Plan: one md5 map-side pass per side, one
    * fp equi-join (no broadcast hint — the store fingerprint set grows
    * with the corpus, AQE decides, same call as join_latest_dim), one
    * fp window for the batch canonical; quality is map-side
    * expressions. Nothing all-pairs, nothing collected. */
  def corpusRefreshPipeline(documents: DataFrame, minQuality: Double = 1.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val storeFp = documents.filter(col("doc_id") % 2 === 0)
      .select(md5(col("text").cast("binary")).as("fp")).distinct()
      .withColumn("in_store", lit(1L))
    val fresh = documents.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"), col("n_chars"),
        md5(col("text").cast("binary")).as("fp"))
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    fresh
      .join(storeFp, Seq("fp"), "left_outer")
      .withColumn("rn", row_number().over(w))
      .withColumn("quality", Text.qualityScore)
      .withColumn("n_tokens", size(Text.tokens(col("text"))).cast("long"))
      .withColumn("status",
        when(col("in_store").isNotNull, "dup_store")
          .when(col("rn") > 1, "dup_batch")
          .when(col("quality") < minQuality, "low_quality")
          .otherwise("selected"))
      .select(col("doc_id"), col("quality"), col("n_tokens"), col("status"))
      .orderBy("doc_id")
  }

  /** r4: token-budget selection — "give me the best `budget` tokens of
    * this corpus": rank every doc by the shared quality heuristic
    * ([[graft.ext.Text.qualityScore]], ties by doc_id so the cut is
    * total-ordered), take docs while the running token total stays
    * within budget. This is the greedy knapsack every
    * quality-filtered-subset release runs (quality-ranked C4/FineWeb
    * cuts).
    *
    * r5: a bare `sum() OVER (ORDER BY quality)` window — the oracle's
    * spelling — executes as ONE sorted partition in Spark, a
    * single-node funnel at 100 TB. The running total here is the
    * distributed scan instead: range-exchange on the (quality, doc_id)
    * total order, per-partition token/row totals (tiny frame: one row
    * per partition), exclusive cumsum over that frame, then a LOCAL
    * window per range partition plus the broadcast base. Any range
    * boundary placement yields the same global prefix sums because the
    * order is total, so the sampled boundaries don't affect results.
    * Rows out: only the selected docs, with their rank and the running
    * total the cut was decided on. */
  def corpusBudgetSelect(documents: DataFrame, budget: Long = 20000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = documents
      .select(col("doc_id"),
        Text.qualityScore.as("quality"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .repartitionByRange(col("quality").desc, col("doc_id"))
      .withColumn("pid", spark_partition_id())
    val partTotals = scored.groupBy(col("pid"))
      .agg(sum(col("n_tokens")).as("pt"), count(lit(1)).as("pc"))
    val base = partTotals
      .withColumn("tok_base", coalesce(
        sum(col("pt")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("rank_base", coalesce(
        sum(col("pc")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("tok_base"), col("rank_base"))
    val local = Window.partitionBy(col("pid"))
      .orderBy(col("quality").desc, col("doc_id"))
    scored.join(broadcast(base), "pid")
      .withColumn("rank", (col("rank_base") + row_number().over(local)).cast("long"))
      .withColumn("cum_tokens", col("tok_base") +
        sum(col("n_tokens")).over(local.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= budget)
      .select(col("rank"), col("doc_id"), col("quality"), col("n_tokens"), col("cum_tokens"))
      .orderBy("rank")
  }

  /** r5c6: temperature-sampled source mixing — the multinomial
    * re-weighting every multilingual / multi-source pretraining run uses
    * (α < 1 upsamples small sources, the "temperature sampling" of the
    * mBERT/XLM-R lineage): weight_i = n_i^α with α = 1/2, realized as
    * `sqrt` — IEEE-754 requires sqrt correctly rounded, so the weights
    * are bit-identical across engines, the one power that is (general
    * `pow` is libm-dependent and systematically avoided here). The
    * weight total rides the [[graft.Det.dsum]] decimal contract
    * (order-independent), divisions are a fixed op chain, and the doc
    * budget is apportioned by LARGEST REMAINDER (floor quotas, then +1
    * to the biggest fractional parts, ties by source name) so the
    * allocations sum to the budget EXACTLY — a data card with quotas
    * that don't add up is a bug report waiting. Plan: one partial/final
    * agg over the scan; everything after touches only the
    * sources-bounded frame (windows over ≤ a handful of rows — the
    * weight total is an all-partition window on that frame, the
    * [[corpusMixReport]] pattern, never a join). */
  def corpusTemperatureMix(documents: DataFrame, budget: Long = 10000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val srcW = Window.partitionBy()
    val quota = documents.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("weight", sqrt(col("n_docs").cast("double")))
      .withColumn("w_total",
        sum(col("weight").cast("decimal(28,6)")).over(srcW).cast("double"))
      .withColumn("exact", lit(budget.toDouble) * col("weight") / col("w_total"))
      .withColumn("fl", floor(col("exact")).cast("long"))
      .withColumn("rem", col("exact") - floor(col("exact")))
    quota
      .withColumn("deficit", lit(budget) - sum(col("fl")).over(srcW))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))))
      .select(col("source"), col("n_docs"), col("weight"),
        expr("CAST(floor(weight * 1000000000.0 / w_total) AS BIGINT)").as("share_ppb"),
        (col("fl") + when(col("rk") <= col("deficit"), 1L).otherwise(0L))
          .as("alloc_docs"))
      .orderBy("source")
  }

  /** r8: epoch plan per source — the repetition schedule a training run
    * derives from [[corpusTemperatureMix]]'s allocation: with a total
    * token budget (multiple × corpus tokens) split by temperature-
    * smoothed (√) token shares, how many FULL passes does each source
    * take (n_epochs = ⌈target/n_tokens⌉), how many tokens does the
    * final partial pass draw, and what is the oversampling rate in ppb
    * (the "is any source repeated past ~4 epochs" check the data-mix
    * literature flags). Same √-share spelling as the temperature mix
    * (decimal-summed weight total, one fixed share chain, floor once);
    * everything after the floor is integer division. One sources-row
    * frame end to end. */
  def corpusEpochPlan(documents: DataFrame, multiple: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def idiv(a: Column, b: Column) = call_function("div", a, b)
    val srcW = Window.partitionBy()
    documents.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(Text.tokens(col("text"))).cast("long")).as("n_tokens"))
      .withColumn("weight", sqrt(col("n_tokens").cast("double")))
      .withColumn("w_total",
        sum(col("weight").cast("decimal(28,6)")).over(srcW).cast("double"))
      .withColumn("budget",
        sum(col("n_tokens")).over(srcW) * lit(multiple.toLong))
      .withColumn("exact",
        col("budget").cast("double") * col("weight") / col("w_total"))
      .withColumn("target_tokens", floor(col("exact")))
      // r9 (ADVICE): a source whose documents tokenize to ZERO tokens is
      // degenerate but reachable (empty/whitespace-only docs) — unguarded,
      // Spark's `div` nulls silently while DuckDB's `//` raises, a
      // cross-engine divergence. Its weight is already 0 (√0), so the
      // plan is explicit: 0 epochs, no partial pass, null oversample.
      .withColumn("epochs", when(col("n_tokens") > 0,
        idiv(col("target_tokens") + col("n_tokens") - 1, col("n_tokens")))
        .otherwise(lit(0L)))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("target_tokens"), col("epochs").as("n_epochs"),
        when(col("epochs") > 0,
          col("target_tokens") - (col("epochs") - 1) * col("n_tokens"))
          .as("last_epoch_tokens"),
        when(col("n_tokens") > 0,
          idiv(col("target_tokens").cast(dec) * lit(1000000000L), col("n_tokens"))
            .cast("long")).as("oversample_ppb"))
      .orderBy("source")
  }

  /** r6: power-of-two document-length histogram per language — the
    * sequence-length profile that sizes packing budgets and truncation
    * limits (`corpus_pack_sequences`' `budget` knob is chosen FROM this
    * table): token-count buckets [2^b, 2^(b+1)) at any dynamic range.
    * Same exact-integer bucketing as `events_interarrival_histogram`
    * (binary string length, never a libm log2); shares integer ppb per
    * language over the ≤32-buckets frame. One map-side projection + one
    * hash agg. */
  def corpusLengthHistogram(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perLang = Window.partitionBy(col("lang"))
    documents
      .select(col("lang"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("bucket", (length(bin(col("n_tokens"))) - 1).cast("long"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("n_tokens")).as("len_min"), max(col("n_tokens")).as("len_max"))
      .withColumn("tot", sum(col("n_docs")).over(perLang))
      .withColumn("doc_share_ppb",
        expr("CAST(n_docs AS DECIMAL(38,0)) * 1000000000 DIV tot"))
      .drop("tot")
      .orderBy("lang", "bucket")
  }

  /** r6: per-source quality data card — the "what is each source worth"
    * table a corpus release ships next to [[corpusMixReport]]'s volume
    * shares: doc/token counts, mean quality, exact quality QUARTILES and
    * the below-gate count per source (the number that decides whether a
    * source gets re-crawled, re-filtered or dropped). Quartiles follow
    * the `agg_quantiles` exact-order-statistic contract (value at row
    * ceil(q·n) under a (quality, doc_id) total order — no interpolation,
    * engine-portable), computed per SOURCE key so the rank window is
    * distributed; the mean rides [[graft.Det.davg]]; the gate count is
    * an integer conditional sum. One quality projection feeds rank
    * window + hash agg on the same source key — one shuffle total. */
  def corpusQualityReport(documents: DataFrame, gate: Double = 1.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = documents.select(col("source"), col("doc_id"),
      Text.qualityScore.as("q"),
      size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("source")).orderBy(col("q"), col("doc_id"))
    val counted = scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
    def at(q: Double) = max(when(col("rn") === ceil(col("n") * q), col("q")))
    counted.groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        graft.Det.davg(col("q")).as("mean_quality"),
        at(0.25).as("q25"), at(0.5).as("q50"), at(0.75).as("q75"),
        sum(when(col("q") < gate, 1L).otherwise(0L)).as("n_below_gate"))
      .orderBy("source")
  }
}
