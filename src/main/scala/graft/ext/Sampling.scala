package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset sampling/splitting for training pipelines (north-star family,
  * next to dedup/similarity/text): reproducible splits and quota sampling
  * that behave identically at any cluster size.
  *
  * Both operators are pure map-side expressions or a single window pass —
  * no extra shuffle beyond the window's own, no RNG (hash-derived
  * assignment), so a re-run over 100 TB lands every row in the same split.
  */
object Sampling {

  /** Stable 0..99 bucket from the first 4 hex digits of md5(key) — the
    * engine-portable "random but reproducible" assignment (same spelling
    * in the DuckDB oracle). */
  def hashBucket(key: Column): Column =
    (conv(substring(md5(key.cast("string").cast("binary")), 1, 4), 16, 10)
      .cast("int") % 100)

  /** Deterministic train/val/test split by content key. Hash-derived, so
    * assignment is stable across runs, engines and partitionings — the
    * property that keeps a training corpus split consistent when the
    * pipeline is re-run incrementally. Map-side only; the split filter
    * prunes at the scan when selecting one split downstream. */
  def sampleHashSplit(documents: DataFrame, trainPct: Int = 90,
                      valPct: Int = 5): DataFrame = {
    val b = hashBucket(col("doc_id"))
    documents.select(
      col("doc_id"),
      b.as("bucket"),
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  /** Quality-weighted upsampling — the "epochs per document" step of
    * curriculum/quality-weighted training mixes: high-quality docs are
    * repeated (2 epochs at quality ≥ 2.5, 1 otherwise, 0 = dropped below
    * 1.5), emitted as explicit (doc_id, copy_id) rows the training loader
    * consumes. The fan-out is an int-sequence Generate (map-side, no
    * shuffle before the output sort); weights are derived from the same
    * deterministic quality terms as `text_quality_score`, so the whole
    * expansion is hash-match oracled. */
  def sampleUpweight(documents: DataFrame): DataFrame = {
    val quality = Text.qualityScore
    documents
      .withColumn("epochs",
        when(quality >= 2.5, 2L).when(quality >= 1.5, 1L).otherwise(0L))
      .filter(col("epochs") > 0)
      .select(col("doc_id"), col("epochs"),
        explode(sequence(lit(1L), col("epochs"))).as("copy_id"))
      .orderBy("doc_id", "copy_id")
  }

  /** r4: deterministic corpus shuffle + shard assignment — the "global
    * random order" a training run consumes, without RNG state: sort key =
    * md5-u64 of the content id (same portable hash family as
    * [[sampleHashSplit]]), so the order is reproducible across runs,
    * engines and partitionings. Scale design: there is NO global
    * row_number (a single total-order window serializes at 100 TB) —
    * shard assignment is map-side (hash mod nShards) and positions are
    * per-shard windows, which parallelize across shards; the training
    * loader reads (shard, pos) order, the standard sharded-shuffle
    * contract. */
  def corpusShuffleOrder(documents: DataFrame, nShards: Int = 8): DataFrame = {
    val u64 = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 16), 16, 10)
      .cast("decimal(38,0)")
    val w = Window.partitionBy(col("shard")).orderBy(col("hkey"), col("doc_id"))
    documents
      .select(col("doc_id"), u64.as("hkey"))
      .withColumn("shard", (col("hkey") % nShards).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }

  /** r8: systematic sample — every k-th document under the hash order
    * (the survey-sampling classic: one global stride instead of
    * per-row coin flips, so the sample is maximally spread over the
    * hash axis and its size is exactly ⌈n/k⌉, where Bernoulli sampling
    * only hits the rate in expectation). The hash order is the same
    * md5-u64 family as [[corpusShuffleOrder]], and the global rank
    * rides [[graft.Dist.rankByRange]]'s two-phase range-exchange rank —
    * no partition-less window on the data-scaled frame. Map-side
    * stride filter after the rank. */
  def sampleSystematic(documents: DataFrame, k: Int = 20): DataFrame = {
    val u64 = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 16), 16, 10)
      .cast("decimal(38,0)")
    val keyed = documents.select(col("doc_id"), u64.as("hkey"))
    graft.Dist.rankByRange(keyed, "rnk", col("hkey"), col("doc_id"))
      // r9 (ADVICE): (rnk − 1) % k == 0, not rnk % k == 1 — equivalent for
      // k ≥ 2 but correct at the take-everything setting k = 1, where
      // rnk % 1 is always 0 and the old form returned an EMPTY sample,
      // inverting the ⌈n/k⌉ size contract.
      .filter(((col("rnk") - 1) % k) === 0L)
      .select(col("rnk").as("rank"), col("doc_id"))
      .orderBy("rank")
  }

  /** Stratified quota sample: at most k docs per group (lang), lowest
    * doc_id first — deterministic per-stratum downsampling (class
    * balancing). One shuffle on the group key. */
  def samplePerGroup(documents: DataFrame, k: Int = 50): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    documents
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("lang"), col("rn"), col("doc_id"), col("source"))
      .orderBy("lang", "rn")
  }

  /** Rate-based stratified downsampling — the "rebalance the training mix"
    * operator: each stratum (lang) keeps a configured fraction of its
    * documents, expressed in permille (the over-represented language is
    * thinned, the rest pass through). Unlike [[samplePerGroup]]'s hard
    * quota (which needs a per-stratum window shuffle), the rate cut is a
    * PURE MAP-SIDE filter: keep iff md5-permille(doc_id) < rate — no
    * shuffle at all before the output sort, assignment stable across
    * runs, engines and partitionings (re-running an incremental pipeline
    * keeps every prior decision). The fixture mix thins `en` (the 44 %
    * head class) to 25 % and keeps the tail languages whole. */
  def sampleRatePerStratum(documents: DataFrame,
                           rates: Map[String, Int] = Map("en" -> 250),
                           defaultPermille: Int = 1000): DataFrame = {
    // first 4 md5 hex digits mod 1000: the permille sibling of hashBucket
    // (same spelling in the DuckDB oracle)
    val pm = (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4), 16, 10)
      .cast("int") % 1000)
    val rate = rates.foldLeft(lit(defaultPermille)) { case (acc, (k, v)) =>
      when(col("lang") === k, lit(v)).otherwise(acc)
    }
    documents
      .select(col("doc_id"), col("lang"), pm.cast("long").as("permille"),
        rate.cast("long").as("rate"))
      .filter(col("permille") < col("rate"))
      .orderBy("doc_id")
  }

  /** r6: exact-k deterministic sample — "give me exactly k uniform-ish
    * docs, the same k every run": the fixed-size eval/holdout selection
    * every release pipeline pins (a rate filter gives a BINOMIAL size;
    * an RNG reservoir gives a different set per run/partitioning). Rank
    * by the md5 hex prefix of the content id (lowercase hex compares
    * lexicographically = numerically — the same portable hash family as
    * [[sampleHashSplit]], tie by doc_id) and keep the k smallest. Plan:
    * TakeOrderedAndProject — each task keeps k rows, the driver merges
    * 32·k, nothing else crosses the wire; the rank window then rides the
    * ≤k surviving rows. */
  /** r7b: PRIORITY sampling (Duffield–Lund–Thorup) weighted by token
    * count — the principled "estimate the corpus from k documents"
    * sample: priority q = w/u with u a deterministic hash-uniform in
    * (0,1], take the k largest priorities, and ŵ = max(w, τ) (τ = the
    * (k+1)-th priority) makes Σŵ over the sample an unbiased estimator
    * of TOTAL corpus tokens with provably near-optimal variance — the
    * estimator a size-weighted subsample needs before anyone trusts its
    * totals, and the weighted sibling of [[sampleTopkHash]]'s uniform
    * pinned holdout. No RNG: u = (low-53-bits(md5-u64)+1)/2^53, an exact
    * dyadic rational, so sample AND estimates are reproducible across
    * runs, engines, partitionings. Plan: map-side priorities, ONE
    * TakeOrderedAndProject merging 32·(k+1) rows, a 1-row τ frame
    * broadcast back. */
  def samplePriorityWeighted(documents: DataFrame, k: Int = 50): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val u64 = conv(substring(md5(col("doc_id").cast("string").cast("binary")),
      1, 16), 16, 10).cast(dec)
    val u = (((u64 % lit(9007199254740992L)).cast("long") + lit(1L))
      .cast("double") / lit(9007199254740992.0))
    val w = greatest(size(Text.tokens(col("text"))).cast("long"), lit(1L))
    val pri = documents.select(col("doc_id"), w.as("w"),
      (w.cast("double") / u).as("priority"))
    val wRank = Window.orderBy(col("priority").desc, col("doc_id"))
    val ranked = pri.orderBy(col("priority").desc, col("doc_id")).limit(k + 1)
      .withColumn("rn", row_number().over(wRank).cast("long"))
    val tauF = ranked.agg(
      max(when(col("rn") === k + 1, col("priority"))).as("tau"))
    ranked.filter(col("rn") <= k)
      .crossJoin(broadcast(tauF))
      .select(col("rn").as("rank"), col("doc_id"), col("w"), col("priority"),
        col("tau"),
        coalesce(greatest(col("w").cast("double"), col("tau")),
          col("w").cast("double")).as("w_hat"))
      .orderBy("rank")
  }

  /** r7b: exact-budget stratified sample with HAMILTON (largest
    * remainder) apportionment — "give me exactly K documents, spread
    * across languages proportionally": k_s = ⌊K·n_s/N⌋ plus one extra
    * for the strata with the largest remainders until the budget is
    * exact (the apportionment rule that, unlike rounding rates,
    * GUARANTEES Σk_s = K — what `sample_rate_per_stratum`'s per-stratum
    * rates cannot). All integer: quota/remainder are one integral
    * divide/mod each, the remainder ranking is a window over the ≤langs
    * frame, and the per-stratum pick is the pinned md5-hex order of
    * [[sampleTopkHash]] under a language-keyed window (scales by
    * stratum). Deterministic end to end — same K docs on any cluster. */
  def sampleHamiltonAlloc(documents: DataFrame, budget: Int = 100): DataFrame = {
    def idiv(a: Column, b: Column) = call_function("div", a, b)
    val k = lit(budget.toLong)
    val counts = documents.groupBy(col("lang")).agg(count(lit(1)).as("ns"))
    val totals = counts.agg(sum(col("ns")).as("n_total"))
    val wRem = Window.orderBy(
      (k * col("ns") % col("n_total")).desc, col("lang"))
    val alloc = counts.crossJoin(broadcast(totals))
      .withColumn("k_base", idiv(k * col("ns"), col("n_total")))
      .withColumn("rem_rank", row_number().over(wRem).cast("long"))
      .crossJoin(broadcast(
        counts.crossJoin(broadcast(totals))
          .agg((k - sum(idiv(k * col("ns"), col("n_total")))).as("n_extra"))))
      .withColumn("k_alloc",
        col("k_base") + when(col("rem_rank") <= col("n_extra"), 1L).otherwise(0L))
      .select(col("lang"), col("ns"), col("k_alloc"))
    val wPick = Window.partitionBy(col("lang"))
      .orderBy(col("hkey"), col("doc_id"))
    documents
      .select(col("doc_id"), col("lang"),
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 16)
          .as("hkey"))
      .withColumn("pick", row_number().over(wPick).cast("long"))
      .join(broadcast(alloc), "lang")
      .filter(col("pick") <= col("k_alloc"))
      .select(col("lang"), col("pick"), col("doc_id"), col("ns"), col("k_alloc"))
      .orderBy("lang", "pick")
  }

  /** r9: NEYMAN allocation — the variance-optimal stratified design next
    * to [[sampleHamiltonAlloc]]'s proportional one: allocate the budget
    * ∝ N_h·S_h (stratum size × stratum std of the survey variable, here
    * n_chars), which minimizes the variance of the estimated mean under
    * a fixed budget — a stratum that is LARGE AND NOISY earns more
    * samples; a large-but-uniform one earns fewer than proportional
    * would give it (the textbook optimal-allocation result, and the
    * difference that matters when one language's doc lengths are wild
    * and another's are clamped).
    *
    * EXACTNESS: per-stratum variance rides the exact integer power-sum
    * chain; the weight N_h·S_h is quantized ONCE to integer milli-units
    * via floor (deterministic on a deterministic double), and from there
    * it is [[sampleHamiltonAlloc]]'s integer largest-remainder machinery.
    * Degenerate strata (n < 2 or zero variance) get weight 0 and drop
    * from the allocation.
    *
    * CAPPING (r9b, caught by `R9bPropertySpec`): unlike proportional
    * allocation (k·N_h/N ≤ N_h always), Neyman weights are variance-
    * driven and CAN ask a small-but-wild stratum for more rows than it
    * has. The raw allocation is therefore capped at the stratum size and
    * the surplus Hamilton-redistributed ONCE among the unsaturated
    * strata (the textbook single-cascade case, exact); a SECOND cascade
    * (the redistribution itself saturating someone) or a budget above
    * the weighted capacity fails LOUDLY via the exact-budget guard
    * rather than silently under-delivering. SCALE: one stats agg,
    * ≤#strata allocation frames, one 1-row guard collect, and the same
    * md5-ordered per-stratum pick window as Hamilton. */
  def sampleNeymanAlloc(documents: DataFrame, budget: Int = 100): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val spark = documents.sparkSession
    // r13 OPT (guide §2.4/§5): the r12 spelling built the allocation as a
    // distributed DAG over the ≤#strata weight frame — two Hamilton
    // cascades of crossJoin(broadcast(...)) layers whose 1-row inputs
    // each re-aggregated the weight frame, PLUS a guard collect() that
    // re-ran the whole chain, PLUS the main query running it once more:
    // a 205 KB plan, ~7 recomputations of the documents stats agg, 4.77 s
    // at sf0.1 (vs 0.49 s for its hamilton sibling). The weight frame is
    // strata-bounded (per-lang rows) at ANY data scale, so collect the
    // ONE data-scaled stats agg and run the allocation arithmetic on the
    // driver — same exact integer Hamilton machinery, floats only where
    // the r12 spelling had them (decToDouble / sqrt / floor, replicated
    // op for op in IEEE doubles), so the output is hash-identical
    // (oracle re-verified sf0.001/0.01/0.1). Documents is now scanned
    // exactly twice: the stats agg and the pick window below.
    val stats = documents.groupBy(col("lang")).agg(
        count(lit(1)).as("ns"),
        sum(col("n_chars").cast(dec)).as("sx"),
        sum((col("n_chars") * col("n_chars")).cast(dec)).as("sx2"))
      .collect()
    val d2 = graft.Det.decToDoubleLocal _
    val utf8Lt = graft.Det.utf8NullsFirstLt _
    val k = budget.toLong
    case class W(lang: String, ns: Long, wq: Long)
    val weights = stats.iterator.map { r =>
      val lang = r.getString(0); val ns = r.getLong(1)
      val sx = BigInt(r.getDecimal(2).toBigInteger)
      val sx2 = BigInt(r.getDecimal(3).toBigInteger)
      val nd = ns.toDouble
      val wq = if (ns >= 2) {
        val v = (d2(sx2) - d2(sx) * d2(sx) / nd) / (nd - 1.0)
        if (v > 0) math.floor(nd * math.sqrt(v) * 1000.0).toLong else 0L
      } else 0L
      W(lang, ns, wq)
    }.filter(_.wq > 0).toSeq
    val wTotal = weights.iterator.map(_.wq).sum
    val ranked = weights.sortWith { (p, q) =>
      val rp = k * p.wq % wTotal; val rq = k * q.wq % wTotal
      if (rp != rq) rp > rq else utf8Lt(p.lang, q.lang)
    }
    val nExtra = k - weights.iterator.map(w => k * w.wq / wTotal).sum
    case class A(lang: String, ns: Long, wq: Long, k1: Long, c1: Long)
    val a1 = ranked.zipWithIndex.map { case (w, i) =>
      val k1 = k * w.wq / wTotal + (if (i + 1 <= nExtra) 1L else 0L)
      A(w.lang, w.ns, w.wq, k1, math.min(k1, w.ns))
    }
    // phase 2: Hamilton-redistribute the capped-off surplus among the
    // strata phase 1 left unsaturated
    val sur = k - a1.iterator.map(_.c1).sum
    val unsat = a1.filter(a => a.k1 < a.ns)
    val adds: Map[String, Long] = if (unsat.isEmpty) Map.empty else {
      val w2 = unsat.iterator.map(_.wq).sum
      val ranked2 = unsat.sortWith { (p, q) =>
        val rp = sur * p.wq % w2; val rq = sur * q.wq % w2
        if (rp != rq) rp > rq else utf8Lt(p.lang, q.lang)
      }
      val nExtra2 = sur - unsat.iterator.map(a => sur * a.wq / w2).sum
      ranked2.zipWithIndex.map { case (a, i) =>
        a.lang -> (sur * a.wq / w2 + (if (i + 1 <= nExtra2) 1L else 0L))
      }.toMap
    }
    case class Alloc(lang: String, ns: Long, wMilli: Long, kAlloc: Long)
    val allocRows = a1.map(a =>
      Alloc(a.lang, a.ns, a.wq, a.c1 + adds.getOrElse(a.lang, 0L)))
    // exact-budget guard: a second cascade or an over-capacity budget
    // must fail loudly, never silently under-deliver
    val deliverable = allocRows.iterator.map(a => math.min(a.kAlloc, a.ns)).sum
    val cascaded = allocRows.exists(a => a.kAlloc > a.ns)
    require(!cascaded && deliverable == budget.toLong,
      s"sample_neyman_alloc: budget $budget is not exactly deliverable " +
        "under single-cascade capping - lower the budget or use " +
        "sample_hamilton_alloc")
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val allocSchema = StructType(Seq(
      StructField("lang", StringType, nullable = true),
      StructField("ns", LongType, nullable = false),
      StructField("w_milli", LongType, nullable = true),
      StructField("k_alloc", LongType, nullable = false)))
    val alloc = spark.createDataFrame(
      allocRows.map(a =>
        org.apache.spark.sql.Row(a.lang, a.ns, a.wMilli, a.kAlloc)).asJava,
      allocSchema)
    val wPick = Window.partitionBy(col("lang"))
      .orderBy(col("hkey"), col("doc_id"))
    documents
      .select(col("doc_id"), col("lang"),
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 16)
          .as("hkey"))
      .withColumn("pick", row_number().over(wPick).cast("long"))
      .join(broadcast(alloc), "lang")
      .filter(col("pick") <= col("k_alloc"))
      .select(col("lang"), col("pick"), col("doc_id"), col("ns"),
        col("w_milli"), col("k_alloc"))
      .orderBy("lang", "pick")
  }

  def sampleTopkHash(documents: DataFrame, k: Int = 100): DataFrame = {
    val hkey = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 16)
    val rank = Window.orderBy(col("hkey"), col("doc_id"))
    documents
      .select(col("doc_id"), hkey.as("hkey"))
      .orderBy(col("hkey"), col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(rank).cast("long"))
      .select(col("rank"), col("doc_id"), col("hkey"))
      .orderBy("rank")
  }

  /** r10b: k-fold cross-validation assignment (k = 5) — the
    * [[sampleHashSplit]] contract extended from one split to the full CV
    * rotation: fold = hash-bucket mod k, stable across runs/engines/
    * partitionings, so every CV round trains on exactly the same 4/5 at
    * any cluster size. The report is the fold-balance audit a pipeline
    * checks BEFORE burning 5 training runs: per-fold doc count, exact
    * ppm share (integer floor — no float), token mass, and the distinct
    * language count (a fold missing a language entirely invalidates the
    * rotation for per-lang eval). Pure map-side assignment + one k-row
    * agg. */
  def sampleKfold(documents: DataFrame, k: Int = 5): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val total = documents.agg(count(lit(1)).as("n_total"))
    documents
      .withColumn("fold", (hashBucket(col("doc_id")) % k).cast("long"))
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast(dec)).cast("long").as("n_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .crossJoin(broadcast(total))
      .select(col("fold"), col("n_docs"), col("n_chars"), col("n_langs"),
        call_function("div", col("n_docs").cast(dec) * 1000000,
          col("n_total").cast(dec)).cast("long").as("share_ppm"))
      .orderBy("fold")
  }

  /** r10b: GROUP-aware k-fold assignment — the third leg of the
    * leakage-safe split family ([[sampleKfold]] splits by document,
    * [[sampleTemporalSplit]] by time; this one keeps every document of a
    * SOURCE in the same fold, so near-duplicate documents within a crawl
    * domain can never straddle a train/eval boundary — the GroupKFold
    * practice): fold = hash-bucket(source) mod k. The report shows the
    * cost of group-level assignment: fold sizes are as uneven as the
    * source-size distribution (stated — the unavoidable price of zero
    * group leakage). */
  def sampleGroupKfold(documents: DataFrame, k: Int = 5): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val total = documents.agg(count(lit(1)).as("n_total"))
    documents
      .withColumn("fold", (hashBucket(col("source")) % k).cast("long"))
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars").cast(dec)).cast("long").as("n_chars"))
      .crossJoin(broadcast(total))
      .select(col("fold"), col("n_docs"), col("n_sources"), col("n_chars"),
        call_function("div", col("n_docs").cast(dec) * 1000000,
          col("n_total").cast(dec)).cast("long").as("share_ppm"))
      .orderBy("fold")
  }

  /** r10b: temporal train/valid/test split with EMBARGO — the split the
    * hash family must never be used for on time-series data (hash splits
    * leak the future into training): cut the event span by TIME fraction
    * (80/10/10 of the µs span — exact integer arithmetic, no float), and
    * drop a 1-hour embargo strip BEFORE each boundary so no training
    * window overlaps an eval window through lagged features (the
    * standard purged-split practice from financial ML). Reported as one
    * row per split (train / valid / test / embargo) with exact counts
    * and boundary timestamps. Pure map-side predicate off two 1-row
    * span stats — prunes at the scan when one split is selected
    * downstream. */
  def sampleTemporalSplit(events: DataFrame,
                          embargoUs: Long = 3600000000L): DataFrame = {
    val span = events.agg(
      min(unix_micros(col("ts"))).as("mn"),
      max(unix_micros(col("ts"))).as("mx"))
    val us = unix_micros(col("ts"))
    val cut80 = col("mn") + call_function("div", (col("mx") - col("mn")) * 8, lit(10L))
    val cut90 = col("mn") + call_function("div", (col("mx") - col("mn")) * 9, lit(10L))
    events.crossJoin(broadcast(span))
      .withColumn("split",
        when(us < cut80 - embargoUs, "train")
          .when(us >= cut80 && us < cut90 - embargoUs, "valid")
          .when(us >= cut90, "test")
          .otherwise("embargo"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_rows"),
        graft.Det.fmtTs(min(col("ts"))).as("first_ts"),
        graft.Det.fmtTs(max(col("ts"))).as("last_ts"))
      .orderBy("split")
  }
}
