package graft

import org.apache.spark.sql.DataFrame

/** Empty-input robustness: a library operator must return an EMPTY frame
  * on an empty input, not throw — at 100 TB an empty slice is routine (a
  * new partition, a filtered day with no rows, a cold-start store side),
  * and an operator that crashes on it takes the whole job down. Runs a
  * representative operator from every family over limit(0) inputs. */
class EmptyInputSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"
  def emptyEvents: DataFrame = Tables.events(spark, sf).limit(0)
  def emptyDocs: DataFrame = Tables.documents(spark, sf).limit(0)
  def emptyEmb: DataFrame = Tables.embeddings(spark, sf).limit(0)

  test("batch operators return empty frames on empty inputs") {
    import graft.ops._
    assert(Aggs.aggMetricsSummary(emptyEvents).count() == 0)
    assert(Aggs.aggQuantiles(emptyEvents).count() == 0)
    assert(Aggs.statRollingCorr(emptyEvents).count() == 0)
    assert(Aggs.aggBitmapDistinct(emptyEvents).count() == 0)
    assert(Windows.windowMovingAvg(emptyEvents).count() == 0)
    assert(SetSort.sortByTime(emptyEvents).count() == 0)
    assert(Joins.joinAsofNearest(emptyEvents).count() == 0)
    assert(Joins.joinIntervalBucket(emptyEvents).count() == 0)
    assert(batch.Clean.cleanWinsorize(emptyEvents).count() == 0)
  }

  test("ext operators return empty frames on empty inputs") {
    import graft.ext._
    assert(Dedup.dedupExact(emptyDocs).count() == 0)
    assert(Dedup.dedupContainment(emptyDocs).count() == 0)
    assert(Text.textPassageDedup(emptyDocs).count() == 0)
    assert(Text.textQualityScore(emptyDocs).count() == 0)
    assert(CorpusPrep.corpusBudgetSelect(emptyDocs).count() == 0)
    assert(CorpusPrep.corpusRefreshPipeline(emptyDocs).count() == 0)
    assert(Sessions.eventsSessionStats(emptyEvents).count() == 0)
    assert(Sessions.eventsPathTopk(emptyEvents).count() == 0)
    assert(Sessions.graphPagerankTypes(emptyEvents).count() == 0)
    assert(Similarity.embQuantizeInt8(emptyEmb).count() == 0)
    assert(Similarity.embPqCodes(emptyEmb).count() == 0)
    assert(ops.Joins.joinBloomPrefilter(
      Tables.orders(spark, sf).limit(0), Tables.customer(spark, sf)).count() == 0)
    // a REPORT query on an empty table correctly reports two zero-block
    // layout rows (global agg semantics), not an empty frame
    val z = sources.Layout.zorderSkipping(emptyEvents).collect()
    assert(z.length == 2 && z.forall(_.getLong(1) == 0L), z.mkString(","))
  }

  test("r5c operators survive empty inputs") {
    import graft.ext._
    assert(ops.Joins.tsIntervalUnion(emptyEvents).count() == 0)
    assert(Sessions.eventsBurstUsers(emptyEvents).count() == 0)
    assert(Dedup.dedupNormalized(emptyDocs).count() == 0)
    assert(Multimodal.multimodalAudioFingerprint(emptyDocs).count() == 0)
    // report aggregates emit one zero row, not a crash or a null census
    val tri = Sessions.graphTriangles(emptyEvents).collect()
    assert(tri.length == 1 && tri(0).getAs[Long]("n_edges") == 0L &&
      tri(0).getAs[Long]("n_triangles") == 0L)
    val chi = ops.Aggs.statChiSquare(emptyEvents).collect()
    assert(chi.length == 1 && chi(0).getAs[Long]("n_cells") == 0L &&
      chi(0).getAs[Long]("n_events") == 0L &&
      chi(0).getAs[Double]("chi2") == 0.0)
    // r5c2 batch
    assert(ops.Aggs.statBenford(Tables.lineitem(spark, sf).limit(0)).count() == 0)
    assert(ops.Joins.snapshotUpsert(emptyEvents).count() == 0)
    assert(ops.Joins.tsDownsampleLtob(emptyEvents).count() == 0)
    assert(Similarity.embBinarizeSign(emptyEmb).count() == 0)
    assert(Similarity.simSearchHammingTopk(emptyEmb).count() == 0)
    // r5c3 batch
    assert(Sessions.graphLinkJaccard(emptyEvents).count() == 0)
    assert(ops.Aggs.statKsDrift(emptyEvents).count() == 0)
    assert(ops.Aggs.statMannKendall(emptyEvents).count() == 0)
    // r5c4 batch
    assert(ops.Aggs.aggRollingDistinct(emptyEvents).count() == 0)
    assert(ops.SetSort.unionSchemaEvolve(emptyEvents).count() == 0)
    assert(ops.Windows.windowPositionProfile(emptyEvents).count() == 0)
    assert(Text.textRulesFilter(emptyDocs).count() == 0)
    assert(ops.Aggs.statTukeyOutliers(emptyEvents).count() == 0)
    assert(Text.textHashedFeatures(emptyDocs).count() == 0)
    assert(Text.textReadability(emptyDocs).count() == 0)
    assert(ext.CorpusPrep.corpusTemperatureMix(emptyDocs).count() == 0)
    assert(ext.Sessions.eventsAttributionLinear(emptyEvents).count() == 0)
    assert(ext.Multimodal.multimodalKeyframeSelect(emptyDocs).count() == 0)
    assert(ops.Aggs.statTheilSen(emptyEvents).count() == 0)
    assert(ops.Aggs.statHoltForecast(emptyEvents).count() == 0)
    assert(ext.Sessions.joinIntervalOverlap(emptyEvents).count() == 0)
    // empty-input sketch difference emits one zero row (ungrouped agg)
    val dk = ops.Aggs.aggDistinctDiffKmv(emptyEvents).collect()
    assert(dk.length == 1 && dk(0).getAs[Long]("n_diff_sample") == 0L &&
      dk(0).getAs[Long]("n_exact") == 0L)
    assert(ops.Windows.mlLagFeatures(emptyEvents).count() == 0)
    assert(ops.Aggs.statChangepointCusum(emptyEvents).count() == 0)
    assert(ops.Aggs.statTrimmedMean(emptyEvents).count() == 0)
    // ungrouped final agg -> one row with k = 0 and a null F
    val af = ops.Aggs.statAnovaF(emptyEvents).collect()
    assert(af.length == 1 && af(0).getAs[Long]("k") == 0L &&
      af(0).isNullAt(af(0).fieldIndex("f_stat")))
    assert(ops.Aggs.statHoltWinters(emptyEvents).count() == 0)
    assert(ops.Aggs.aggQuantilesSketch(emptyEvents).count() == 0)
    assert(ops.Aggs.statPoissonDispersion(emptyEvents).count() == 0)
    assert(ext.Dedup.dedupCrossSource(emptyDocs).count() == 0)
    // ungrouped finals over the empty cell/class frames -> one null-ish row
    val cv = ops.Aggs.statCramersV(emptyEvents).collect()
    assert(cv.length == 1 && cv(0).getAs[Long]("n_rows") == 0L &&
      cv(0).isNullAt(cv(0).fieldIndex("cramers_v")))
    val wt = ops.Aggs.statWelchT(emptyEvents).collect()
    assert(wt.length == 1 && wt(0).isNullAt(wt(0).fieldIndex("t_stat")))
    assert(Text.textNgramNovelty(emptyDocs).count() == 0)
    // empty-input sketch reports zero exactly (global agg emits one row)
    val kmv = ops.Aggs.aggDistinctKmvNative(emptyEvents).collect()
    assert(kmv.length == 1 && kmv(0).getAs[Long]("m") == 0L &&
      kmv(0).getAs[Double]("theta") == 1.0 &&
      kmv(0).getAs[Double]("est_distinct") == 0.0)
  }

  test("r6 operators survive empty inputs") {
    import graft.ext._
    assert(ops.Windows.windowHampel(emptyEvents).count() == 0)
    assert(ops.Windows.windowDrawdown(emptyEvents).count() == 0)
    assert(ops.Aggs.statMomentsPerType(emptyEvents).count() == 0)
    assert(ops.Aggs.statGiniRevenue(
      Tables.orders(spark, sf).limit(0)).count() == 1) // global agg: one zero row
    assert(Sessions.eventsRegularityScore(emptyEvents).count() == 0)
    assert(Sessions.eventsRfmScores(emptyEvents).count() == 0)
    assert(Sessions.graphKcore(emptyEvents).count() == 0)
    assert(Sessions.joinIntervalOverlap(emptyEvents).count() == 0)
    assert(ops.Joins.tsDownsampleLttb(emptyEvents).count() == 0)
    assert(ops.Joins.tsKalmanFilter(emptyEvents).count() == 0)
    assert(Sampling.sampleTopkHash(emptyDocs).count() == 0)
  }

  test("r7b operators survive empty inputs") {
    // ungrouped finals -> one row of zeros/nulls; row-emitting ops -> empty
    val kw = ops.RankStats.statKruskalWallis(emptyEvents).collect()
    assert(kw.length == 1 && kw(0).getAs[Long]("k") == 0L &&
      kw(0).isNullAt(kw(0).fieldIndex("h_stat")))
    val mw = ops.RankStats.statMannWhitney(emptyEvents).collect()
    assert(mw.length == 1 && mw(0).isNullAt(mw(0).fieldIndex("u_stat")))
    val sp = ops.RankStats.statSpearmanHourly(emptyEvents).collect()
    assert(sp.length == 1 && sp(0).getAs[Long]("n_hours") == 0L &&
      sp(0).isNullAt(sp(0).fieldIndex("spearman_rho")))
    assert(ops.Windows.tsSmaCrossover(emptyEvents).count() == 0)
    assert(ops.Windows.windowBollinger(emptyEvents).count() == 0)
    assert(ops.Joins.joinBandNumeric(emptyEvents).count() == 0)
    assert(ext.Dedup.dedupEditDistance(emptyDocs).count() == 0)
    val emptyEmb = Tables.embeddings(spark, sf).limit(0)
    assert(ext.Similarity.embTruncationRecall(emptyEmb).count() == 0)
    assert(ops.Windows.windowRsi(emptyEvents).count() == 0)
    assert(ext.Sessions.eventsCohortLtv(emptyEvents).count() == 0)
    assert(ext.Sessions.graphCcSizes(emptyEvents).count() == 0)
    assert(ext.Text.textLangConfusion(emptyDocs).count() == 0)
    // ungrouped 2x2 final over empty classes -> one row, null chi2
    val mm = ops.RankStats.statMoodMedian(emptyEvents).collect()
    assert(mm.length == 1 && mm(0).getAs[Long]("k") == 0L &&
      mm(0).isNullAt(mm(0).fieldIndex("chi2")))
    assert(ops.Aggs.tsSeasonalityStrength(emptyEvents).count() == 0)
    assert(ext.Similarity.embPqCodesLloyd(
      Tables.embeddings(spark, sf).limit(0)).count() == 0)
    assert(ext.Sessions.eventsGrowthAccounting(emptyEvents).count() == 0)
    assert(ext.CorpusPrep.corpusDedupFunnel(emptyDocs).count() == 0)
    assert(ext.Sampling.samplePriorityWeighted(emptyDocs).count() == 0)
    assert(ops.Aggs.statPageHinkley(emptyEvents).count() == 0)
    assert(ops.Aggs.tsSeasonalAnomaly(emptyEvents).count() == 0)
    assert(ext.Sampling.sampleHamiltonAlloc(emptyDocs).count() == 0)
  }
}
