package graft

import graft.ext.{Escapes, Sessions, Similarity}
import graft.ops.RankStats

/** r10 (VERDICT r9 #8): the exact/escape auto-dispatch. For each
  * declared pair: exact chosen under budget, the escape above it (pinned
  * by result equality with the explicitly-invoked forms), identical
  * schemas across the branch, and an unknown query fails loudly naming
  * the known pairs. */
class EscapesSpec extends SparkSpec {

  private val events = Tables.events(spark, "/root/testdata/sf0.001")

  test("census pair: exact under budget, fine above, identical schema") {
    val exact = Sessions.graphTriangles(events).collect()
    val fine = Sessions.graphTriangles(events, bucket = "second").collect()
    assert(exact.toSeq != fine.toSeq, "fixture must distinguish the buckets")

    val under = Escapes.triangles(events)
    val over = Escapes.triangles(events, wedgeBudget = 1L)
    assert(under.collect().toSeq == exact.toSeq)
    assert(over.collect().toSeq == fine.toSeq)
    assert(under.schema == over.schema)

    val lcExact = Sessions.graphLocalClustering(events).collect()
    val lcOver = Escapes.localClustering(events, wedgeBudget = 1L)
    assert(Escapes.localClustering(events).collect().toSeq == lcExact.toSeq)
    assert(lcOver.collect().toSeq ==
      Sessions.graphLocalClustering(events, bucket = "second").collect().toSeq)
    assert(lcOver.schema == Sessions.graphLocalClustering(events).schema)
  }

  test("hodges-lehmann pair: exact under budget, coarse above, identical schema") {
    val vExact = RankStats.hlVocabCount(events)
    val vCoarse = RankStats.hlVocabCount(events, unitCents = 10L)
    assert(vCoarse < vExact, "decicents must actually collapse the vocab")
    val mid = vCoarse.max(vExact - 1) // coarse fits, exact does not

    val under = Escapes.hodgesLehmann(events)
    val over = Escapes.hodgesLehmann(events, maxVocab = mid)
    assert(under.collect().toSeq ==
      RankStats.statHodgesLehmann(events).collect().toSeq)
    assert(over.collect().toSeq ==
      RankStats.statHodgesLehmann(events, maxVocab = mid,
        unitCents = 10L).collect().toSeq)
    assert(under.schema == over.schema)
  }

  test("link-jaccard pair: exact under budget, capped above, identical schema") {
    val under = Escapes.linkJaccard(events)
    val over = Escapes.linkJaccard(events, wedgeBudget = 1L)
    assert(under.collect().toSeq ==
      Sessions.graphLinkJaccard(events).collect().toSeq)
    assert(over.collect().toSeq ==
      Sessions.graphLinkJaccard(events, maxWitnessDeg = 64L).collect().toSeq)
    assert(under.schema == over.schema)
  }

  test("interval-overlap pair: exact under budget, min above, identical schema") {
    val under = Escapes.intervalOverlap(events)
    val over = Escapes.intervalOverlap(events, pairBudget = 1L)
    assert(under.collect().toSeq ==
      Sessions.joinIntervalOverlap(events).collect().toSeq)
    assert(over.collect().toSeq ==
      Sessions.joinIntervalOverlapMin(events).collect().toSeq)
    assert(under.schema == over.schema)
    // the min form must actually shed output on this fixture
    assert(over.count() < under.count(),
      "the 4h sustained-co-presence filter must drop short episodes")
    // and past its budget the EXACT form fails loudly naming the escape
    val e = intercept[IllegalStateException] {
      Sessions.joinIntervalOverlap(events, pairBudget = 1L).collect()
    }
    assert(e.getMessage.contains("join_interval_overlap_min"), e.getMessage)
  }

  test("embedding pairs: exact under budget, lsh above, loud past-budget exact") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // n = 500 -> 124750 pairs; a budget between forces the LSH route
    val exact = Similarity.dedupEmbeddingCosine(emb).collect()
    val lsh = Similarity.dedupEmbeddingCosineLsh(emb).collect()
    assert(exact.toSeq != lsh.toSeq,
      "the sign buckets must actually shed cross-bucket pairs on this fixture")

    val under = Escapes.embeddingCosine(emb)
    val over = Escapes.embeddingCosine(emb, pairBudget = 1000L)
    assert(under.collect().toSeq == exact.toSeq)
    assert(over.collect().toSeq == lsh.toSeq)
    assert(under.schema == over.schema)

    val knnExact = Similarity.simKnnJoin(emb).collect()
    val knnUnder = Escapes.knnJoin(emb)
    val knnOver = Escapes.knnJoin(emb, pairBudget = 1000L)
    assert(knnUnder.collect().toSeq == knnExact.toSeq)
    assert(knnOver.collect().toSeq == Similarity.simKnnJoinLsh(emb).collect().toSeq)
    assert(knnUnder.schema == knnOver.schema)

    // and past its budget each EXACT form fails loudly naming its escape
    val e1 = intercept[IllegalStateException] {
      Similarity.dedupEmbeddingCosine(emb, pairBudget = 1000L).collect()
    }
    assert(e1.getMessage.contains("dedup_embedding_cosine_lsh"), e1.getMessage)
    val e2 = intercept[IllegalStateException] {
      Similarity.simKnnJoin(emb, pairBudget = 1000L).collect()
    }
    assert(e2.getMessage.contains("sim_knn_join_lsh"), e2.getMessage)
  }

  test("shingle pairs: exact under the expansion budget, df<=64 capped above") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = graft.ext.Dedup.dedupNgramJaccard(docs).collect()
    val capped = graft.ext.Dedup.dedupNgramJaccard(docs, maxDf = 64).collect()
    val under = Escapes.ngramJaccard(docs)
    val over = Escapes.ngramJaccard(docs, pairBudget = 1L)
    assert(under.collect().toSeq == exact.toSeq)
    assert(over.collect().toSeq == capped.toSeq)
    assert(under.schema == over.schema)

    val cExact = graft.ext.Dedup.dedupContainment(docs).collect()
    val cUnder = Escapes.containment(docs)
    val cOver = Escapes.containment(docs, pairBudget = 1L)
    assert(cUnder.collect().toSeq == cExact.toSeq)
    assert(cOver.collect().toSeq ==
      graft.ext.Dedup.dedupContainment(docs, maxDf = 64).collect().toSeq)
    assert(cUnder.schema == cOver.schema)

    // past its budget the EXACT expansion fails loudly naming the escapes
    // (maxDf 999 dodges the already-memoized 1000-cap frame so the
    // pre-flight actually runs)
    val e = intercept[IllegalStateException] {
      graft.ext.Dedup.dedupNgramJaccard(docs, maxDf = 999, pairBudget = 1L)
        .collect()
    }
    assert(e.getMessage.contains("dedup_ngram_jaccard_capped"), e.getMessage)
  }

  test("every declared pair is dispatchable and has both members in queries") {
    assert(Escapes.pairs.size == 9)
    Escapes.pairs.foreach { case (exact, escape) =>
      assert(SparkEntry.queries.contains(exact), s"$exact not declared")
      assert(SparkEntry.queries.contains(escape), s"$escape not declared")
    }
  }

  test("dispatch routes by name; unknown queries fail naming the pairs") {
    assert(Escapes.dispatch("graph_triangles", events).collect().toSeq ==
      Sessions.graphTriangles(events).collect().toSeq)
    val e = intercept[IllegalArgumentException] {
      Escapes.dispatch("agg_count_by_type", events)
    }
    assert(e.getMessage.contains("stat_hodges_lehmann") &&
      e.getMessage.contains("graph_triangles"), e.getMessage)
  }
}
