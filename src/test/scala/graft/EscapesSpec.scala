package graft

import graft.ext.{Escapes, Sessions}
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
