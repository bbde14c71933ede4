package graft

import graft.ext.Sessions

/** r9 (sf1 slope experiment): the link-Jaccard density hardening.
  *  - cap ≥ max degree reproduces the exact form bit-for-bit (the capped
  *    escape is a strict generalization);
  *  - the wedge-budget pre-flight fails LOUDLY with an actionable message
  *    instead of committing a Σdeg²-row shuffle that kills the context;
  *  - capped common counts never exceed exact ones (lower-bound claim). */
class GraphCapSpec extends SparkSpec {

  private val events = Tables.events(spark, "/root/testdata/sf0.001")

  test("cap >= max degree reproduces the exact ranking bit-for-bit") {
    val exact = Sessions.graphLinkJaccard(events).collect()
    val capped = Sessions.graphLinkJaccard(events, maxWitnessDeg = 1000000L).collect()
    assert(exact.toSeq == capped.toSeq)
    assert(exact.nonEmpty, "fixture must produce candidates")
  }

  test("wedge budget pre-flight fails loudly, naming the escape") {
    val e = intercept[IllegalStateException] {
      Sessions.graphLinkJaccard(events, wedgeBudget = 1L)
    }
    assert(e.getMessage.contains("maxWitnessDeg"), e.getMessage)
    assert(e.getMessage.contains("graph_link_jaccard_capped"), e.getMessage)
  }

  test("bucket width is a real density knob: finer buckets give a subgraph") {
    val minute = Sessions.graphTriangles(events).collect()(0)
    val second = Sessions.graphTriangles(events, bucket = "second").collect()(0)
    // same second => same minute, so the second-bucket graph is a subgraph
    assert(second.getAs[Long]("n_edges") <= minute.getAs[Long]("n_edges"))
    assert(second.getAs[Long]("n_wedges") <= minute.getAs[Long]("n_wedges"))
    assert(minute.getAs[Long]("n_edges") > 0, "fixture co-activity exists")
  }

  test("capped witnesses only discount: common counts are lower bounds") {
    val exact = Sessions.graphLinkJaccard(events, k = 1000000)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        r.getAs[Long]("common")).toMap
    val capped = Sessions.graphLinkJaccard(events, k = 1000000, maxWitnessDeg = 2L)
      .collect()
    assert(capped.forall { r =>
      exact.get((r.getAs[Long]("a"), r.getAs[Long]("b")))
        .exists(_ >= r.getAs[Long]("common"))
    })
  }
}
