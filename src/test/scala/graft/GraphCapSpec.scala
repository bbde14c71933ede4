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

  test("census wedge budget fails loudly, naming the fine-bucket escape") {
    val e = intercept[IllegalStateException] {
      Sessions.graphTriangles(events, wedgeBudget = 1L)
    }
    assert(e.getMessage.contains("graph_triangles_fine"), e.getMessage)
    val e2 = intercept[IllegalStateException] {
      Sessions.graphLocalClustering(events, wedgeBudget = 1L)
    }
    assert(e2.getMessage.contains("graph_local_clustering_fine"), e2.getMessage)
  }

  test("fine-bucket local clustering: degrees subgraph-bounded, credits consistent") {
    val minute = Sessions.graphLocalClustering(events)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"))).toMap
    val second = Sessions.graphLocalClustering(events, bucket = "second").collect()
    // same second => same minute: every fine-graph node exists in the
    // minute graph with at least its fine degree and triangle count
    assert(second.nonEmpty, "fixture second-level co-activity exists")
    assert(second.forall { r =>
      minute.get(r.getAs[Long]("user_id")).exists { case (d, t) =>
        d >= r.getAs[Long]("degree") && t >= r.getAs[Long]("n_triangles")
      }
    })
    // per-node triangle credits sum to 3x the census triangle count
    val tri = Sessions.graphTriangles(events, bucket = "second").collect()(0)
    assert(second.map(_.getAs[Long]("n_triangles")).sum ==
      3L * tri.getAs[Long]("n_triangles"))
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
