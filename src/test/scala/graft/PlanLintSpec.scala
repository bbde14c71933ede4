package graft

/** Blanket plan lint over EVERY declared query: no CartesianProduct
  * anywhere, and BroadcastNestedLoopJoin only where a bounded broadcast
  * side justifies it (explicit allowlist, each entry tied to a documented
  * bounded frame). Individual PlanSpec gates check the plans we designed;
  * this gate catches the plan we DIDN'T notice regressing — a new query
  * or an optimizer change quietly going all-pairs fails here first. */
class PlanLintSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  // BNLJ-bearing queries with a bounded broadcast side, each justified at
  // its implementation site (block-pair tables, 1-row agg frames, ≤3-row
  // tier dims, 1-row sketch frames)
  private val bnljAllowed = Set(
    "dedup_embedding_cosine", "dedup_semantic_clusters", // ≤36-row block pairs
    "sim_knn_join",                                      // same block-pair core
    "join_range_tier",                                   // 3-row tier dim
    "layout_zorder_skipping",                            // 1-row bounds agg
    "agg_distinct_kmv",                                  // 1-row sketch frames
    "text_tfidf_topk", "text_token_lift",                // 1-row n_docs frames
    "agg_quantiles_banded", "clean_winsorize",           // bounded bound-frames
    "agg_quantiles_sampled",                             // 1-row sample-size frame
    "filter_time_threshold",                             // 1-row max-ts frame
    "sim_search_cosine_topk",                            // ≤nQueries-row query side
    "sim_search_hamming_topk",                           // ≤nQueries-row query side
    "events_dau_mau",                                    // bounded days×(domain/32) grid
    "tpch_idle_customer_balance",                        // 1-row avg-balance frame
    "tpch_part_value_concentration",                     // 1-row grand-total frame
    "agg_distinct_intersect_kmv",                        // 1-row theta/exact frames
    "agg_distinct_union_kmv",                            // 1-row theta/exact frames
    "agg_distinct_diff_kmv",                             // 1-row theta/exact frames
    "stat_chi_square",                                   // classes×4 dense grid cross
    "graph_triangles", "graph_triangles_fine",           // 1-row census frames
    "events_rfm_scores",                                 // 1-row n_users frame (r6 banded ntile)
    "events_pareto_deciles",                             // 1-row max-rank frame (r6)
    "agg_quantiles_sketch",                              // 3-row quantile dim (r7)
    "stat_cramers_v",                                    // classes×4 dense grid cross (r7)
    "graph_degree_assortativity",                        // 1-row n_nodes frame (r7)
    "stat_kruskal_wallis", "stat_mann_whitney",          // 1-row tie-sum frames (r7)
    "stat_mood_median",                                  // 1-row median/total frames (r7)
    "emb_truncation_recall",                             // ≤nQueries-row query sides (r7)
    "events_growth_accounting",                          // 1-row data-end cap (r7)
    "sample_priority_weighted",                          // 1-row tau frame (r7)
    "sample_hamilton_alloc",                             // 1-row total/extra frames (r7)
    "stat_kendall_tau",                                  // hour-pair inequality join over the time-bounded hourly frame (r8)
    "events_type_affinity",                              // 1-row n_baskets frame (r8)
    "sim_search_ivf_recall",                             // ≤nQueries-row query side via sim_search_cosine_topk (r8)
    "stat_friedman",                                     // ≤k-row class dim grid cross + 1-row totals frame (r8)
    "stat_kendall_tau_merge",                            // 1-row crosses: count × inversion-total × 3 tie frames (r9)
    "stat_cointegration",                                // 1-row step-1 sums frame crossed onto the hourly frame (r9)
    "layout_hilbert_skipping",                           // 1-row bounds agg × 3 layout orders (r9)
    "stat_wilcoxon_signed_rank",                         // 1-row W⁺ frame crossed onto the 1-row totals frame (r9)
    "events_markov_stationary",                          // 1-row state-count frame crossed onto the ≤k-row state dim (r9)
    "stat_cochran_q",                                    // 1-row user-sums frame crossed with the 1-row class-sums frame (r9)
    "text_distinctive_terms",                            // 1-row corpus-total frame crossed onto the vocab frame (r9)
    "stat_ansari_bradley",                               // 1-row totals frame crossed onto the vocab frame (r9)
    "graph_modularity",                                  // 1-row (m, Q) frame crossed onto the ≤k-row community frame (r9)
    "events_survival_km",                                // 1-row corpus-horizon (max ts) frame crossed onto the fact scan (r9)
    "agg_distinct_hll_union",                            // 1-row sketch rollup crossed with the 1-row exact audit (r9)
    "sample_neyman_alloc",                               // ≤#strata weight frame crossed with 1-row budget totals (the Hamilton shape, r9)
    "stat_cucconi",                                      // 1-row totals frame crossed onto the vocab frame (the rank-test shape, r9)
    "stat_cronbach_alpha",                               // 1-row hour-count frame crossed onto the ≤k item/total frames (r9)
    "stat_somers_d",                                     // hour-pair inequality join over the time-bounded hourly frame (the stat_kendall_tau shape, r10)
    "stat_jonckheere",                                   // 24-row hour-of-day dim crossed onto the day/vocab frames + 1-row totals (r10)
    "stat_page_trend",                                   // ≤k-row class dim grid cross (the stat_friedman shape, r10)
    "stat_cohen_kappa",                                  // 1-row Σrc frame crossed onto the 1-row totals frame (r10)
    "graph_rich_club",                                   // 5-row threshold ladder dim (the join_range_tier shape, r10)
    "stat_quade",                                        // ≤k-row class dim grid cross + 1-row totals frame (the stat_friedman shape, r10)
    "stat_kendall_w",                                    // ≤k-row class dim grid cross (the stat_friedman shape, r10b)
    "sim_search_mips",                                   // ≤nQueries-row query side + 1-row max-norm frame (r10b)
    "sample_kfold",                                      // 1-row total frame crossed onto the k-row fold rollup (r10b)
    "sample_temporal_split",                             // 1-row span frame crossed onto the fact scan (the events_survival_km shape, r10b)
    "stat_ad_twosample",                                 // 1-row totals frame crossed onto the vocab frame (the rank-test shape, r10b)
    "sample_group_kfold",                                // 1-row total frame crossed onto the k-row fold rollup (r10b)
    "stat_mood_scale",                                   // 1-row totals frame crossed onto the vocab frame (the rank-test shape, r11)
    "auto_embedding_dedup",                              // routes to dedup_embedding_cosine: broadcast block-pair dim (allowlisted exact form, r11)
    "auto_knn_join",                                     // routes to sim_knn_join: broadcast block-pair dim (allowlisted exact form, r11)
    "auto_triangles",                                    // routes to graph_triangles: its allowlisted 1-row census shape (r11)
    "sim_search_range",                                  // ≤nQueries-row query side (the cosine-topk shape, r12)
    "dedup_threshold_curve",                             // 8-row broadcast threshold ladder (r12)
    "stat_conover_squared_ranks",                        // 1-row stats + bounded bucket-base frames (r12)
    "dedup_embedding_lsh_recall",                        // composes dedup_embedding_cosine: broadcast block-pair dim (allowlisted exact form, r13)
    "sim_knn_lsh_recall",                                // composes sim_knn_join: broadcast block-pair dim (allowlisted exact form, r13)
    "stat_hodges_lehmann_err",                           // 1-row exact HL crossed with the 1-row coarse HL (escape audit, r13)
    "graph_census_bucket_shift",                         // 1-row minute census crossed with the 1-row second census (escape audit, r13)
    "join_interval_overlap_shed"                         // 1-row exact rollup crossed with the 1-row sustained rollup (escape audit, r13)
  )

  test("no declared query plans a CartesianProduct; BNLJ only on the allowlist") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable =>
          offenders += s"$name: plan construction failed: ${e.getMessage}"; ""
        }
      if (plan.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
        offenders += s"$name: unexpected BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty, s"plan lint failures:\n${offenders.mkString("\n")}")
  }
}
