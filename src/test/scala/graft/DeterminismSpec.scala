package graft

/** SURVEY §5.2.5: representative queries must produce identical results
  * under different shuffle-partition counts — catches collect-order,
  * tie-break, and float-accumulation nondeterminism classes (§2.11.2/3)
  * without the external oracle.
  */
class DeterminismSpec extends SparkSpec {

  private val queries =
    Seq("q_pipeline", "q_dedup_minhash", "q_similarity", "q_merge",
      "q_topk_collect", "q_sessionize", "q_simhash_dedup", "q_skew_salt",
      "q_stratified_sample", "q_join_outer", "q_contamination",
      "q_shard_split",
      // round 6: integer-LSH/PQ twins and the greedy span fold — their
      // determinism IS the property their oracle hash-checks rely on
      "q_similarity_ann_exact", "q_pq_refine", "q_entity_spans",
      "q_edit_distance", "q_pipeline_incremental", "q_knn_graph_mixed",
      // round 8: bounded-output miners — the top-k cut's tie-breaks are
      // load-bearing for the oracle hash
      "q_containment_topk", "q_edit_distance_topk", "q_containment_graph",
      "q_edit_distance_graph",
      // round 8: format-scan roundtrips + the compaction binning window
      "q_scan_csv", "q_scan_partitioned", "q_compaction_plan",
      // round 8: zone maps — the sorted variant's global rank window is
      // the tie-break-sensitive piece
      "q_zonemap", "q_zonemap_sorted", "q_zonemap_contains",
      "q_zonemap_zorder",
      // round 8: the expectations gate (multi-table union of counts)
      // and its row-level quarantine split
      "q_constraints", "q_quarantine",
      // round 9: PPSWOR min-key ranks and the distributed prefix sum —
      // both hash-gated on exact rank/cumsum order — plus the composed
      // recipe whose stage boundaries depend on both
      "q_weighted_sample", "q_token_budget", "q_data_recipe",
      // round 9, selection tier: global limit-then-number cuts, the
      // stat-literal injection (importance), and min-key PPSWOR ranks
      "q_curriculum", "q_quality_classifier", "q_importance_resample",
      "q_novelty",
      // round 9, tokenizer trainer: driver-looped argmax + literal
      // replaces — the merge table and merged vocab must not depend on
      // partitioning
      "q_bpe_train", "q_bpe_apply",
      // round 9: shard boundaries from the distributed prefix sum over
      // the sha-shuffle order; the growth curve's twin running totals;
      // the real streaming run (state merged across micro-batches)
      "q_shard_tokens", "q_vocab_growth", "q_stream_dedup",
      // round 9: the fuzzy-dedup recipe — cluster reps feeding the
      // budget selection must not depend on partitioning
      "q_data_recipe_fuzzy",
      // round 9: density roles + CC cluster labels + pinned border
      // assignment must not depend on partitioning
      "q_dbscan",
      // round 9: session state merged across micro-batches must not
      // depend on partitioning or file-slice boundaries
      "q_stream_sessionize",
      // round 9: the streaming leaderboard's top-K cut tie-break must
      // not depend on partitioning or batch arrival order
      "q_stream_topk",
      // round 9: the vocab top-N cut and greedy segmentation must not
      // depend on partitioning
      "q_wordpiece_apply",
      // round 9: frontier membership and the pruned keep-set must not
      // depend on partitioning
      "q_skyline", "q_dbscan_prune",
      // round 9: rank-selected quartiles + fence membership must not
      // depend on partitioning
      "q_outliers",
      // round 9, maintenance tier: the latest-per-key tie-break is the
      // MERGE semantics; the diff and audit must not depend on layout
      "q_cdc_merge", "q_snapshot_diff", "q_kanon",
      // round 9: rank-selected tercile boundaries + the checkpointed
      // density table must not depend on partitioning
      "q_ppl_bucket",
      // round 9: the vocab cost table (top-200 cut + quantized -ln) and
      // the Viterbi tie-break must not depend on partitioning
      "q_unigram_viterbi",
      // round 9: CDC state merged across micro-batches must not depend
      // on partitioning or file-slice boundaries
      "q_stream_cdc",
      // round 9: three serving chains and their vocab/merge fits in one
      // report — any family's nondeterminism moves the fertility table
      "q_tokenizer_compare",
      // round 9: IGNORE-NULLS neighbor windows + truncated-division
      // interpolants must not depend on partitioning
      "q_interpolate",
      // round 9: first-seen counting + the shared-range prefix sums
      // must not depend on partitioning
      "q_user_growth",
      // round 11: the NB argmin's (score, class) tie-break and the
      // regression's exact moment sums must not depend on partitioning
      "q_nb_classify", "q_regression",
      // round 11: the fused top-k's (rrf, nbr) tie-break rides TWO rank
      // windows; the entropy/chi-square integer sums must be order-free
      "q_rrf_fusion", "q_info_gain", "q_ab_test",
      // round 11: the trailing-frame moments ride a per-series sort
      "q_anomaly",
      // round 11: the AUC rank-sum's score-ordered running window and
      // the sparse reranker's (cos, nbr) top-k tie-break must not
      // depend on partitioning
      "q_auc", "q_tfidf_knn",
      // round 11: observed-range binning and the double-window NDCG
      // (system rank + ideal rank) must not depend on partitioning
      "q_calibration", "q_ndcg",
      // round 11: the KS argmax join-back, the basket pair explode, and
      // the spectrum's GT shift join must not depend on partitioning
      "q_ks_test", "q_assoc_rules", "q_freq_spectrum",
      // round 11: the KM cumulative hazard rides ordered windows; the
      // kappa cells and digit rollup must be order-free integer sums
      "q_survival", "q_kappa", "q_benford",
      // round 11: the iterative integer rank fixed point, the per-source
      // rank window, the top-V vocab cut, and the dow index windows
      "q_pagerank", "q_gini", "q_js_div", "q_seasonality",
      // round 11: ordered prefix/extrema windows, the day-pair sign
      // sum, and the lag-aligned moment sums must be partition-free
      "q_cusum", "q_trend_mk", "q_xcorr",
      // round 11: the path/dwell lead windows' (ts, event_id) order,
      // the top-20 path cut, and the top-K rank for the Zipf fit
      "q_event_paths", "q_dwell", "q_zipf_slope",
      // round 11: the streaming transition counter's keyed state and
      // per-batch in-group sort must not depend on partitioning
      "q_stream_transitions", "q_stream_quarantine",
      // round 11: the tercile rank windows' (metric, user_id) total
      // order and the quantized entropy sums
      "q_rfm", "q_user_entropy",
      // round 11: the fact-fact join chain and the EXISTS semi-join
      "q_tpch_q5", "q_tpch_q4",
      // round 11: the outer-join zero bucket, the HAVING cut, and the
      // checkpointed semi+anti late-supplier pair
      "q_tpch_q13", "q_tpch_q18", "q_tpch_q21",
      // round 11: the exact arm moments, the regex rule battery, and
      // the tie-doubled rank windows must be partition-independent
      "q_welch", "q_gopher_rules", "q_spearman",
      // round 11: the covariance outer product and the 5-round integer
      // matvec fixed point must be partition-independent
      "q_pca_power", "q_pca_project",
      // round 11: the (dist, cid) argmin and truncating centroid means
      // must be partition-independent across all three Lloyd rounds
      "q_kmeans",
      // round 11: the RANGE-framed attribution windows and the keyed
      // streaming funnel state machine
      "q_attribution", "q_stream_funnel",
      // round 11: the unrolled Hilbert rotate/flip levels
      "q_hilbert",
      // round 11: the (score desc, doc_id) decile total order
      "q_lift",
      // round 11: the argmin join-back, the rank-selected clamps, and
      // the class-distinct diversity rollup
      "q_tpch_q2", "q_winsorize", "q_l_diversity",
      // round 11: the bucketed-layout roundtrip join
      "q_join_bucketed",
      // round 11: the sha-seeded Poisson replicate lanes
      "q_bootstrap",
      // round 11: the per-batch point-in-time enrichment drain
      "q_stream_asof",
      // round 11: the global-share cut, the NB confusion rollup, and
      // the window-day contribution dedup
      "q_tpch_q11", "q_confusion", "q_rolling_actives",
      // round 11: the cohort LTV cumulative window
      "q_ltv",
      // round 11: the resize geometry projection
      "q_multimodal_resize",
      // round 12: the (revenue desc, orderkey) top-10 total order, the
      // pair-dedup + distinct-agg composite, and the cross-multiplied
      // global-mean cut + anti-join
      "q_tpch_q3", "q_tpch_q16", "q_tpch_q22",
      // round 12: the shared-exchange rank/tie windows and the dense
      // integer TVD grid must be partition-independent
      "q_kruskal", "q_t_closeness",
      // round 12: the 3-round majority-vote fixed point, the cleared-
      // denominator KN arithmetic + top-200 cut, and the scan-side
      // n-gram profiles
      "q_label_prop", "q_kneser_ney", "q_repetition_full",
      // round 12: the cell-offset candidate join and the boundary
      // sweep's (t, delta, user) total order
      "q_grid_join", "q_concurrency",
      // round 13 (r12 boundary queries): the order-free CUPED
      // sufficient statistics, the max-normalized HITS half-rounds,
      // the (day, user)-dedup SRM cells, and the per-partition
      // byte-fold decode
      "q_cuped", "q_hits", "q_srm", "q_multimodal_decode",
      // round 13: the per-row streaming cell assignment (batching and
      // partitioning must not move any vector's cell)
      "q_stream_ivf_assign",
      // round 13: the TPC-H completion batch — bidirectional pair
      // filter, single-rollup shares, signed profit sums, delay
      // buckets, cross-multiplied avg cut, residual disjunction, and
      // the scale-invariant volume gate
      "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q12",
      "q_tpch_q14", "q_tpch_q17", "q_tpch_q19", "q_tpch_q20",
      // round 14: the TPC-H literal-number completion — one-scan
      // rollups, the broadcast-ordered Q10 top-20 total order, and the
      // Q15 integer max-equality ties
      "q_tpch_q1", "q_tpch_q6", "q_tpch_q10", "q_tpch_q15",
      // round 14: the Borůvka forest's (w, a, b) total order makes the
      // picked edge set — and so every dendrogram cut — partitioning-
      // invariant
      "q_single_linkage",
      // round 14: the JL projection is a pure per-row integer fold —
      // trivially partitioning-invariant, pinned anyway
      "q_random_projection",
      // round 14: the peel recurrence is a pure set fixpoint — the
      // alive set after each round is partitioning-independent
      "q_kcore",
      // round 14: content-addressed assignment + min-label CC — both
      // partitioning-invariant by construction
      "q_leakage_split")

  private def diff(qs: Seq[String], dir: String): Unit = {
    val conf = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(conf)
    def runAll(): Map[String, Seq[String]] = qs.map { q =>
      q -> SparkEntry.queries(q)(spark, dir)
        .collect().map(_.toString).toSeq.sorted
    }.toMap
    try {
      spark.conf.set(conf, "7")
      val a = runAll()
      spark.conf.set(conf, "4")
      val b = runAll()
      qs.foreach { q =>
        assert(a(q) == b(q), s"$q differs across partition counts")
        assert(a(q).nonEmpty, s"$q returned nothing")
      }
    } finally spark.conf.set(conf, orig)
  }

  test("results identical under shuffle.partitions 4 vs 7") {
    diff(queries, sf0001)
  }

  test("heavy tier at sf0.1: kNN/PQ/edit-distance identical under 4 vs 7 partitions") {
    // r7 verdict #6: certify determinism at the BENCH scale factor, not
    // just the correctness-gate SFs — the kNN bucket sampling, PQ
    // codebook fit, and banded-DP verify all involve per-partition
    // evaluation order that must not reach the output
    diff(Seq("q_knn_graph", "q_knn_graph_embed", "q_pq_refine",
      "q_edit_distance"), sf01)
  }
}
