package graft

import org.apache.spark.sql.types._

/** Day-one robustness: the declared document queries must execute (and
  * return empty, not crash) against an EMPTY documents table — the state
  * a fresh pipeline deployment starts from. This is a different failure
  * surface from EmptyInputSpec's op-level checks: it exercises the full
  * query fns end-to-end, including driver-side phases (the importance
  * resample's stat collect, BPE's train loop) whose empty-input branches
  * a non-empty corpus never reaches.
  */
class EmptyTablesSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = TempDirs.create("graft-empty-sf")
    def write(name: String, schema: StructType): Unit =
      spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          schema)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    write("documents", StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType))))
    // fact/dim tables for the round-11 entries (regression, enrichment):
    // only the columns the queries touch — the scan schema is pruned
    // anyway, and the point is the empty-input branch, not the layout
    write("lineitem", StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType))))
    write("events", StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType))))
    write("customer", StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", LongType),
      StructField("c_mktsegment", StringType),
      StructField("c_acctbal", DoubleType))))
    write("part", StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType))))
    write("nation", StructType(Seq(
      StructField("n_nationkey", LongType),
      StructField("n_name", StringType),
      StructField("n_regionkey", LongType))))
    write("orders", StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType))))
    write("supplier", StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", LongType),
      StructField("s_acctbal", DoubleType))))
    write("region", StructType(Seq(
      StructField("r_regionkey", LongType),
      StructField("r_name", StringType))))
    write("embeddings", StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))))
    dir
  }

  private val docQueries = Seq(
    "q_curriculum", "q_quality_classifier", "q_importance_resample",
    "q_novelty", "q_vocab_growth", "q_shard_tokens", "q_token_budget",
    "q_weighted_sample", "q_bpe_train", "q_bpe_apply", "q_stream_dedup",
    // round 9, maintenance + tokenizer tiers: CDC on an empty base is an
    // empty merge; the streaming form must survive a zero-file source
    "q_cdc_merge", "q_snapshot_diff", "q_kanon", "q_ppl_bucket",
    "q_unigram_viterbi", "q_stream_cdc",
    // round 11: NB train/serve on an empty corpus fits/serves nothing;
    // regression and the enrichment drain survive empty fact tables
    "q_nb_train", "q_nb_classify", "q_regression", "q_stream_enrich",
    "q_ab_test", "q_info_gain", "q_rrf_fusion", "q_anomaly",
    "q_auc", "q_tfidf_knn", "q_calibration", "q_ndcg",
    // round 11: drift/basket/spectrum rollups over empty fact tables
    "q_ks_test", "q_assoc_rules", "q_freq_spectrum",
    // round 11: agreement/survival/digit audits over empty inputs
    "q_kappa", "q_survival", "q_benford",
    // round 11: graph rank / concentration / divergence / seasonality
    "q_pagerank", "q_gini", "q_js_div", "q_seasonality",
    // round 11: change-point / trend / cross-correlation rollups
    "q_cusum", "q_trend_mk", "q_xcorr",
    // round 11: path / dwell / Zipf over empty inputs
    "q_event_paths", "q_dwell", "q_zipf_slope",
    // round 11: the streaming transition drain over a zero-event source
    "q_stream_transitions",
    // round 11: the streaming quality gate over an empty corpus
    "q_stream_quarantine",
    // round 11: segmentation / diversity over empty events
    "q_rfm", "q_user_entropy",
    // round 11: the TPC-H join shapes over empty facts
    "q_tpch_q5", "q_tpch_q4",
    // round 11: the outer-join histogram, the HAVING-rehydrate join,
    // and the semi+anti sole-late-supplier pair over empty facts
    "q_tpch_q13", "q_tpch_q18", "q_tpch_q21",
    // round 11: the Welch test, the Gopher rule battery, and the
    // tie-averaged Spearman ranks over empty inputs
    "q_welch", "q_gopher_rules", "q_spearman",
    // round 11: the integer power iteration and its projections over
    // an empty embeddings table
    "q_pca_power", "q_pca_project",
    // round 11: Lloyd k-means over an empty embeddings table
    "q_kmeans",
    // round 11: attribution over empty events (no purchases → no rows)
    "q_attribution",
    // round 11: Hilbert keys over empty events
    "q_hilbert",
    // round 11: the gains table over an empty corpus
    "q_lift",
    // round 11: argmin join-back, winsorized rollup, and l-diversity
    // over empty inputs
    "q_tpch_q2", "q_winsorize", "q_l_diversity",
    // round 11: the bucketed join over an empty corpus
    "q_join_bucketed",
    // round 11: the bootstrap over empty facts
    "q_bootstrap",
    // round 11: the streaming asof over a zero-event source
    "q_stream_asof",
    // round 11: share-of-total, confusion matrix, rolling actives
    "q_tpch_q11", "q_confusion", "q_rolling_actives",
    // round 11: the LTV triangle over empty events
    "q_ltv",
    // round 11: the resize projection over an empty corpus
    "q_multimodal_resize",
    // round 12: the top-N join composite, the double-distinct
    // supplier count, and the global-benchmark anti-join over empty
    // facts
    "q_tpch_q3", "q_tpch_q16", "q_tpch_q22",
    // round 12: the rank test over empty events and the TVD audit
    // over an empty corpus
    "q_kruskal", "q_t_closeness",
    // round 12: community vote, KN smoothing, and repetition profiles
    // over an empty corpus
    "q_label_prop", "q_kneser_ney", "q_repetition_full",
    // round 12: the spatial radius join and the concurrency sweep
    // over empty events
    "q_grid_join", "q_concurrency",
    // round 13 (r12 boundary queries): CUPED and SRM over empty
    // events; HITS and the batched decode over an empty corpus
    "q_cuped", "q_srm", "q_hits", "q_multimodal_decode",
    // round 13: the streaming cell assignment over empty embeddings
    "q_stream_ivf_assign",
    // round 13: the TPC-H completion batch over empty facts/dims
    "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q12",
    "q_tpch_q14", "q_tpch_q17", "q_tpch_q19", "q_tpch_q20",
    // round 14: the TPC-H literal-number completion (Q1/Q6 are grouped
    // aggregates precisely so an empty fact yields 0 groups, not a
    // NULL-sum row)
    "q_tpch_q1", "q_tpch_q6", "q_tpch_q10", "q_tpch_q15",
    // round 14: an empty corpus has no kNN edges, so the forest, the
    // node set, and every cut are empty
    "q_single_linkage",
    // round 14: a per-row projection of zero rows is zero rows
    "q_random_projection",
    // round 14: an empty corpus has no candidate edges, so every peel
    // round and the core report are empty
    "q_kcore",
    // round 14: no docs, no assignments, no leak rows
    "q_leakage_split")

  test("document queries return empty results on an empty corpus") {
    docQueries.foreach { q =>
      val n = try SparkEntry.queries(q)(spark, emptyDir).count()
      catch {
        case e: Exception =>
          fail(s"$q crashed on the empty corpus: $e")
      }
      assert(n == 0L, s"$q must be empty on an empty corpus, got $n rows")
    }
  }
}
