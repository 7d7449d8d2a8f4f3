package graft

/** Cross-environment determinism guard: every oracle-checked query must
  * produce IDENTICAL ordered output regardless of
  * spark.sql.shuffle.partitions — the knob that differs between this
  * suite (4), the driver's Verify run, and a real cluster. Queries with
  * incomplete ORDER BY tie-breaks or order-sensitive float accumulation
  * fail here before they flake in the correctness gate.
  */
class DeterminismSpec extends SparkSpec {

  // the order/shuffle-sensitive shapes: total sorts over duplicate-heavy
  // keys, windows, multi-stage dedup joins, sampling, session windows
  private val risky = Seq(
    "ingest_lineitem", "q_filter", "q_align", "q_window_frame",
    "q_window_lag", "q_window_dist", "q_window_first", "q_topk_agg",
    "q_sample", "q_dedup_minhash", "q_text_jaccard", "q_sessionize",
    "q_gapfill", "q_corpus_pipeline", "q_embed_pipeline", "q_stats",
    "q_unpivot", "q_stringagg", "q_scalar_math", "q_chargram_jaccard",
    "q_dedup_cc",
    // round-3 shapes with float math, multi-pass windows, or cross-corpus
    // joins whose shuffle layout must not leak into results
    "q_bm25", "q_simsearch_pq", "q_winnow", "q_contamination",
    "q_containment", "q_lm_coverage", "q_asof_nearest", "q_corr",
    "q_session_window", "q_dedup_incremental", "q_repetition",
    "q_knn_graph", "q_quality_model", "q_split_leakage",
    // round-4 shapes: ensemble pair union + cc, percentile join-backs,
    // exact-ratio ln scores, grid downsample struct-max
    "q_dedup_ensemble", "q_mad", "q_zscore", "q_pmi", "q_entropy",
    "q_resample", "q_bloom_join", "q_kmeans",
    // round-4-continued shapes: per-shard windows (packing/interleave),
    // collect_list reconstruction, CDC chunk streams, funnel stage
    // joins, INTERSECT-based recall, correlated EXISTS/NOT EXISTS
    "q_pack", "q_interleave", "q_curriculum", "q_dedup_cdc",
    "q_boilerplate", "q_funnel", "q_retention", "q_scd2",
    "q_simsearch_recall", "q_sql_tpch21", "q_langid_eval",
    "q_chunk_windows", "q_join_interval", "q_minhash_calib",
    "q_mixture_alpha",
    // round-5 shapes: forced prefix paths, span postings + island
    // windows + collect_set rebuilds, per-cluster argmax ties, the
    // sketch-rank gate (booleans must hold at ANY partitioning), and
    // both real-codec mapPartitions pipelines
    "q_jaccard_prefix", "q_containment_prefix", "q_span_dedup",
    "q_span_excise", "q_span_decontam", "q_dedup_keepbest",
    "q_approx_percentile", "q_image_ppm", "q_video_y4m",
    // the four completing TPC-H shapes: LIMIT under a total order,
    // decimal HAVING vs global scalar, profit rollup, NOT IN
    "q_sql_tpch2", "q_sql_tpch9", "q_sql_tpch11", "q_sql_tpch16",
    // round-8 shapes: kmeans-cell pair graph + cc (cluster ids must not
    // depend on shuffle layout), bounded-heap quota winners, the
    // Aho–Corasick screen (narrow, but keep flag rides a threshold)
    "q_semantic_dedup", "q_semantic_dedup2", "q_source_quota",
    "q_blocklist",
    // round-10 shapes: banded Hamming self-join pair sets + bit_count
    // distances, SQ8 per-dim stats collected at plan build (two
    // captures must agree), driver-loop tokenizer training (WordPiece
    // winner ties), CMS bucket sums, z-values, the recursive walk
    "q_image_neardup", "q_simsearch_sq", "q_wordpiece", "q_cms",
    "q_zorder", "q_sql_recursive",
    // round-11 shapes: persisted-index loads (stats/codes collected at
    // plan build must agree across partitionings), the LZ walk + radix
    // quantile gate, rank-statistic AUC, largest-remainder quotas,
    // per-column union profiling, canon-chain string folds feeding a
    // version aggregation
    "q_simsearch_ivf_idx", "q_simsearch_pq_idx", "q_simsearch_sq_idx",
    "q_comp_ratio", "q_comp_filter", "q_nfkc", "q_clf_auc", "q_mix",
    "q_table_profile", "q_urlnorm", "q_snapshot_urlnorm",
    // round-11 late-wave shapes: MG summaries vary per partitioning but
    // the OUTPUT must not; greedy MMR walks (both modalities) over
    // pooled candidates; the two-window CUSUM; indexed minhash probe;
    // KN micro-nat folds; codec fanout behind Spread; the cascade
    "q_heavy_hitters", "q_mmr", "q_bm25_mmr", "q_cusum", "q_cusum_fixed",
    "q_kn_ppl", "q_kn_filter", "q_randproj_rerank", "q_dedup_minhash_idx",
    "q_audio_flac", "q_corpus_diff", "q_hard_negatives",
    "q_avro_roundtrip")

  test("risky queries are partition-count invariant (4 vs 13 partitions)") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def runAll(): Map[String, Seq[String]] =
      risky.map { name =>
        name -> SparkEntry.queries(name)(spark, sf())
          .collect().toSeq.map(_.toString)
      }.toMap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val at4 = runAll()
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val at13 = runAll()
      risky.foreach { name =>
        assert(at4(name) == at13(name),
          s"$name output changed with shuffle partition count")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
