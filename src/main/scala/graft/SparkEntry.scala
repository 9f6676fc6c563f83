package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Tables
import graft.ops._

/** Driver contract — see SURVEY.md §7 and FIXTURES.md §B for the mapping of
  * the reference's operators onto the driver-provided parquet tables.
  *
  * Round 17: the 5,500-line registration monolith is split into per-family
  * files under graft.entry (the round-15 compile break lived in this file;
  * family files bound the blast radius of any future edit). This object is
  * now ONLY the composition — every row lives in exactly one entry file,
  * EntrySplitSpec asserts the composed key sets are disjoint-by-construction
  * and match the driver-observed pre-split sets.
  *
  * Every query is deterministic (explicit ORDER BY with full tiebreaks)
  * and every money aggregate goes through DECIMAL so the DuckDB oracle hash
  * matches bit-for-bit.
  */
object SparkEntry {
  import graft.entry._

  /** Flagship: EP2 recommend_people (SURVEY.md §3) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Recommend.recommend(Tables.students(spark, "/root/testdata/sf0.001"), 1L)

  /** All entry-file registration objects, in composition order. */
  private[graft] def parts: Seq[(String, Map[String, (SparkSession, String) => DataFrame], Map[String, String])] = Seq(
    ("StudentEntry", StudentEntry.queries, StudentEntry.oracleSql),
    ("FuzzyEntry", FuzzyEntry.queries, FuzzyEntry.oracleSql),
    ("TpchEntry", TpchEntry.queries, TpchEntry.oracleSql),
    ("DedupEntry", DedupEntry.queries, DedupEntry.oracleSql),
    ("ViewsEntry", ViewsEntry.queries, ViewsEntry.oracleSql),
    ("TextEntry", TextEntry.queries, TextEntry.oracleSql),
    ("AnnEntry", AnnEntry.queries, AnnEntry.oracleSql),
    ("WindowsGraphEntry", WindowsGraphEntry.queries, WindowsGraphEntry.oracleSql),
    ("PipelineEntry", PipelineEntry.queries, PipelineEntry.oracleSql),
    ("RetrievalEntry", RetrievalEntry.queries, RetrievalEntry.oracleSql),
    ("QualityLayoutEntry", QualityLayoutEntry.queries, QualityLayoutEntry.oracleSql)
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    parts.iterator.map(_._2).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    parts.iterator.map(_._3).reduce(_ ++ _)

  /** Headline subset timed by Bench (bench runs at sf0.1). */
  def benchQueries: Seq[String] = Seq(
    "q1_agg", "q3_top_revenue", "q5_region_revenue", "q7_volume", "q9_profit",
    "q10_returned_items", "set_ops",
    "edges_backfill", "edges_backfill_partial",
    "edges_skew_salted", "edges_skew_unsalted",
    "edges_skew_aqe",
    "j2_rare_token_pairs", "j3_recommend", "j8_asof_join",
    // both fuzzy scorers: the built-in levenshtein and the custom codegen
    // IndelRatio expression, so the custom path's cost is a recorded number
    "fuzzy_search_lev", "fuzzy_search_indel",
    "dedup_lsh_pairs", "dedup_ngram_jaccard", "dedup_jaccard_sliver",
    "dedup_simhash", "dedup_simhash_pairs",
    "text_quality", "sim_topk_bruteforce", "sim_ann_multiprobe", "mm_features",
    "w1_event_windows", "w2_sessionize", "graph_cc", "graph_shortest_path",
    // round-4 additions: the fact⋈fact-heavy q-series shapes
    "q12_priority_class", "q13_order_distribution", "q16_supplier_cnt",
    "q21_sole_returner", "q20_recent_concentration",
    // round-5 corpus-hygiene additions: the two with real shuffle work
    // (decontam's shingle join, repetition's cascaded gram aggregates)
    "decontam_overlap", "text_repetition",
    // near-dup clustering: LSH + verify + GraphX connected components —
    // the full dedup pipeline's cost in one number
    "dedup_components",
    // late round-5 additions with real shuffle/scan work: prefix-sum
    // packing, scan-time BM25, the three-window SCD2 chain, and the
    // full-outer snapshot diff
    "pack_sequences", "bm25_search", "scd2_priority", "snapshot_diff",
    // full-vocab keyword extraction: the explode-heavy text shape
    "text_keywords",
    // exact similarity join: prefix-filter candidates + sliver verify
    "dedup_prefix_pairs",
    // the capstone: gate -> dedup -> split -> pack in ONE DAG — the most
    // production-shaped query in the suite (round-6 verdict stretch item)
    "corpus_build",
    // round-7 additions: sketch-pruned decontam (times the sketch build
    // AND the pruned verify — the recorded price of the bloom path at
    // this fixture's ~39% hit rate) and the hybrid RRF fusion
    "decontam_bloom", "search_hybrid_rrf",
    // ---- round-8 widening: a gate that skips the expensive half of the
    // suite can hide a regression forever — every batch, non-trivial
    // oracle query is timed from here on (point lookups, 1-row ingest
    // rows, and streaming queries stay out: sub-ms or non-batch)
    // the remaining q-series
    "q2_top_acctbal", "q4_priority_exists", "q6_forecast_revenue",
    "q8_market_share", "q11_important_parts", "q14_promo_effect",
    "q15_top_supplier", "q17_small_qty_revenue", "q18_large_orders",
    "q19_disjunctive", "q22_idle_customers",
    // aggregates/sketches/histograms (a12's distributed equi-depth was
    // round 7's headline plan fix and had never been timed)
    "a5_stats", "a6_rollup", "a7_distinct_agg", "a8_cube", "a9_percentiles",
    "a10_kmv_distinct", "a11_histogram", "a12_equidepth",
    // graph family beyond CC
    "graph_degrees", "graph_khop", "graph_khop_paths", "graph_pagerank",
    "graph_triangles",
    // SCD2 consumption + snapshot apply (the diff was already timed)
    "scd2_asof_lookup", "snapshot_apply",
    // round-16: incremental SCD2 maintenance (affected-keys-only apply)
    // + its streaming twin (ledger-idempotent observation feed)
    "scd2_apply", "stream_scd2_apply",
    // similarity/ANN ladder beyond brute-force + multiprobe
    "sim_ann_lsh", "sim_ann_ivf", "sim_ann_ivf_trained",
    "sim_ann_ivf_trained_recall", "sim_ann_ivf_indexed",
    "sim_ann_ivf_index_delta", "sim_ann_ivf_index_compact",
    "sim_ann_ivf_drift", "sim_ann_ivfpq_indexed", "sim_ann_ivfpq_index_delta",
    "sim_ann_ivfpq_residual", "sim_ann_ivfsq_indexed", "sim_ann_ivf_retrain",
    // round-13 query-only twins: the session-prebuilt index makes these
    // time the QUERY path alone (WarmIndex builds once; best-of-2 takes
    // the warm iteration) — the regime the *_indexed rows can't isolate
    "sim_ann_ivf_query", "sim_ann_ivfpq_query", "sim_ann_ivfsq_query",
    "sim_ann_ivfpqr_query", "bm25_query",
    // probe-bounded range search + the 1-row index maintenance stats
    "sim_ann_range_search", "sim_ann_index_stats",
    // q-gram-indexed fuzzy search (build + probe + rescore) + its
    // delta-maintained and compacted twins + the batch probe
    "fuzzy_search_indexed", "fuzzy_index_delta", "fuzzy_index_compact",
    "fuzzy_search_batch",
    // round-14: query-only fuzzy twin, batch BM25 off the warm index,
    // the per-gram/per-term posting-skew stats rows, and U2's
    // index-served token correction
    "fuzzy_search_query", "fuzzy_batch_query", "bm25_search_batch",
    "fuzzy_index_stats", "bm25_index_stats", "u2_token_correct_indexed",
    // the prefix-filtered (hot-gram-skipping) probe + query-only twin
    "fuzzy_search_skip", "fuzzy_skip_query",
    "sim_ann_recall", "sim_centroids",
    "sim_kmeans_assign", "sim_near_dup", "sim_pq_codes", "sim_pq_recall",
    "sim_ivfpq_recall",
    // sampling suite
    "sample_split", "sample_split_safe", "sample_stratified",
    "sample_weighted", "sample_mix", "sample_mix_temperature",
    "sample_epochs",
    // text family beyond quality/repetition/keywords
    "text_clean", "text_tokens", "text_langid", "text_langid_mixed",
    "text_fingerprint",
    "text_chunks", "text_chunks_overlap", "text_pii", "text_lm_score",
    "text_ngram_topk", "text_quality_gate", "text_quality_rank",
    // dedup family beyond the pair generators
    "dedup_exact", "dedup_canonical", "dedup_minhash_sig", "dedup_keepset",
    "dedup_incremental", "dedup_semantic",
    // joins/windows/layout/multimodal — j2_shares_interest is EXCLUDED by
    // design: its output is Θ(n²) (53M pairs at sf0.1) and SURVEY §2.3 says
    // "keep as correctness oracle only"; the scale path is the df-capped
    // j2_rare_token_pairs twin, which IS benched
    "fuzzy_join_sym", "j4_pair_relationship",
    "j9_range_join", "o3_topk_acctbal", "u2_token_correct",
    "w3_pivot", "w4_order_ranks", "w5_sliding_counts", "w6_gapfill",
    "w7_unpivot", "w8_funnel", "w9_retention",
    "layout_zvalue", "mm_frames", "mm_audio_frames", "pack_stats",
    // round-8 retrieval additions
    "bm25_indexed", "bm25_index_delta", "bm25_index_compact",
    "search_hybrid_dense", "search_hybrid_dense_ann",
    // the pre-training composition dashboard + tokenizer induction
    "corpus_report", "bpe_merges", "bpe_encode",
    // substring-level dedup: the passage table + per-doc span accounting
    "dedup_substring", "dedup_doc_spans",
    // CMS heavy-hitter audit + the token-budgeted mixture
    "sketch_cms_topterms", "sample_token_budget",
    // directory partition pruning (times the partitioned WRITE + the
    // pruned read, like bm25_indexed times build + query)
    "layout_datepart",
    // contrastive hard-negative mining + runtime (join-driven) pruning
    "sim_hard_negatives", "layout_dpp",
    // sketch-level dedup health (sizes the pair job before running it)
    // + the threshold sensitivity audit (prices the knob)
    "dedup_band_stats", "dedup_threshold_sweep",
    // the full-recipe capstone (keepSet + span gate + token budget + pack)
    "corpus_curate",
    // asymmetric containment + its sketch estimate
    "dedup_containment",
    // engine-portable 3-sigma outlier counts + the real pixel resize
    "a13_outliers", "mm_resize",
    // link prediction over the backfilled graph
    "graph_node_similarity",
    // round-15: tombstone deletion — build + delete + probe for both
    // families (the one lifecycle edge that was missing; prices the
    // sidecar append and the broadcast anti-join the probes now carry)
    "bm25_index_delete", "sim_ann_ivf_index_delete",
    // round-16: the fuzzy family's delete row completes the lifecycle
    "fuzzy_index_delete",
    // round-16: tombstone dead-fraction -> compaction decision
    "bm25_compaction_advice",
    // round-15: attribute-filtered ANN (predicate pushed into the
    // DPP-pruned candidate scan) + the measured pre-vs-post adjudication
    "sim_ann_filtered", "sim_ann_filtered_recall",
    // round-16: the filtered probe on the compressed rungs (predicate
    // BEFORE the lossy ADC shortlist cut) + the fused pre-vs-post
    // adjudication
    "sim_ann_filtered_fused", "sim_ann_filtered_sq",
    "sim_ann_filtered_residual", "sim_ann_filtered_fused_recall",
    "sim_ann_filtered_selectivity", "sim_ann_filtered_query",
    "sim_ann_label_matched",
    // round-16: streaming takedown feed with overlapping redelivery +
    // the full-CRUD lifecycle capstone
    "stream_index_delete", "bm25_index_lifecycle",
    "fuzzy_index_lifecycle", "sim_ann_ivf_lifecycle",
    // round-16: erasure reaches derived dedup state (6th family)
    "dedup_index_delete", "dedup_index_lifecycle", "stream_dedup_ingest",
    // round-16: incrementally-maintained materialized aggregate (IVM) +
    // the co-located fact-fact bucketed join
    "mv_orders_build", "mv_orders_lifecycle", "stream_mv_ingest",
    "mv_orders_cdc", "stream_mv_cdc", "layout_bucketed_join",
    // round-16: metadata-only retention + idempotent daily backfill
    "layout_retention", "layout_backfill_day",
    // round-16: the data-quality gate + metadata-only gap detection,
    // per-group triage, and metadata-only freshness
    "quality_report", "quality_partitions",
    "quality_by_group", "quality_freshness", "quality_volume_trend",
    "stream_volume_trend",
    // round-16: min/max IVM — insert-associative deltas + delete-time
    // affected-group recompute (the non-additive honest cost model)
    "mv_minmax_lifecycle",
    // round-16: the join-view (broadcast fact⋈dim delta maintenance)
    // and exact-count-distinct (refcounted support) IVM members, their
    // streaming twins, and CDC through the join view
    "mv_join_lifecycle", "mv_distinct_lifecycle",
    "mv_join_cdc", "stream_mv_distinct", "stream_mv_minmax",
    // round-16: top-k IVM (order statistics beyond extremes)
    "mv_topk_lifecycle",
    // round-16: dataset-version diff audit
    "corpus_diff",
    // round-16: positional lexical retrieval — scan-time phrase +
    // proximity, the positional-index build+probe row, and its warm
    // query-only twin (prices the pruned probe + intersection alone)
    "bm25_phrase", "bm25_proximity", "bm25_phrase_indexed",
    "bm25_phrase_query", "bm25_phrase_delete", "bm25_phrase_lifecycle",
    // round-16: exact quantiles by histogram bisection (log_B(domain)
    // count passes — the scale path the buffered percentile agg lacks)
    "a14_exact_quantile", "a15_quantile_grouped",
    // round-16: exact heavy hitters via two-pass Misra-Gries
    "sketch_mg_heavy",
    // round-16: streaming positional ingest (7th-family symmetry)
    "stream_phrase_ingest", "phrase_index_stats", "bm25_phrase_batch",
    // round-15: batch hybrid off the two warm standing indexes (shared
    // postings pass + DPP-pruned ANN probes + per-qid RRF fuse)
    "search_hybrid_batch",
    // round-18: personalized PageRank (k scaled-integer power-iteration
    // rounds), the convergence-detected SSSP fixpoint (priced isEmpty
    // halt), and the one-scan recipe-composer capstone
    "graph_ppr", "graph_shortest_path_converged", "sample_recipe",
    // the walk family's warm twin + the EP2 top-k recommend output +
    // the standing adjacency's affected-keys-only delta maintenance
    "graph_ppr_query", "graph_ppr_recommend", "graph_adj_delta",
    "graph_adj_delete", "graph_ppr_batch",
    // round-18b: SAGE-style feature folds off the standing adjacency +
    // the partitioned adjacency's streaming maintenance twin + MMR
    // diversified top-k over the candidate-capped shortlist
    "graph_feature_agg", "stream_adj_ingest", "sim_mmr_rerank",
    // curriculum staging off exact bisected quartiles + k-round LPA
    "sample_curriculum", "graph_label_prop",
    // cross-source vocabulary overlap from one bounded-heap KMV pass +
    // CMS-F2 self-join-size estimation
    "sketch_kmv_intersect", "sketch_f2_selfjoin",
    // content-defined chunking (edit-stable chunk hashes) + histogram
    // distribution-drift monitor
    "text_chunks_cdc", "quality_dist_drift",
    // the drift monitor's streaming twin (bin-keyed MatView fold) +
    // MMR off the standing IVF index
    "stream_dist_drift", "sim_mmr_query",
    // rule-count-weighted PPR (the reference's EP2 scoring as mass) +
    // curriculum-staged packing
    "graph_ppr_weighted", "pack_curriculum",
    // chunk-level dedup off the CDC hashes (one groupBy, no pair join) +
    // two-relation CMS join-cardinality estimate
    "dedup_cdc_chunks", "sketch_join_card",
    // round-18c: span-level (surgical) decontamination, DSIR importance
    // scoring, hub-discounted link prediction, the per-source tokenizer
    // fertility audit, and the streaming decontam twin
    "decontam_spans", "sample_dsir", "graph_adamic_adar", "text_fertility",
    "stream_decontam",
    // round-18c wave 2: PMI collocations, fixed-vocab OOV audit, local
    // clustering coefficient, and the release-recipe capstone (curate +
    // decontam + eval-suite exclusion before the budget)
    "text_pmi_pairs", "text_oov_rate", "graph_clustering_coeff",
    "corpus_release",
    // round-18c wave 3: bounded k-core peeling + the embedding-quality
    // (own-centroid distance outlier) audit
    "graph_kcore", "sim_embedding_outliers",
    // round-18c wave 4: frozen-tokenizer encode (train 80%, apply to the
    // unseen 20%) + per-source lexical diversity (TTR / hapax)
    "bpe_encode_frozen", "text_lexical_diversity",
    // round-18c wave 5: HyperLogLog (mergeable-register distinct sketch,
    // estimate itself oracle-exact) on a10's fixture + its streaming
    // twin (per-batch partial registers, ledger-free max-merge)
    "sketch_hll_distinct", "stream_hll_ingest",
    // round-18c wave 7: perceptual image hash (real decode) + banded
    // hamming near-dup pairs
    "mm_phash", "mm_phash_pairs",
    // round-19: the warm-served EP2 recommend twin (walk + probe, no
    // build), the convergence-detected walk fixpoint, LPA + k-core on
    // the REAL capped student graph, and the phash streaming ingest twin
    "graph_ppr_recommend_query", "graph_ppr_converged",
    "graph_label_prop_students", "graph_kcore_students",
    "stream_phash_ingest",
    // round-20: the graph_ppr_query separation applied to the wedge
    // audits (warm-served AA/CC twins — wedge work alone) + the batch
    // fixpoint-walk frontend (N anchors, one round sequence)
    "graph_adamic_adar_query", "graph_clustering_query",
    "graph_ppr_converged_batch",
    // round-20: the multimodal hash table's takedown lifecycle (the one
    // standing layout that had ingest but no delete/compact path)
    "mm_phash_delete", "mm_phash_lifecycle",
    // round-20: batched top-m BPE rounds (driver jobs grow as merges/m)
    "bpe_merges_batched",
    // round-20: incremental near-dup component maintenance (contracted
    // delta graph + affected-components-only relabel)
    "dedup_components_delta")

  // ---------------------------------------------------------------- oracle
}
