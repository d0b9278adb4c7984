"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (reference benchmark shape: define →
filter → fused count/mean + auto-range histogram) on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query for the correctness gate.

Cross-engine determinism conventions (see tdataframe_spark/functions/numeric.py):
- every externally-compared double aggregate sums in DECIMAL(25,6) then
  converts once to double (order-independent, bit-stable);
- vector math uses ordered left-folds (Spark ``aggregate`` HOF ==
  DuckDB ``list_reduce``);
- hashes are md5-derived (``portable_hash64``) — identical in both engines;
- all timestamps are parquet NTZ (wall-clock, TZ-free in both engines).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tdataframe_spark import Frame  # noqa: E402
# every q_*/SQL_* plus the shared helpers come from the queries module —
# ONE contract surface, no duplicate import list to keep in sync
from tdataframe_spark.queries import *  # noqa: E402,F401,F403
from tdataframe_spark.queries import (  # noqa: E402,F401
    _corpus_curation_oracle_sql,
    _bm25_oracle_sql,
    _hybrid_oracle_sql,
    _doc_profile_oracle_sql,
    _domain_mix_oracle_sql,
    _histo_edges_oracle_sql,
    _minhash_oracle_sql,
    _pagerank_oracle_sql,
    _pii_oracle_sql,
    _profile_oracle_sql,
    _simhash_hamming_oracle_sql,
    _simhash_oracle_sql,
    _t,
    _events,
)

# ---------------------------------------------------------------------------
# flagship


def entry(spark: SparkSession) -> DataFrame:
    """Reference-benchmark-shaped flagship on sf0.001: define disc_price →
    filter → fused Count+Mean (one agg pass) + auto-range histogram
    (cf. /root/reference/benchmarks/benchmark.cxx:95-123)."""
    sf_dir = "/root/testdata/sf0.001"
    fr = (
        Frame(_t(spark, sf_dir, "lineitem"))
        .define("disc_price", F.expr("l_extendedprice * (1 - l_discount)"))
        .filter(F.col("l_quantity") > FLAG_QTY)
    )
    cnt, avg = fr.count(), fr.mean("disc_price")
    assert cnt.get() > 0 and avg.get() is not None  # fused single-pass agg
    return fr.histo_frame("disc_price", nbins=HA_NBINS)




# ---------------------------------------------------------------------------
# driver contract


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order is load-bearing: the driver oracle-checks only the
    FIRST 50 entries each round. Positions 1-50 hold the must-verify set
    (SURVEY §2.1 seven, events/time ops, the dedup/similarity oracle
    family, TPC-H shapes, and anything changed this round); entries past
    50 are deliberately rotated out — each is r1/r2 driver-green AND
    re-verified every round by the local full-registry gate
    (tests/test_oracle_parity.py + /tmp driver sim at sf0.01). The
    rotation is documented per-round in STATUS.md.
    """
    return {
        # --- driver window (first 50): must-verify this round (r11) ---
        # 1-7: the six r8-last entries deferred from the r10 window
        # (VERDICT r10 item 2: rotate these first)
        "video_frames": q_video_frames,
        "image_dedup": q_image_dedup,
        "shot_detect": q_shot_detect,
        "topk_orders": q_topk_orders,
        "merge_upsert": q_merge_upsert,
        "audio_features": q_audio_features,
        "bpe_tokens": q_bpe_tokens,
        # NEW this round: Reduce/Accumulate (the last reference-planned
        # feature) and the txn SQL front door (txn_view)
        "reduce_fold": q_reduce_fold,
        "txn_sql_view": q_txn_sql_view,
        "cdf_feed": q_cdf_feed,
        # txn family re-verified after this round's incremental commit
        # log, cost-based MERGE probe bail, and layout-order fixes
        "merge_upsert_txn": q_merge_upsert_txn,
        "merge_clustered_txn": q_merge_clustered_txn,
        "merge_bloom_txn": q_merge_bloom_txn,
        "bloom_point_lookup": q_bloom_point_lookup,
        "merge_delete_txn": q_merge_delete_txn,
        "time_travel": q_time_travel,
        "restore_table": q_restore_table,
        "data_skipping": q_data_skipping,
        "cdc_changes": q_cdc_changes,
        "partition_evolution": q_partition_evolution,
        "txn_stream_feed": q_txn_stream_feed,
        "txn_native_sink": q_txn_native_sink,
        "txn_sink_partitioned": q_txn_sink_partitioned,
        "shallow_clone": q_shallow_clone,
        # NEW this round (late): file-inventory metadata table +
        # idempotent writes
        "txn_files_meta": q_txn_files_meta,
        "idempotent_writes": q_idempotent_writes,
        # the r7-last oracle cohort (normal rotation cadence; the
        # remaining r7-last rows-only entries + simhash_hamming rotate
        # r12 with the r6 cohort)
        "above_customer_avg": q_above_customer_avg,
        "array_agg_sorted": q_array_agg_sorted,
        "dedup_components": q_dedup_components,
        "dedup_keep_best": q_dedup_keep_best,
        "grouped_udaf": q_grouped_udaf,
        "hash_features": q_hash_features,
        "histo_auto": q_histo_auto,
        "histo_fixed": q_histo_fixed,
        "histo_flow": q_histo_flow,
        "join_outer": q_join_outer,
        "line_dedup": q_line_dedup,
        "min_per_group": q_min_per_group,
        "minhash_lsh": q_minhash_lsh,
        "ntile_ranks": q_ntile_ranks,
        "pivot_status": q_pivot_status,
        "posexplode_tokens": q_posexplode_tokens,
        "q10_returned_items": q_q10_returned_items,
        "q13_order_distribution": q_q13_order_distribution,
        "q15_top_supplier": q_q15_top_supplier,
        "q22_idle_customers": q_q22_idle_customers,
        "q6_revenue_delta": q_q6_revenue_delta,
        "q8_market_share": q_q8_market_share,
        "q9_profit": q_q9_profit,
        "quantiles": q_quantiles,
        "range_join": q_range_join,
        "regex_extract": q_regex_extract,
        "semantic_dedup": q_semantic_dedup,
        "sql_grouping_sets": q_sql_grouping_sets,
        # --- position 51+ (window_top_orders ceded its r11 slot to the
        # new cdf_feed; it rotates r12 with the r6 cohort): rotated out —
        # every entry below has an external driver-green row from r8-r10
        # and is re-verified every round by the local full-registry gate ---
        "window_top_orders": q_window_top_orders,
        "dds_quantiles": q_dds_quantiles,
        "txn_constraints": q_txn_constraints,
        "trim_dedup_index": q_trim_dedup_index,
        "image_dedup_mirror": q_image_dedup_mirror,
        "image_dedup_letterbox": q_image_dedup_letterbox,
        "txn_generated_cols": q_txn_generated_cols,
        "activity_streaks": q_activity_streaks,
        "ccnet_buckets": q_ccnet_buckets,
        "chunk_docs": q_chunk_docs,
        "cohort_retention": q_cohort_retention,
        "collocations": q_collocations,
        "decayed_engagement": q_decayed_engagement,
        "decontamination_bloom": q_decontamination_bloom,
        "dq_report": q_dq_report,
        "dup_spans": q_dup_spans,
        "event_transitions": q_event_transitions,
        "exists_subquery": q_exists_subquery,
        "funnel_steps": q_funnel_steps,
        "fuzzy_join": q_fuzzy_join,
        "group_split": q_group_split,
        "histo_equidepth": q_histo_equidepth,
        "hopping_window": q_hopping_window,
        "image_dedup_index": q_image_dedup_index,
        "join_anti": q_join_anti,
        "join_semi": q_join_semi,
        "lag_lead_gaps": q_lag_lead_gaps,
        "lm_score": q_lm_score,
        "nearest_centroid": q_nearest_centroid,
        "outliers": q_outliers,
        "phrase_search": q_phrase_search,
        "resample_daily": q_resample_daily,
        "retrieval_metrics": q_retrieval_metrics,
        "rolling_window": q_rolling_window,
        "rollup_incremental": q_rollup_incremental,
        "running_window": q_running_window,
        "setops_multiset": q_setops_multiset,
        "setops_nations": q_setops_nations,
        "snapshot_diff": q_snapshot_diff,
        "tfidf_pairs": q_tfidf_pairs,
        "weighted_sample": q_weighted_sample,
        "ab_test": q_ab_test,
        "audio_dedup": q_audio_dedup,
        "audio_dedup_index": q_audio_dedup_index,
        "audio_trim_dedup": q_audio_trim_dedup,
        "bm25_indexed": q_bm25_indexed,
        "bm25_topk": q_bm25_topk,
        "bootstrap_ci": q_bootstrap_ci,
        "confusion_stats": q_confusion_stats,
        "corpus_curation": q_corpus_curation,
        "corr_matrix": q_corr_matrix,
        "delete_vectors": q_delete_vectors,
        "domain_mix": q_domain_mix,
        "dsir_sample": q_dsir_sample,
        "dsir_weights": q_dsir_weights,
        "dv_purge": q_dv_purge,
        "gap_fill_interp": q_gap_fill_interp,
        "group_quantiles_approx": q_group_quantiles_approx,
        "heavy_hitters": q_heavy_hitters,
        "histo2d": q_histo2d,
        "hll_distinct": q_hll_distinct,
        "hybrid_search": q_hybrid_search,
        "interval_join": q_interval_join,
        "logreg_score": q_logreg_score,
        "ngram_jaccard_ppjoin": q_ngram_jaccard_ppjoin,
        "outliers_robust": q_outliers_robust,
        "pack_bins": q_pack_bins,
        "pca_embeddings": q_pca_embeddings,
        "pii_redact": q_pii_redact,
        "q11_important_parts": q_q11_important_parts,
        "q12_shipmode_priority": q_q12_shipmode_priority,
        "q20_part_promotion": q_q20_part_promotion,
        "q21_suppliers_waiting": q_q21_suppliers_waiting,
        "q2_min_cost_supplier": q_q2_min_cost_supplier,
        "quantize_embeddings": q_quantize_embeddings,
        "rename_column": q_rename_column,
        "repetition_signals": q_repetition_signals,
        "shard_shuffle": q_shard_shuffle,
        "source_divergence": q_source_divergence,
        "stratified_sample": q_stratified_sample,
        "target_encode": q_target_encode,
        "token_entropy": q_token_entropy,
        "top_ngrams": q_top_ngrams,
        "triangle_count": q_triangle_count,
        "variant_props": q_variant_props,
        "video_dedup": q_video_dedup,
        "video_trim_dedup": q_video_trim_dedup,
        "window_stats": q_window_stats,
        "winsorize": q_winsorize,
        "filtered_ann": q_filtered_ann,
        "gif_frames": q_gif_frames,
        "histo_equidepth_approx": q_histo_equidepth_approx,
        "ivf_ann": q_ivf_ann,
        "ivf_append": q_ivf_append,
        "ivfpq_ann": q_ivfpq_ann,
        "lang_id": q_lang_id,
        "lsh_ann": q_lsh_ann,
        "pq_ann": q_pq_ann,
        "pq_query": q_pq_query,
        "semdedup": q_semdedup,
        "semdedup_assign": q_semdedup_assign,
        "simhash_hamming": q_simhash_hamming,
        "asof_click_purchase": q_asof_click_purchase,
        "case_when_agg": q_case_when_agg,
        "cosine_pairs": q_cosine_pairs,
        "cosine_topk": q_cosine_topk,
        "count_chain": q_count_chain,
        "date_funcs": q_date_funcs,
        "decontamination": q_decontamination,
        "dedup_exact": q_dedup_exact,
        "define_filter_agg": q_define_filter_agg,
        "distinct_supp_per_flag": q_distinct_supp_per_flag,
        "doc_profile": q_doc_profile,
        "encode_categorical": q_encode_categorical,
        "explode_agg": q_explode_agg,
        "global_rank": q_global_rank,
        "histo_edges": q_histo_edges,
        "json_events": q_json_events,
        "map_props": q_map_props,
        "multimodal_features": q_multimodal_features,
        "ngram_jaccard": q_ngram_jaccard,
        "pack_sequences": q_pack_sequences,
        "pagerank": q_pagerank,
        "profile_numeric": q_profile_numeric,
        "q14_promo_revenue": q_q14_promo_revenue,
        "q16_supplier_counts": q_q16_supplier_counts,
        "q17_small_qty": q_q17_small_qty,
        "q18_large_orders": q_q18_large_orders,
        "q19_disjunctive": q_q19_disjunctive,
        "q1_pricing_summary": q_q1_pricing_summary,
        "q3_topk_revenue": q_q3_topk_revenue,
        "q4_priority_exists": q_q4_priority_exists,
        "q5_region_revenue": q_q5_region_revenue,
        "q7_volume_shipping": q_q7_volume_shipping,
        "roc_auc": q_roc_auc,
        "rollup_returnflag": q_rollup_returnflag,
        "sessionize": q_sessionize,
        "simhash": q_simhash,
        "string_funcs": q_string_funcs,
        "take_col": q_take_col,
        "text_stats": q_text_stats,
        "time_bucket_agg": q_time_bucket_agg,
        "winsorize_approx": q_winsorize_approx,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "reduce_fold": SQL_REDUCE_FOLD,
        "txn_sql_view": SQL_TXN_SQL_VIEW,
        "cdf_feed": SQL_CDF_FEED,
        "histo_flow": SQL_HISTO_FLOW,
        "line_dedup": SQL_LINE_DEDUP,
        "count_chain": SQL_COUNT_CHAIN,
        "define_filter_agg": SQL_DEFINE_FILTER_AGG,
        "explode_agg": SQL_EXPLODE_AGG,
        "histo_fixed": SQL_HISTO_FIXED,
        "histo_auto": SQL_HISTO_AUTO,
        "histo_edges": _histo_edges_oracle_sql(),
        "take_col": SQL_TAKE_COL,
        "q1_pricing_summary": SQL_Q1,
        "q3_topk_revenue": SQL_Q3,
        "q5_region_revenue": SQL_Q5,
        "window_top_orders": SQL_WINDOW_TOP,
        "join_semi": SQL_JOIN_SEMI,
        "join_anti": SQL_JOIN_ANTI,
        "setops_nations": SQL_SETOPS,
        "setops_multiset": SQL_SETOPS_MULTISET,
        "map_props": SQL_MAP_PROPS,
        "running_window": SQL_RUNNING_WINDOW,
        "exists_subquery": SQL_EXISTS,
        "corpus_curation": _corpus_curation_oracle_sql(),
        "pack_sequences": SQL_PACK_SEQUENCES,
        "stratified_sample": SQL_STRATIFIED_SAMPLE,
        "merge_upsert": SQL_MERGE_UPSERT,
        # identical MERGE semantics through the transactional table: same oracle
        "merge_upsert_txn": SQL_MERGE_UPSERT,
        "hash_features": SQL_HASH_FEATURES,
        # delete arm: same relational statement, minus the erased keys
        "merge_delete_txn": SQL_MERGE_DELETE,
        "delete_vectors": SQL_DELETE_VECTORS,
        "dv_purge": SQL_DV_PURGE,
        "rename_column": SQL_RENAME_COLUMN,
        "shallow_clone": SQL_SHALLOW_CLONE,
        "dds_quantiles": _dds_oracle(),
        "txn_constraints": SQL_TXN_CONSTRAINTS,
        "txn_stream_feed": SQL_TXN_STREAM_FEED,
        "txn_native_sink": SQL_TXN_NATIVE_SINK,
        "txn_sink_partitioned": SQL_TXN_SINK_PARTITIONED,
        "txn_generated_cols": SQL_TXN_GENERATED_COLS,
        "merge_clustered_txn": SQL_MERGE_CLUSTERED,
        "merge_bloom_txn": SQL_MERGE_BLOOM,
        "bloom_point_lookup": SQL_BLOOM_LOOKUP,
        "partition_evolution": SQL_PARTITION_EVOLUTION,
        # RESTORE: the head after rollback IS the original table
        "restore_table": SQL_RESTORE_TABLE,
        "data_skipping": SQL_DATA_SKIPPING,
        "txn_files_meta": SQL_TXN_FILES_META,
        "idempotent_writes": SQL_IDEMPOTENT_WRITES,
        "cdc_changes": SQL_CDC_CHANGES,
        "time_travel": SQL_TIME_TRAVEL,
        "q7_volume_shipping": SQL_Q7,
        "q18_large_orders": SQL_Q18,
        "q19_disjunctive": SQL_Q19,
        "top_ngrams": SQL_TOP_NGRAMS,
        "semantic_dedup": SQL_SEMANTIC_DEDUP,
        "repetition_signals": SQL_REPETITION,
        "decontamination": SQL_DECONTAMINATION,
        "pii_redact": _pii_oracle_sql(),
        "domain_mix": _domain_mix_oracle_sql(),
        "bm25_topk": _bm25_oracle_sql(),
        "pagerank": _pagerank_oracle_sql(),
        "profile_numeric": _profile_oracle_sql(),
        "q4_priority_exists": SQL_Q4,
        "q14_promo_revenue": SQL_Q14,
        "q16_supplier_counts": SQL_Q16,
        "lag_lead_gaps": SQL_LAG_LEAD,
        "q17_small_qty": SQL_Q17,
        "q22_idle_customers": SQL_Q22,
        "rollup_returnflag": SQL_ROLLUP,
        "distinct_supp_per_flag": SQL_DISTINCT_SUPP,
        "topk_orders": SQL_TOPK_ORDERS,
        "asof_click_purchase": SQL_ASOF,
        "sessionize": SQL_SESSIONIZE,
        "json_events": SQL_JSON_EVENTS,
        "q6_revenue_delta": SQL_Q6,
        "string_funcs": SQL_STRING_FUNCS,
        "date_funcs": SQL_DATE_FUNCS,
        "case_when_agg": SQL_CASE_WHEN,
        "above_customer_avg": SQL_ABOVE_AVG,
        "grouped_udaf": SQL_GROUPED_UDAF,
        "time_bucket_agg": SQL_TIME_BUCKET,
        "min_per_group": SQL_MIN_PER_GROUP,
        "quantiles": SQL_QUANTILES,
        "join_outer": SQL_JOIN_OUTER,
        "regex_extract": SQL_REGEX_EXTRACT,
        "range_join": SQL_RANGE_JOIN,
        "ntile_ranks": SQL_NTILE,
        "sql_grouping_sets": SQL_GROUPING_SETS,
        "pivot_status": SQL_PIVOT,
        "array_agg_sorted": SQL_ARRAY_AGG,
        "posexplode_tokens": SQL_POSEXPLODE,
        "dedup_components": SQL_DEDUP_COMPONENTS,
        "dedup_exact": SQL_DEDUP_EXACT,
        "doc_profile": _doc_profile_oracle_sql(),
        "simhash_hamming": _simhash_hamming_oracle_sql(),
        "cosine_pairs": SQL_COSINE_PAIRS,
        "text_stats": SQL_TEXT_STATS,
        "ngram_jaccard": SQL_NGRAM_JACCARD,
        "minhash_lsh": _minhash_oracle_sql(),
        "simhash": _simhash_oracle_sql(),
        "cosine_topk": SQL_COSINE_TOPK,
        "q8_market_share": SQL_Q8,
        "q9_profit": SQL_Q9,
        "q10_returned_items": SQL_Q10,
        "q13_order_distribution": SQL_Q13,
        "q15_top_supplier": SQL_Q15,
        "chunk_docs": SQL_CHUNK_DOCS,
        "funnel_steps": SQL_FUNNEL,
        "cohort_retention": SQL_COHORT,
        "decayed_engagement": SQL_DECAYED,
        "decontamination_bloom": SQL_DECONTAMINATION_BLOOM,
        "rolling_window": SQL_ROLLING_WINDOW,
        "outliers": SQL_OUTLIERS,
        "nearest_centroid": SQL_NEAREST_CENTROID,
        "rollup_incremental": SQL_ROLLUP_INCREMENTAL,
        "dq_report": SQL_DQ_REPORT,
        "snapshot_diff": SQL_SNAPSHOT_DIFF,
        "histo_equidepth": SQL_HISTO_EQUIDEPTH,
        "fuzzy_join": SQL_FUZZY_JOIN,
        "hopping_window": SQL_HOPPING_WINDOW,
        "activity_streaks": SQL_ACTIVITY_STREAKS,
        "event_transitions": SQL_EVENT_TRANSITIONS,
        "global_rank": SQL_GLOBAL_RANK,
        "resample_daily": SQL_RESAMPLE_DAILY,
        "lm_score": SQL_LM_SCORE,
        "ccnet_buckets": SQL_CCNET_BUCKETS,
        "dedup_keep_best": _dedup_keep_best_oracle_sql(),
        "group_split": SQL_GROUP_SPLIT,
        "shard_shuffle": SQL_SHARD_SHUFFLE,
        "retrieval_metrics": SQL_RETRIEVAL_METRICS,
        "winsorize": SQL_WINSORIZE,
        "weighted_sample": SQL_WEIGHTED_SAMPLE,
        "phrase_search": SQL_PHRASE_SEARCH,
        "collocations": SQL_COLLOCATIONS,
        "hybrid_search": _hybrid_oracle_sql(),
        "interval_join": SQL_INTERVAL_JOIN,
        "quantize_embeddings": SQL_QUANTIZE_EMB,
        "heavy_hitters": SQL_HEAVY_HITTERS,
        "tfidf_pairs": SQL_TFIDF_PAIRS,
        "window_stats": SQL_WINDOW_STATS,
        "q2_min_cost_supplier": SQL_Q2,
        "q11_important_parts": SQL_Q11,
        "q12_shipmode_priority": SQL_Q12,
        "q20_part_promotion": SQL_Q20,
        "q21_suppliers_waiting": SQL_Q21,
        "dup_spans": SQL_DUP_SPANS,
        "dsir_weights": SQL_DSIR_WEIGHTS,
        "dsir_sample": SQL_DSIR_SAMPLE,
        "source_divergence": SQL_SOURCE_DIVERGENCE,
        "token_entropy": SQL_TOKEN_ENTROPY,
        "gap_fill_interp": SQL_GAP_FILL,
        "variant_props": SQL_VARIANT_PROPS,
        "outliers_robust": SQL_OUTLIERS_ROBUST,
        # the indexed path must score EXACTLY like the one-shot scorer:
        # same oracle
        "bm25_indexed": _bm25_oracle_sql(),
        "triangle_count": SQL_TRIANGLE_COUNT,
        "corr_matrix": SQL_CORR_MATRIX,
        "ab_test": SQL_AB_TEST,
        "histo2d": SQL_HISTO2D,
        # identical semantics to ngram_jaccard by construction: same oracle
        "ngram_jaccard_ppjoin": SQL_NGRAM_JACCARD,
        "encode_categorical": SQL_ENCODE_CATEGORICAL,
        "target_encode": SQL_TARGET_ENCODE,
        "roc_auc": SQL_ROC_AUC,
        "confusion_stats": SQL_CONFUSION,
        "bootstrap_ci": SQL_BOOTSTRAP_CI,
        # rows-only by design (no SQL-expressible oracle): multimodal_features,
        # lsh_ann, ivf_ann, pq_ann, ivfpq_ann, filtered_ann (approximate ANN;
        # filtered_ann's predicate/recall invariants are pinned in pytest),
        # histo_equidepth_approx / winsorize_approx (sketch-placed bounds),
        # bpe_tokens (iterative), semdedup / semdedup_assign (k-means
        # clustering state), pca_embeddings (eigendecomposition),
        # logreg_score (iterative driver-updated gradient descent)
    }
