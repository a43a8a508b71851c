"""Assembled query registry — the declared operator surface.

``REGISTRY.queries`` maps name → Query(spark_fn, oracle_sql). This is
what ``__spark_entry__.py`` exposes to the driver's correctness gate,
and what ``bench.py`` samples its headline set from.
"""

from sierradb_spark.registry import Query, Registry, load

from sierradb_spark.operators import (
    audits,
    dq,
    event_analytics,
    event_reads,
    relational,
    relational2,
    relational3,
    relational4,
    sketches,
    stats,
    timeseries,
    windows,
)
from sierradb_spark.functions import (
    bpe,
    classifier,
    clustering,
    entity,
    contamination,
    scrub,
    dedup,
    dedup_wide,
    graphs,
    multimodal,
    quantize,
    retrieval,
    selection,
    membership,
    mining,
    spectral,
    pipeline,
    quality,
    similarity,
    substring,
    text,
    text2,
    text3,
    udx,
)

REGISTRY = Registry()
for mod in (
    event_reads,
    text,
    dedup,
    similarity,
    multimodal,
    pipeline,
    quality,
    windows,
    contamination,
    udx,
    dedup_wide,
    text2,
    event_analytics,
    sketches,
    relational,
    relational2,
    relational3,
    relational4,
    timeseries,
    scrub,
    text3,
    quantize,
    retrieval,
    selection,
    membership,
    mining,
    spectral,
    graphs,
    clustering,
    stats,
    substring,
    entity,
    audits,
    bpe,
    dq,
    classifier,
):
    REGISTRY.merge(mod.REG)

# The driver's correctness gate checks the FIRST 50 registry entries.
# Round-12 rotation (VERDICT r11 item 8, executing the freshness plan
# staged here in r11): the surface is frozen at 259 and the cumulative
# ledger is 259/259 driver-green (CORRECTNESS_r11 landed the staged r11
# window 50/50 with hash_match, so the oldest driver evidence entering
# r12 is r6). This window is the 50 queries whose most recent driver
# evidence is oldest — re-verified at the start of r12 by set-diffing
# CORRECTNESS_r01–r11 (max round per query with rows_match AND
# hash_match): exactly the 9 remaining r6 rows + the 41
# alphabetically-first r7 rows, set-identical to the r11-staged list.
# Landing this advances the oldest driver evidence from r6 to r7
# (exactly 9 r7 rows remain after this window).
_FRONT_50 = [
    # the 9 remaining r6-evidence rows
    "spearman_rank_correlation", "target_encoding_oof",
    "tfidf_top_terms", "theil_sen_trend", "trimmed_winsorized_stats",
    "two_hop_reach_topk", "value_concentration_gini",
    "weekend_lift_welch_t", "weekly_seasonal_decompose",
    # the 41 alphabetically-first r7-evidence rows
    "band_agreement_calibration", "benchmark_contamination",
    "bigram_surprisal_scores", "blocklist_filter_stats",
    "chunk_dedup_stats", "cohort_value_matrix", "doc_chunk_index",
    "domain_mixture_plan", "dq_constraint_violations",
    "embedding_bucketed_recall", "embedding_label_margin",
    "event_daily_autocorr", "event_transition_matrix",
    "event_value_cusum", "event_value_trend", "ewma_anomaly_daily",
    "expected_steps_to_purchase", "frequent_event_values",
    "grouping_sets_revenue", "hourly_burst_detection",
    "hybrid_filtered_topk", "interarrival_time_stats",
    "interpurchase_time_stats", "knn_label_accuracy",
    "length_tail_index", "lexicon_sentiment_scores",
    "local_clustering_histogram", "lsh_parameter_planner",
    "near_dup_components_lsh", "packing_waste_curve",
    "pareto_skyline_orders", "pii_detection_stats",
    "pmi_collocations", "quality_weighted_sample",
    "readability_scores", "revenue_concentration_8020",
    "rolling_7d_user_value", "semdedup_cell_stats",
    "source_novelty_stats", "temperature_mixture_weights",
    "time_to_convert_stats",
]
REGISTRY.reorder_front(_FRONT_50)

# Round-13 rotation plan (staged; do NOT reorder before the r12 gate
# has run on the window above). Continue the freshness ladder: with the
# window above counted as round-12 evidence, the next-oldest 50 are the
# 9 remaining r7 rows (trigram_interpolated_surprisal,
# tseries_pattern_search, type_token_ratio_by_source,
# udaf_geomean_value, udtf_sentence_split, unigram_surprisal_scores,
# value_equidepth_histogram, value_outlier_stats,
# winnow_near_dup_pairs) plus the 41 alphabetically-first r8 rows:
# anti_join_inactive_customers, asof_join_last_signup,
# bpe_token_stats, dedup_exact_keep_first, dedup_exact_stats,
# distinct_user_counts, doc_fingerprint, eget_point_lookup,
# embedding_near_dup_pairs, embedding_norms, epscan_partition_range,
# epseq_partition_heads, escan_reverse_limit, escan_stream_range,
# esver_stream_heads, ivf_probe1_topk, json_props_stats,
# knn_label_recall, label_centroid_summary, lang_id_heuristic,
# lineitem_price_stats, lsh_bucket_candidates, minhash_signatures,
# monthly_event_rollup, multimodal_byte_features,
# multimodal_decode_metadata, multimodal_metadata_only,
# multimodal_resize_plan, near_dup_candidate_pairs,
# ngram_jaccard_similar_pairs, orders_above_customer_avg,
# pivot_status_by_priority, q1_pricing_summary,
# q3_top_revenue_orders, q5_nation_revenue, rollup_lineitem_status,
# running_total_per_stream, salted_event_type_stats,
# sessionize_streams, set_op_repeat_customers, simhash_dedup_buckets.
# Re-verify by set-diffing CORRECTNESS_r01–r12 at the start of r13 in
# case the r12 window is recorded differently than staged.

__all__ = ["Query", "Registry", "REGISTRY", "load"]
