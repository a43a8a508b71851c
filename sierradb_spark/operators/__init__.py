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
# Round-6 rotation (VERDICT r5 brief item 1): after five rounds, 158 of
# 259 queries carry driver evidence and 101 have NEVER appeared in a
# driver window. This round's window is drawn ENTIRELY from that
# backlog — 50 never-driver-checked queries, prioritized per the
# judge's list (the statistical-inference family, the forecast/
# changepoint time-series pair, the spectral suite, retrieval rerank,
# coreset/OOF selection, graph reach/k-core, and the TPC-H
# q2/q11/q16/q20 sweep). Every query displaced from the r5 window went
# green in CORRECTNESS_r05 and stays oracle-checked behind the window;
# the remaining ~51 backlog queries rotate in r07.
_FRONT_50 = [
    # statistical testing / inference family (operators/stats.py) — the
    # largest never-checked block: two-sample tests, CIs, robust
    # estimators, drift and association measures.
    "weekend_lift_welch_t", "mann_whitney_u_test", "event_mix_wilson_ci",
    "poisson_bootstrap_ci", "theil_sen_trend", "empirical_bayes_user_means",
    "cramers_v_association", "dow_anova_ftest", "overdispersion_index",
    "benford_law_audit", "psi_value_drift", "ks_drift_by_event_type",
    "spearman_rank_correlation", "median_ci_order_stat",
    "trimmed_winsorized_stats", "value_concentration_gini",
    "mad_robust_outliers", "cohens_d_priority", "ab_test_proportions",
    "ab_test_power", "daily_value_bands",
    # time-series forecasts + changepoints (operators/timeseries.py)
    "holt_winters_forecast", "changepoint_binary_segmentation",
    "holt_linear_forecast", "weekly_seasonal_decompose",
    # spectral embedding diagnostics (functions/spectral.py)
    "embedding_top_pc_power", "embedding_anisotropy",
    "jl_projection_distortion", "embedding_dim_stats",
    # retrieval rerank + data selection (retrieval.py / selection.py)
    "mmr_diverse_rerank", "retrieval_rank_quality",
    "kcenter_coreset_selection", "target_encoding_oof",
    # graph analytics over the near-dup graph (functions/graphs.py)
    "two_hop_reach_topk", "kcore_near_dup", "pagerank_near_dup",
    "degree_assortativity",
    # TPC-H relational sweep (operators/relational*.py)
    "q2_min_cost_supplier", "q11_important_stock",
    "q16_parts_supplier_count", "q20_concentrated_suppliers",
    # event analytics: survival, attribution, streaks, bounce
    "kaplan_meier_retention", "shapley_channel_attribution",
    "session_bounce_stats", "longest_activity_streak",
    # cardinality sketches (operators/sketches.py + membership.py)
    "hll_distinct_audit", "kmv_set_ops",
    # similarity scale path (GEMM brute-force twin; also carries this
    # round's NaN-ordering fix — fresh driver evidence wanted)
    "gemm_topk_cosine",
    # text + data-quality never-checked flagships
    "tfidf_top_terms", "referential_integrity_audit",
]
# r07 rotation plan: the 51 queries below are the LAST of the
# never-driver-checked backlog once this window lands (every other
# registry entry is green in CORRECTNESS_r01–r05 or in this window).
# Rotate them (plus window-size filler from the oldest evidence) in
# next round; all 51 already hash-match at sf0.1 (PARITY_sf0.1.md):
#   hybrid_filtered_topk, embedding_label_margin,
#   temperature_mixture_weights, quality_weighted_sample,
#   packing_waste_curve, length_tail_index, benchmark_contamination,
#   blocklist_filter_stats, domain_mixture_plan, udaf_geomean_value,
#   udtf_sentence_split, near_dup_components_lsh,
#   embedding_bucketed_recall, semdedup_cell_stats,
#   band_agreement_calibration, lsh_parameter_planner,
#   unigram_surprisal_scores, type_token_ratio_by_source,
#   lexicon_sentiment_scores, tseries_pattern_search,
#   value_outlier_stats, event_transition_matrix, event_daily_autocorr,
#   interarrival_time_stats, time_to_convert_stats,
#   expected_steps_to_purchase, grouping_sets_revenue,
#   frequent_event_values, pareto_skyline_orders,
#   interpurchase_time_stats, revenue_concentration_8020,
#   rolling_7d_user_value, ewma_anomaly_daily, hourly_burst_detection,
#   pii_detection_stats, chunk_dedup_stats, winnow_near_dup_pairs,
#   bigram_surprisal_scores, doc_chunk_index, readability_scores,
#   trigram_interpolated_surprisal, pmi_collocations,
#   source_novelty_stats, local_clustering_histogram,
#   knn_label_accuracy, lineitem_price_stats, event_value_trend,
#   event_value_cusum, value_equidepth_histogram, cohort_value_matrix,
#   dq_constraint_violations
REGISTRY.reorder_front(_FRONT_50)

__all__ = ["Query", "Registry", "REGISTRY", "load"]
