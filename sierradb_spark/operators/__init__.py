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
# Round-10 rotation (VERDICT r9 brief item 1, executing the freshness
# plan staged here in r9): the surface is frozen at 259 and the
# cumulative ledger is 259/259 driver-green, so rotation is pure
# freshness maintenance — this window is the 50 queries whose most
# recent driver evidence was oldest entering r10 (re-verified this
# round by set-diffing CORRECTNESS_r01–r09: the 9 remaining r4 rows +
# the 41 alphabetically-first r5 rows, byte-identical to the r9-staged
# list). Several run on paths touched in r8-r9 (blocked_name_match /
# dsir spread probes, dq's projected width-aware spread,
# dedup_threshold_sensitivity's r9 one-pass aggregate over the
# memoized jaccard-pair relation, label_prop / quality_dup_calibration
# on the memo stamps), so fresh rows double as driver evidence ON
# current code. All 50 are hash-matching at sf0.01 (judge's
# independent 259/259 re-run, r9) and sf0.1 (PARITY_sf0.1.md). Landing
# this advances the oldest driver evidence in the ledger from r4 to
# >= r5 (exactly 9 r5 rows remain after this window).
_FRONT_50 = [
    # the 9 remaining r4-evidence rows
    "chunk_dedup_survivors", "doc_repetition_gopher",
    "embedding_near_dup_bucketed", "kmeans_embedding_clusters",
    "pii_redacted_corpus", "repeated_span_stats", "semdedup_survivors",
    "sq8_quantized_recall", "substring_scrubbed_corpus",
    # the 41 alphabetically-first r5-evidence rows
    "basket_association_rules", "blocked_name_match_stats",
    "bloom_membership_audit", "bm25_top_docs", "bpe_encode_stats",
    "bpe_learn_merges", "cms_heavy_hitters", "containment_partial_dup",
    "cross_lingual_template_pairs", "dedup_attribution_by_source",
    "dedup_threshold_sensitivity", "dq_completeness_report",
    "dsir_importance_weights", "event_conditional_entropy",
    "event_type_trigrams", "gapfill_hourly_rollup",
    "hard_negative_mining", "heaps_law_vocab_growth",
    "ivf_cell_balance_audit", "ivf_pq_adc_topk", "join_key_skew_audit",
    "kl_source_divergence", "label_prop_communities",
    "late_arrival_stats", "lsh_join_cost_audit",
    "markov_stationary_distribution", "matryoshka_truncation_recall",
    "minhash_verified_pairs", "multitouch_attribution",
    "partition_balance_audit", "pq_adc_recall",
    "quality_dup_calibration", "quality_lr_calibration",
    "quality_lr_classifier", "rake_keyphrases", "rrf_hybrid_topk",
    "scd2_entity_history", "sorted_neighborhood_matches",
    "source_overlap_matrix", "split_leakage_audit",
    "token_budget_allocation",
]
REGISTRY.reorder_front(_FRONT_50)

# Round-11 rotation plan (staged; do NOT reorder before the r10 gate
# has run on the window above). Continue the freshness ladder: with the
# window above counted as round-10 evidence, the next-oldest 50 are the
# 9 remaining r5 rows (tokenizer_fertility_stats, tokenizer_oov_by_lang,
# top_session_paths, triangle_count_near_dup, unimax_allocation,
# url_canonical_dedup, user_rfm_segments, vocab_coverage_curve,
# zipf_law_fit) plus the 41 alphabetically-first r6 rows:
# ab_test_power, ab_test_proportions, benford_law_audit,
# changepoint_binary_segmentation, cohens_d_priority,
# cramers_v_association, daily_value_bands, degree_assortativity,
# dow_anova_ftest, embedding_anisotropy, embedding_dim_stats,
# embedding_top_pc_power, empirical_bayes_user_means,
# event_mix_wilson_ci, gemm_topk_cosine, hll_distinct_audit,
# holt_linear_forecast, holt_winters_forecast,
# jl_projection_distortion, kaplan_meier_retention,
# kcenter_coreset_selection, kcore_near_dup, kmv_set_ops,
# ks_drift_by_event_type, longest_activity_streak,
# mad_robust_outliers, mann_whitney_u_test, median_ci_order_stat,
# mmr_diverse_rerank, overdispersion_index, pagerank_near_dup,
# poisson_bootstrap_ci, psi_value_drift, q11_important_stock,
# q16_parts_supplier_count, q20_concentrated_suppliers,
# q2_min_cost_supplier, referential_integrity_audit,
# retrieval_rank_quality, session_bounce_stats,
# shapley_channel_attribution. Re-verify by set-diffing
# CORRECTNESS_r01–r10 at the start of r11 in case the r10 window is
# recorded differently than staged.

__all__ = ["Query", "Registry", "REGISTRY", "load"]
