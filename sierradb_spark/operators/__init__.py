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
# Round-9 rotation (VERDICT r8 brief item 2, executing the freshness
# plan staged here in r8): with the cumulative ledger closed at 259/259
# distinct driver-green queries, rotation is now pure freshness
# maintenance — this window is the 50 queries whose most recent driver
# evidence was oldest entering r9 (27 last checked in r2, 5 in r3, 18
# in r4; computed by set-diffing CORRECTNESS_r01–r08). Several now run
# on r8-optimized paths (the registry.spread pass: near_dup_components
# consumes the spread scored-pairs memo, text_normalize_stats and the
# minhash_wide/simhash64 families the spread staging checkpoints), so
# fresh rows double as driver evidence ON the optimized code. All 50
# are hash-matching at sf0.01 (judge's independent 259/259 re-run, r8)
# and sf0.1 (PARITY_sf0.1.md). Landing this advances the oldest driver
# evidence in the ledger from r2 to >= r5.
_FRONT_50 = [
    # event projections / windows (r2 evidence)
    "user_state_projection", "retention_cohorts",
    "funnel_signup_purchase", "range_join_value_bands",
    "approx_distinct_users", "approx_value_percentiles",
    "sliding_window_value", "session_window_builtin",
    # relational core, TPC-H-ish (r2/r3 evidence)
    "q4_order_priority", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_market_share", "q9_profit_by_nation_year", "q10_returned_items",
    "q12_late_shipment_priority", "q13_customer_order_distribution",
    "q14_promo_revenue", "q15_top_supplier",
    "q17_small_quantity_revenue", "q18_large_volume_orders",
    "q19_bracket_revenue", "q21_waiting_suppliers",
    "q22_inactive_rich_customers", "nation_trade_matrix",
    "cube_status_priority", "full_outer_nation_coverage",
    "customer_spend_quartiles",
    # curation / sampling / packing (r4 evidence)
    "deterministic_doc_sample", "epoch_shuffle_order",
    "train_shard_assignment", "sequence_packing",
    "stratified_sample_by_lang", "dedup_keep_best_quality",
    "quality_filter_funnel", "dedup_survivor_corpus",
    # text analysis (r4 evidence)
    "text_normalize_stats", "top_bigrams_by_lang",
    "word_entropy_by_lang", "repetition_ratio_stats",
    "token_bucket_histogram",
    # similarity / ANN (r4 evidence)
    "ann_recall_probe1", "ivf_probe2_topk",
    # wide dedup families on the r8-spread staging paths (r4 evidence)
    "winnow_fingerprints", "near_dup_components", "minhash_wide_bands",
    "minhash_wide_candidates", "minhash_wide_recall",
    "simhash64_signatures", "simhash64_hamming_candidates",
    # multimodal plumbing (r4 evidence)
    "multimodal_frame_sample",
]
REGISTRY.reorder_front(_FRONT_50)

# Round-10 rotation plan (staged; do NOT reorder before the r9 gate has
# run on the window above). Continue the freshness ladder: the next
# window is the 50 queries whose most recent driver evidence is oldest
# AFTER this window lands — computed from CORRECTNESS_r01–r08 with the
# window above counted as round-9 evidence: the 9 remaining r4 rows
# (chunk_dedup_survivors, doc_repetition_gopher,
# embedding_near_dup_bucketed, kmeans_embedding_clusters,
# pii_redacted_corpus, repeated_span_stats, semdedup_survivors,
# sq8_quantized_recall, substring_scrubbed_corpus) plus the 41
# alphabetically-first r5 rows: basket_association_rules,
# blocked_name_match_stats, bloom_membership_audit, bm25_top_docs,
# bpe_encode_stats, bpe_learn_merges, cms_heavy_hitters,
# containment_partial_dup, cross_lingual_template_pairs,
# dedup_attribution_by_source, dedup_threshold_sensitivity,
# dq_completeness_report, dsir_importance_weights,
# event_conditional_entropy, event_type_trigrams,
# gapfill_hourly_rollup, hard_negative_mining, heaps_law_vocab_growth,
# ivf_cell_balance_audit, ivf_pq_adc_topk, join_key_skew_audit,
# kl_source_divergence, label_prop_communities, late_arrival_stats,
# lsh_join_cost_audit, markov_stationary_distribution,
# matryoshka_truncation_recall, minhash_verified_pairs,
# multitouch_attribution, partition_balance_audit, pq_adc_recall,
# quality_dup_calibration, quality_lr_calibration,
# quality_lr_classifier, rake_keyphrases, rrf_hybrid_topk,
# scd2_entity_history, sorted_neighborhood_matches,
# source_overlap_matrix, split_leakage_audit, token_budget_allocation.
# Several run on paths touched in r8-r9 (blocked_name_match/dsir
# spread probes, dq's projected width-aware spread,
# dedup_threshold_sensitivity's r9 one-pass aggregate,
# label_prop/quality_dup_calibration on the memo stamps), so fresh
# rows again double as evidence on current code. Re-verify the list by
# set-diffing CORRECTNESS_r01–r09 at the start of r10 in case the r9
# window is recorded differently than staged.

__all__ = ["Query", "Registry", "REGISTRY", "load"]
