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
# Round-8 rotation (VERDICT r7 brief item 2, executing the plan staged
# here in r7): ``lineitem_price_stats`` first — the single query that
# had never appeared in a driver window after r1–r7 (258/259 distinct
# cumulative) — closing the driver-evidence ledger at 259/259. The 49
# fillers are the oldest-evidence queries from the r01 window: their
# driver rows are seven rounds old and several now execute on code
# optimized since (embedding_near_dup_pairs and
# ngram_jaccard_similar_pairs consume the r7 session memos,
# minhash_signatures the staged shingle barrier), so fresh rows double
# as driver evidence ON the optimized paths. All 50 are hash-matching
# at sf0.01 (judge's independent 259/259 re-run, r7) and sf0.1
# (PARITY_sf0.1.md).
_FRONT_50 = [
    # the ledger-closer: per-group price/discount moments over lineitem
    "lineitem_price_stats",
    # event-store read path (r01 rows, now on r4+ pruned plans)
    "eget_point_lookup", "escan_stream_range", "escan_reverse_limit",
    "epscan_partition_range", "esver_stream_heads",
    "epseq_partition_heads", "watermark_gated_scan",
    "running_total_per_stream", "sessionize_streams",
    "tumbling_window_value", "monthly_event_rollup",
    "salted_event_type_stats", "value_percentiles_by_type",
    "json_props_stats", "distinct_user_counts",
    # relational core (TPC-H-ish)
    "q1_pricing_summary", "q3_top_revenue_orders", "q5_nation_revenue",
    "rollup_lineitem_status", "pivot_status_by_priority",
    "top_customers_by_spend", "top3_orders_per_customer",
    "orders_above_customer_avg", "anti_join_inactive_customers",
    "set_op_repeat_customers", "asof_join_last_signup",
    "string_funcs_suppliers",
    # dedup family (exact, minhash/LSH on the r7 session memos,
    # simhash, n-gram jaccard, fingerprints)
    "dedup_exact_stats", "dedup_exact_keep_first", "doc_fingerprint",
    "minhash_signatures", "lsh_bucket_candidates",
    "near_dup_candidate_pairs", "ngram_jaccard_similar_pairs",
    "simhash_dedup_buckets", "embedding_near_dup_pairs",
    # similarity / embeddings
    "similarity_topk_cosine", "ivf_probe1_topk", "knn_label_recall",
    "embedding_norms", "label_centroid_summary",
    # text analysis
    "lang_id_heuristic", "text_quality_by_lang", "text_token_stats",
    "bpe_token_stats",
    # multimodal plumbing (Arrow-batched mapInPandas)
    "multimodal_metadata_only", "multimodal_decode_metadata",
    "multimodal_byte_features", "multimodal_resize_plan",
]
REGISTRY.reorder_front(_FRONT_50)

# Round-9 rotation plan (staged; do NOT reorder before the r8 gate has
# run on the window above). With r8's window recorded, the cumulative
# ledger is 259/259 distinct and rotation switches to freshness
# maintenance: the next window is the 50 queries whose most recent
# driver evidence is oldest — computed from CORRECTNESS_r01-r07 with
# the r8 window counted as round-8 evidence: 27 queries last checked in
# r2, 5 in r3, 18 in r4 —
#   user_state_projection, retention_cohorts, funnel_signup_purchase,
#   range_join_value_bands, approx_distinct_users,
#   approx_value_percentiles, q6_forecast_revenue, q4_order_priority,
#   q10_returned_items, q14_promo_revenue, q18_large_volume_orders,
#   q19_bracket_revenue, nation_trade_matrix, cube_status_priority,
#   sliding_window_value, session_window_builtin, q7_volume_shipping,
#   q8_market_share, q9_profit_by_nation_year,
#   q12_late_shipment_priority, q13_customer_order_distribution,
#   q15_top_supplier, q17_small_quantity_revenue, q21_waiting_suppliers,
#   q22_inactive_rich_customers, full_outer_nation_coverage,
#   customer_spend_quartiles, deterministic_doc_sample,
#   text_normalize_stats, top_bigrams_by_lang, epoch_shuffle_order,
#   ann_recall_probe1, winnow_fingerprints, ivf_probe2_topk,
#   multimodal_frame_sample, train_shard_assignment,
#   near_dup_components, sequence_packing, dedup_keep_best_quality,
#   quality_filter_funnel, word_entropy_by_lang,
#   repetition_ratio_stats, stratified_sample_by_lang,
#   token_bucket_histogram, dedup_survivor_corpus, minhash_wide_bands,
#   minhash_wide_candidates, minhash_wide_recall, simhash64_signatures,
#   simhash64_hamming_candidates.
# Several of these now run on r8-optimized paths (the registry.spread
# pass: near_dup_components consumes the spread scored-pairs memo,
# text_normalize_stats and the minhash_wide/simhash64 families the
# spread staging checkpoints), so fresh rows double as driver evidence
# ON the optimized code.

__all__ = ["Query", "Registry", "REGISTRY", "load"]
