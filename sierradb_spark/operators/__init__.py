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

# The driver's correctness gate checks the FIRST 50 registry entries, so
# the north-star surface is pinned there EXPLICITLY (immune to module-
# internal insertion-order drift): event reads, text analysis, exact
# dedup, then the PRODUCTION-WIDTH sketches (64-hash MinHash LSH,
# 64-bit SimHash Hamming bands, banded sign-LSH embedding pairs — the
# operators the 100 TB dedup story actually ships, promoted over their
# demo-width siblings which remain in the registry behind the window),
# similarity/ANN, multimodal, and the curation pipeline.
_FRONT_50 = [
    # event reads: every core read (eget/escan/epscan/esver/epseq/
    # watermark gate) carries green driver evidence from r01-r04 and
    # rotates behind the window this round — all stay oracle-checked.
    # production-width sketch dedup (minhash_wide_bands/candidates/
    # recall and sequence_packing all carry r04 driver evidence and
    # rotate behind the window; verified_pairs stays for its first
    # driver check; simhash64_hamming_candidates and
    # embedding_near_dup_bucketed went green in r04 and rotate behind)
    "minhash_verified_pairs",
    # similarity / ANN + retrieval (ivf_probe2 carries r04 evidence,
    # rotates behind)
    "bm25_top_docs", "ivf_pq_adc_topk",
    # round-5 session wave 4: this session's flagship new operators —
    # BPE merge learning (exact iterative tokenizer training), the
    # Markov stationary distribution (renormalized power iteration),
    # RAKE keyphrases (gaps-and-islands + ordered-fold scoring), and
    # the quality-vs-duplication calibration. None has driver
    # evidence yet.
    "bpe_learn_merges", "markov_stationary_distribution",
    "rake_keyphrases", "quality_dup_calibration",
    # round-5 rotation wave 3: this session's new operators, none with
    # driver evidence yet — retrieval fusion, entity resolution, the
    # shuffle-planning and LSH/IVF audits, fertility, the threshold
    # sweep, token budgeting, and RFM segmentation. (Displaced to make
    # room — escan_stream_range, esver_stream_heads, text_token_stats,
    # pii_redacted_corpus, similarity_topk_cosine,
    # multimodal_decode_metadata, quality_filter_funnel,
    # semdedup_survivors, dedup_survivor_corpus, benchmark_contamination,
    # repeated_span_stats, substring_scrubbed_corpus — each green in
    # CORRECTNESS_r04 and staying oracle-checked behind the window.)
    "rrf_hybrid_topk", "blocked_name_match_stats",
    "sorted_neighborhood_matches", "join_key_skew_audit",
    "partition_balance_audit", "tokenizer_fertility_stats",
    "dedup_threshold_sensitivity", "token_budget_allocation",
    "user_rfm_segments", "lsh_join_cost_audit",
    "cross_lingual_template_pairs", "ivf_cell_balance_audit",
    "multitouch_attribution",
    # round-5 rotation wave 1 (r04 brief item 4): never-driver-checked
    # flagships promoted for driver evidence
    "url_canonical_dedup", "pq_adc_recall", "matryoshka_truncation_recall",
    "heaps_law_vocab_growth", "zipf_law_fit", "triangle_count_near_dup",
    "gapfill_hourly_rollup", "scd2_entity_history", "event_type_trigrams",
    "late_arrival_stats",
    # round-5 rotation wave 2: this round's new operator families, none
    # of which has driver evidence yet — data selection (DSIR/KL/OOV),
    # membership + count sketches (Bloom/CMS/KMV/portable HLL),
    # containment + attribution + split-leakage dedup audits, source
    # overlap, graph communities, and the spectral embedding suite.
    # (Displaced to make room — escan_reverse_limit,
    # epscan_partition_range, epseq_partition_heads, text_quality_by_lang,
    # lang_id_heuristic, dedup_exact_stats, multimodal_metadata_only,
    # multimodal_byte_features, lsh_bucket_candidates, ivf_probe1_topk,
    # near_dup_components, chunk_dedup_survivors, doc_repetition_gopher,
    # dedup_keep_best_quality, sq8_quantized_recall,
    # kmeans_embedding_clusters — every one is green in CORRECTNESS_r04
    # or earlier rounds and stays oracle-checked behind the window.)
    "dsir_importance_weights", "kl_source_divergence", "tokenizer_oov_by_lang",
    "bloom_membership_audit", "cms_heavy_hitters",
    "containment_partial_dup", "dedup_attribution_by_source",
    "split_leakage_audit", "source_overlap_matrix",
    "label_prop_communities",
    # round-5 session wave 5: this session's newest flagships — the
    # in-engine-trained LR classifier and its reliability diagram, BPE
    # encode-with-learned-merges, UniMax waterfilling, the
    # data-quality profile, and session path mining. None has driver
    # evidence yet. (Displaced to make room — kmv_set_ops,
    # hll_distinct_audit, embedding_dim_stats, embedding_top_pc_power,
    # embedding_anisotropy, jl_projection_distortion — all green in
    # this session's full local 211/211 sf0.01 sweep and staying
    # oracle-checked behind the window.)
    "quality_lr_classifier", "quality_lr_calibration", "bpe_encode_stats",
    "unimax_allocation", "dq_completeness_report", "top_session_paths",
    # round-5 session wave 6: pattern mining + contrastive curation —
    # market-basket association rules, hard-negative mining, next-event
    # conditional entropy, and the windowless vocab coverage curve.
    # None has driver evidence yet. (Displaced to make room —
    # simhash64_hamming_candidates and embedding_near_dup_bucketed,
    # both green in CORRECTNESS_r04 and staying oracle-checked behind
    # the window.)
    "basket_association_rules", "hard_negative_mining",
    "event_conditional_entropy", "vocab_coverage_curve",
]
REGISTRY.reorder_front(_FRONT_50)

__all__ = ["Query", "Registry", "REGISTRY", "load"]
