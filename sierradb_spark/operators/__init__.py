"""Assembled query registry — the declared operator surface.

``REGISTRY.queries`` maps name → Query(spark_fn, oracle_sql). This is
what ``__spark_entry__.py`` exposes to the driver's correctness gate,
and what ``bench.py`` samples its headline set from.
"""

from sierradb_spark.registry import Query, Registry, load

from sierradb_spark.operators import (
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
    clustering,
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
    spectral,
    graphs,
    clustering,
    stats,
    substring,
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
    # event reads (7)
    "eget_point_lookup", "escan_stream_range", "escan_reverse_limit",
    "epscan_partition_range", "esver_stream_heads", "epseq_partition_heads",
    "watermark_gated_scan",
    # text analysis + PII (4)
    "text_token_stats", "text_quality_by_lang", "lang_id_heuristic",
    "pii_redacted_corpus",
    # exact dedup (1)
    "dedup_exact_stats",
    # production-width sketch dedup (6)
    "minhash_wide_bands", "minhash_wide_candidates", "minhash_wide_recall",
    "minhash_verified_pairs",
    "simhash64_hamming_candidates",
    "embedding_near_dup_bucketed",
    # similarity / ANN + retrieval (5)
    "similarity_topk_cosine", "bm25_top_docs",
    "ivf_probe1_topk", "lsh_bucket_candidates", "ivf_probe2_topk",
    # multimodal (3)
    "multimodal_decode_metadata", "multimodal_metadata_only",
    "multimodal_byte_features",
    # curation pipeline + quality + chunk/semantic dedup (9)
    "near_dup_components", "sequence_packing",
    "chunk_dedup_survivors", "doc_repetition_gopher", "dedup_keep_best_quality",
    "quality_filter_funnel", "semdedup_survivors",
    "dedup_survivor_corpus", "benchmark_contamination",
    # round-3 flagships: clustering + quantized-ANN audit
    "kmeans_embedding_clusters", "sq8_quantized_recall",
    # round-4 flagships: exact-substring span dedup
    "repeated_span_stats", "substring_scrubbed_corpus",
    # round-5 rotation (r04 brief item 4): never-driver-checked
    # flagships promoted for driver evidence...
    "url_canonical_dedup", "pq_adc_recall", "matryoshka_truncation_recall",
    "heaps_law_vocab_growth", "zipf_law_fit", "triangle_count_near_dup",
    # ...plus the round-5 additions: hypertable gapfill, SCD-2 history,
    # sequence mining, watermark-delay diagnostic, IVF-PQ composite.
    # (Displaced rows — bpe/winnow/entropy/repetition/token-histogram
    # text+quality stats, keep-first exact dedup, knn/centroid/norms
    # similarity audits, simhash64 signature map (exercised by its
    # banding row), resize/frame multimodal plumbing, shard/stratified
    # hash routing — all carry green driver evidence from
    # CORRECTNESS_r01-r04 and stay oracle-checked behind the window.)
    "gapfill_hourly_rollup", "scd2_entity_history", "event_type_trigrams",
    "late_arrival_stats", "ivf_pq_adc_topk",
]
REGISTRY.reorder_front(_FRONT_50)

__all__ = ["Query", "Registry", "REGISTRY", "load"]
