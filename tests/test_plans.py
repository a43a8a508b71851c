"""Plan-shape regression tests: the 100 TB design properties, asserted.

A query that silently loses a pushdown, broadcasts nothing, or plans a
cartesian product would still pass value-correctness tests at sf0.01 —
these tests fail it immediately instead.
"""

from __future__ import annotations

import pytest

from sierradb_spark.operators import REGISTRY
from sierradb_spark.plans import assert_plan


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(name):
        return REGISTRY.queries[name].spark(spark, sf_dir)

    return run


def test_q1_single_shuffle_pruned_scan(q):
    # scan only the 7 needed of 17 lineitem columns; one exchange; partial agg
    f = assert_plan(
        q("q1_pricing_summary"),
        max_shuffles=1,
        require_pushed_filter="l_shipdate",
        max_scan_columns=7,
    )
    assert f["partial_aggs"] > 0


def test_q3_broadcasts_dimensions_topk(q):
    assert_plan(
        q("q3_top_revenue_orders"),
        require_broadcast_joins=2,
        require_pushed_filter="c_mktsegment",
        require_top_k=True,
        forbid_nested_loop=True,
    )


def test_q5_all_dimensions_broadcast(q):
    # 5 of the 6-table join tree broadcast; only lineitem⋈orders may shuffle
    assert_plan(
        q("q5_nation_revenue"),
        require_broadcast_joins=5,
        require_pushed_filter="r_name",
        forbid_nested_loop=True,
    )


def test_point_lookup_pushes_key(q):
    assert_plan(
        q("eget_point_lookup"),
        max_shuffles=0,
        require_pushed_filter="event_id",
    )


def test_stream_scan_pushes_both_bounds(q):
    f = assert_plan(
        q("escan_stream_range"),
        max_shuffles=0,
        require_pushed_filter="user_id",
    )
    pushed = ";".join(f["pushed_filters"])
    assert "GreaterThanOrEqual(event_id" in pushed and "LessThanOrEqual(event_id" in pushed


def test_reverse_limit_is_topk_not_sort(q):
    assert_plan(q("escan_reverse_limit"), require_top_k=True, max_shuffles=0)


def test_watermark_gate_broadcasts(q):
    assert_plan(q("watermark_gated_scan"), require_broadcast_joins=1)


def test_topk_cosine_no_cartesian_explosion(q):
    # the 1-row query vector joins as a broadcast nested loop (fine);
    # a CartesianProduct would mean the broadcast was lost
    f = assert_plan(q("similarity_topk_cosine"), require_top_k=True)
    assert f["nested_loop_joins"] <= 1


def test_lsh_banding_is_equi_join(q):
    # band matching must plan as a hash join on the band key — a
    # nested-loop fallback here is the O(N^2) failure mode
    assert_plan(
        q("near_dup_candidate_pairs"),
        forbid_nested_loop=False,
    )
    f = assert_plan(q("near_dup_candidate_pairs"))
    assert f["broadcast_hash_joins"] + f["sort_merge_joins"] >= 1
    assert f["nested_loop_joins"] == 0


def test_q7_q8_q9_all_dimensions_broadcast(q):
    # multi-way TPC-H join trees: every dimension side must broadcast —
    # a lost broadcast at 100 TB turns into a fact-table shuffle
    assert_plan(q("q7_volume_shipping"), require_broadcast_joins=5,
                forbid_nested_loop=True)
    assert_plan(q("q8_market_share"), require_broadcast_joins=7,
                require_pushed_filter="p_type", forbid_nested_loop=True)
    assert_plan(q("q9_profit_by_nation_year"), require_broadcast_joins=4,
                forbid_nested_loop=True)


def test_q17_decorrelated_no_rescan_loop(q):
    # correlated avg subquery must become a broadcast-joined aggregate,
    # never a nested-loop re-scan per outer row
    assert_plan(q("q17_small_quantity_revenue"), require_broadcast_joins=2,
                forbid_nested_loop=True)


def test_q21_exists_decorrelated_to_hash_joins(q):
    # EXISTS/NOT EXISTS must plan as hash joins (broadcast or sort-merge)
    # against the per-order aggregate; top-10 as TakeOrderedAndProject
    f = assert_plan(q("q21_waiting_suppliers"), require_top_k=True,
                    forbid_nested_loop=True)
    assert f["broadcast_hash_joins"] + f["sort_merge_joins"] >= 2


def test_state_projection_exchange_bounded(q):
    # one user_id shuffle each for window + agg, broadcast for the join
    f = assert_plan(q("user_state_projection"), max_shuffles=3)
    assert f["broadcast_hash_joins"] >= 1


def test_bigrams_no_unigram_explosion_shuffle(q):
    # bigram counting: partial agg before the (lang, bigram) exchange;
    # the token stream itself must never cross a shuffle boundary
    f = assert_plan(q("top_bigrams_by_lang"), max_shuffles=2)
    assert f["partial_aggs"] >= 1


def _window_partition_specs(plan: str) -> list[str]:
    """First argument of every windowspecdefinition in the plan.

    A *partitioned* window spec reads ``windowspecdefinition(part_col#1,
    order_col#2 ASC ...)``; an unpartitioned one starts directly with the
    order column (``windowspecdefinition(order_col#2 ASC ...)``) — the
    single-reducer shape these tests exist to forbid.
    """
    import re

    return re.findall(r"windowspecdefinition\(([^,)]+)", plan)


def test_sequence_packing_window_is_shard_partitioned(q):
    from sierradb_spark.plans import plan_features

    f = plan_features(q("sequence_packing"))
    specs = _window_partition_specs(f["plan"])
    assert specs, "expected a window in the packing plan"
    partitioned = [
        s for s in specs if " ASC" not in s and " DESC" not in s
    ]
    # The corpus prefix sum must run under a shard-partitioned window
    # (parallel, no single-reducer sort of |corpus| rows).
    assert partitioned, f"no partitioned window in packing plan: {specs}"
    for s in partitioned:
        assert s.startswith("shard_id"), f"wrong partition key: {s}"
    # The only unpartitioned window allowed is the exclusive prefix over
    # the aggregated O(#shards) totals — identifiable because it ORDERS
    # by shard_id (the corpus window orders by doc_id within shards).
    for s in specs:
        if " ASC" in s or " DESC" in s:
            assert s.startswith("shard_id"), (
                f"unpartitioned window over non-totals input: {s}"
            )


def test_spend_quartiles_window_is_bucket_partitioned(q):
    from sierradb_spark.plans import plan_features

    f = plan_features(q("customer_spend_quartiles"))
    specs = _window_partition_specs(f["plan"])
    assert specs, "expected a window in the quartiles plan"
    for s in specs:
        assert s.startswith("bucket"), f"unpartitioned window spec: {s}"
        assert " ASC" not in s and " DESC" not in s, (
            f"window has no partition clause (single reducer): {s}"
        )


def test_wide_lsh_band_join_is_equi_join(q):
    # Candidate generation must be a hash/sort-merge EQUI join on band
    # digests — never a cartesian/nested-loop pair enumeration.
    assert_plan(
        q("minhash_wide_candidates"),
        forbid_nested_loop=True,
    )


def test_simhash64_band_join_is_equi_join(q):
    assert_plan(
        q("simhash64_hamming_candidates"),
        forbid_nested_loop=True,
    )


def test_embedding_bucketed_pairs_equi_join(q):
    # Banded sign-LSH pair generation: candidates from an equi-join on
    # (band_idx, bucket) — never a nested-loop over all vector pairs.
    assert_plan(
        q("embedding_near_dup_bucketed"),
        forbid_nested_loop=True,
    )


def test_no_session_lifetime_cache_leak(spark, sf_dir):
    """Repeated invocations of the queries that materialize
    intermediates must not accumulate cache-manager entries for the
    life of the session (an unmatched persist() pins its plan in the
    CacheManager forever; localCheckpoint blocks are released by the
    ContextCleaner once the DataFrame is garbage-collected)."""
    import gc

    from sierradb_spark.operators import REGISTRY

    def n_persistent() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    baseline = n_persistent()
    for _ in range(3):
        REGISTRY.queries["sequence_packing"].spark(spark, sf_dir).collect()
        REGISTRY.queries["customer_spend_quartiles"].spark(spark, sf_dir).collect()
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    # ContextCleaner cleanup is async: poll briefly for it to drain.
    import time as _time

    # A genuine unmatched persist() grows by >= 6 here (3 iterations x
    # 2 queries); anything below that is in-flight async ContextCleaner
    # work, which under host contention has been observed to take well
    # over 90 s to drain — so poll long, and fail only at the
    # real-leak threshold. r12: poll against the SAME threshold the
    # assert uses (+5, not +2) and longer — an external host burst can
    # starve the cleaner thread past 240 s while 3-5 blocks are still
    # in flight, which failed a full-tier run on a contended host even
    # though the isolated re-run passed in 32 s.
    deadline = _time.time() + 420
    while _time.time() < deadline and n_persistent() > baseline + 5:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        _time.sleep(2)
    assert n_persistent() <= baseline + 5, (
        f"cache entries leaked: baseline={baseline}, now={n_persistent()}"
    )


def test_sequence_packing_materialized_variant_identical(spark, sf_dir):
    """The default materialize=True (one tokenization pass via lazy
    checkpoint — the 100 TB form) must be bit-identical to the
    checkpoint-free single-plan form."""
    from sierradb_spark.functions.pipeline import sequence_packing

    a = sorted(map(tuple, sequence_packing(spark, sf_dir).collect()))
    b = sorted(
        map(tuple, sequence_packing(spark, sf_dir, materialize=False).collect())
    )
    assert a == b and len(a) > 0


def test_chunk_dedup_survivor_window_digest_only(q):
    """The C4-style keep-first pass must (a) never plan a nested-loop
    pair enumeration, and (b) shuffle the keep-first window on digests
    only — the WindowExec's child exchange must not carry chunk text."""
    f = assert_plan(
        q("chunk_dedup_survivors"),
        forbid_nested_loop=True,
    )
    plan = f["plan"]
    # The window runs over the digest-projected child: the plan contains
    # a Window partitioned by digest, and its input projection holds
    # exactly (digest, doc_id, chunk_id) — no `chunk` column.
    import re

    wins = re.findall(r"Window \[[^\]]*row_number\(\)[^\]]*\]", plan)
    assert wins, f"no row_number window in plan:\n{plan[:2000]}"
    assert all("chunk#" not in w.replace("chunk_id#", "") for w in wins), (
        f"keep-first window carries chunk text: {wins}"
    )


def test_pii_queries_single_scan_no_shuffle_of_text(q):
    # The redaction pass is scan -> project: zero joins, zero windows.
    f = assert_plan(q("pii_redacted_corpus"), max_shuffles=0)
    assert f["broadcast_hash_joins"] == 0


def test_hybrid_filtered_topk_pushes_and_takeordered(q):
    # AnalyticDB-V shape: structured predicate reaches the scan, top-k
    # plans as TakeOrderedAndProject (never a full sort). The only
    # nested-loop allowed is the broadcast of the 1-row query vector.
    f = assert_plan(
        q("hybrid_filtered_topk"),
        require_pushed_filter="vec_id",
        require_top_k=True,
    )
    assert f["nested_loop_joins"] <= 1


def test_tseries_windows_user_partitioned_topk(q):
    # The sliding-window build must run under a user-partitioned window
    # (never a single reducer over the whole event table); top-10 is
    # TakeOrderedAndProject. The 1-row query window broadcasts.
    from sierradb_spark.operators.event_analytics import (
        tseries_pattern_search,
    )
    from sierradb_spark.plans import plan_features

    # materialize=False keeps the single plan inspectable (the default
    # localCheckpoint barrier hides the window stage from explain)
    f = plan_features(q("tseries_pattern_search"))
    assert f["top_k"] >= 1
    assert f["cartesian_products"] == 0
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    from sierradb_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    raw = plan_features(tseries_pattern_search(spark, sf_dir, materialize=False))
    specs = _window_partition_specs(raw["plan"])
    assert specs and all(s.startswith("user_id") for s in specs), specs


def test_sessionize_single_exchange(q):
    # The session aggregate's (user_id, session_no) clustering is
    # satisfied by the window's hash(user_id) exchange — one shuffle
    # total. A second exchange here would re-shuffle the whole event
    # table at 100 TB for nothing.
    assert_plan(q("sessionize_streams"), max_shuffles=1)


def test_substring_scrub_spans_broadcast_no_text_in_shuffles(q):
    """Exact-substring scrub: the span table (tiny) must broadcast into
    the word-table anti-join — shuffling the exploded word table by a
    span key would move the whole corpus; and the island windows must
    run partitioned by doc_id over digest-derived positions only (gram
    text never appears in any exchange)."""
    f = assert_plan(q("substring_scrubbed_corpus"), forbid_cartesian=True)
    plan = f["plan"]
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:2000]
    specs = _window_partition_specs(plan)
    assert specs and all(s.startswith("doc_id") for s in specs), specs
    import re

    for ex in re.findall(r"Exchange hashpartitioning\([^)]*\)[^\n]*", plan):
        assert "gram" not in ex, f"gram text in a shuffle: {ex}"


def test_repeated_span_stats_digest_only_shuffle(q):
    # The dup-gram aggregate shuffles digests only; the per-doc island
    # windows are doc_id-partitioned; no pair enumeration anywhere.
    f = assert_plan(q("repeated_span_stats"), forbid_nested_loop=True)
    specs = _window_partition_specs(f["plan"])
    assert specs and all(s.startswith("doc_id") for s in specs), specs


def test_gapfill_windows_type_partitioned_grid_broadcast(q):
    # The LOCF window must be event_type-partitioned (never a global
    # single-reducer window), and the dense hour grid joins back to the
    # hourly aggregate without a cartesian product: the only
    # nested-loop is the broadcast of the bounds-derived hour list.
    from sierradb_spark.plans import plan_features

    f = plan_features(q("gapfill_hourly_rollup"))
    assert f["cartesian_products"] == 0
    specs = _window_partition_specs(f["plan"])
    assert specs and all(s.startswith("event_type") for s in specs), specs


def test_scd2_and_trigrams_user_partitioned(q):
    # Temporal-state reconstruction and sequence mining both run under
    # user-partitioned windows (entity-keyed shuffles — one exchange),
    # and the trigram top-25 plans as TakeOrderedAndProject.
    from sierradb_spark.plans import plan_features

    f = plan_features(q("scd2_entity_history"))
    specs = _window_partition_specs(f["plan"])
    assert specs and all(s.startswith("user_id") for s in specs), specs
    assert_plan(q("scd2_entity_history"), max_shuffles=1)

    f2 = assert_plan(q("event_type_trigrams"), require_top_k=True)
    specs2 = _window_partition_specs(f2["plan"])
    assert specs2 and all(s.startswith("user_id") for s in specs2), specs2


def test_ivf_pq_composite_broadcast_probe_topk(q):
    # The IVF-PQ composite: cell routing + query vector + codebooks all
    # broadcast (candidates join them, never shuffle the corpus by
    # anything but its keys); final top-10 is TakeOrderedAndProject;
    # no cartesian product (the 1-row query crossJoins are broadcast
    # nested loops, which is the allowed shape).
    f = assert_plan(q("ivf_pq_adc_topk"), require_top_k=True)
    assert f["cartesian_products"] == 0
    assert f["broadcast_hash_joins"] >= 2, f["broadcast_hash_joins"]


def test_referential_integrity_single_pass_per_table(q):
    """RI audit: per relation, ONE scan of each table — the child
    per-key counts full-outer join the distinct parent key set with no
    join exchange (both sides leave their aggregates hash-partitioned
    by the key), and parent_keys comes out of the same aggregate as
    the orphan stats (no second parent scan, no crossJoin attach)."""
    f = assert_plan(q("referential_integrity_audit"), forbid_nested_loop=True)
    plan = f["plan"]
    # 7 relations x (child + parent) = 14 scans; the old shape paid 21.
    assert plan.count("Scan parquet") == 14, plan.count("Scan parquet")
    assert plan.count("FullOuter") == 7, plan.count("FullOuter")
    # 3 exchanges per relation: child agg, parent agg, final 1-row agg.
    # The full-outer join itself must not add one.
    assert f["exchanges"] <= 21, f["exchanges"]


def test_basket_rules_pairs_explode_mapside_no_self_join(q):
    """Basket rules: pairs come from exploding per-basket sorted sets
    (Generate over the collect_set aggregate) — never from a self-join
    of the basket relation; the only broadcasts are the plausible-item
    key sets and the 1-row basket count; top-k stays TakeOrdered."""
    f = assert_plan(q("basket_association_rules"), require_top_k=True)
    plan = f["plan"]
    assert f["sort_merge_joins"] == 0, f["sort_merge_joins"]
    # the cross attach of the 1-row n_orders is the only nested loop
    assert f["nested_loop_joins"] <= 1, f["nested_loop_joins"]
    assert plan.count("Generate") >= 1, "expected map-side pair explosion"
    # one lineitem subtree per consumer (pairs, 2x keep, n) at most —
    # the old self-join shape carried five
    assert plan.count("Scan parquet") <= 4, plan.count("Scan parquet")


def test_dsir_model_broadcast_no_gram_text_in_aggregates(q):
    """DSIR: the 1024-bucket log-ratio model joins back as a broadcast;
    the scoring aggregate shuffles (doc_id, bucket)-shaped rows only —
    the raw bigram string must be hashed away before any exchange."""
    f = assert_plan(q("dsir_importance_weights"), require_broadcast_joins=1)
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\([^)]*\)", f["plan"])
    assert exchanges, f["plan"][:1500]
    assert all("gram#" not in e for e in exchanges), exchanges


def test_kl_grid_rides_broadcasts(q):
    # vocab cap + grid: the corpus-sized side is the word explode; the
    # vocab, totals and grid joins are all broadcast-sized.
    f = assert_plan(q("kl_source_divergence"), require_broadcast_joins=2)
    assert f["cartesian_products"] == 0


def test_tokenizer_oov_vocab_broadcast(q):
    assert_plan(q("tokenizer_oov_by_lang"), require_broadcast_joins=1)


def test_bloom_probe_broadcasts_fixed_size_filter(q):
    """The Bloom bit-set (<= 65536 rows, fixed regardless of corpus
    size) must sit on the broadcast side of the probe join — the
    incoming shard never shuffles against historical digests."""
    f = assert_plan(q("bloom_membership_audit"), require_broadcast_joins=1)
    assert f["cartesian_products"] == 0


def test_cms_sketch_broadcast_topk(q):
    # The 4x512-cell sketch is broadcast to the candidate probe; the
    # final top-20 plans as TakeOrderedAndProject, never a full sort.
    assert_plan(
        q("cms_heavy_hitters"),
        require_broadcast_joins=1,
        require_top_k=True,
        forbid_nested_loop=True,
    )


def test_containment_equi_joins_sizes_broadcast(q):
    """Containment scoring: every join is an equi-join (band join for
    candidates, digest join for intersections, doc_id joins for sizes)
    — no nested-loop pair enumeration anywhere — and the per-doc size
    table rides broadcast."""
    assert_plan(
        q("containment_partial_dup"),
        require_broadcast_joins=2,
        forbid_nested_loop=True,
    )


def test_hll_register_table_bounded_aggregates(q):
    # HLL: two shuffles total (register build keyed on (type, j), then
    # the per-type fold + exact-distinct side) — no joins wider than the
    # O(groups) estimate/exact tables, no cartesian.
    f = assert_plan(q("hll_distinct_audit"), forbid_nested_loop=True)
    assert f["cartesian_products"] == 0
    assert f["partial_aggs"] > 0  # map-side combine on the register key


def test_label_prop_rounds_broadcast_label_vector(q):
    # Every propagation round joins the O(nodes) label vector onto the
    # edge list as a broadcast — the edge list never re-shuffles per
    # round for the join itself.
    f = assert_plan(q("label_prop_communities"))
    assert f["broadcast_hash_joins"] >= 1, f["broadcast_hash_joins"]


def test_embedding_dim_stats_single_scan_dim_key(q):
    # posexplode -> one aggregate keyed on the 64-value dim; one exchange.
    f = assert_plan(q("embedding_dim_stats"), max_shuffles=1)
    assert f["partial_aggs"] > 0


def test_top_pc_rounds_are_dim_keyed_aggregates(q):
    # The returned loadings frame is a 64-row local relation (driver
    # holds O(dims) only); building it ran per-round (dim, sum)
    # aggregates — assert the query executes and yields exactly DIMS rows
    # without caching corpus-sized state on the driver.
    df = q("embedding_top_pc_power")
    assert df.count() == 64


def test_anisotropy_single_pass_broadcast_component(q):
    # Final audit pass: one scan of embeddings, zero joins (component is
    # a literal array), one aggregate.
    f = assert_plan(q("embedding_anisotropy"), max_shuffles=1)
    assert f["broadcast_hash_joins"] == 0


def test_jl_audit_pairs_confined_to_sample(q):
    # Projection is a per-row map; the only join is the sampled
    # self-pairing (range condition -> nested loop is expected and the
    # sample is hash-bounded); the corpus itself never joins.
    f = assert_plan(q("jl_projection_distortion"))
    assert f["cartesian_products"] == 0
    # the sample filter must reach the scan
    assert any("vec_id" in p for p in f["pushed_filters"]), f["pushed_filters"]


def test_kmv_sketch_rows_broadcast(q):
    # Merged-sketch membership flags join the O(groups x k) sketch as
    # broadcasts; rank windows are per-type partitioned (no global sort).
    f = assert_plan(q("kmv_set_ops"))
    assert f["broadcast_hash_joins"] >= 2, f["broadcast_hash_joins"]


def test_source_overlap_digest_equijoin_sizes_broadcast(q):
    # The self-join must be digest-keyed (equi), never a pair
    # enumeration; per-source sizes ride broadcast.
    assert_plan(
        q("source_overlap_matrix"),
        require_broadcast_joins=2,
        forbid_nested_loop=True,
    )


def test_split_leakage_component_split_never_leaks(q):
    # The broadcast of the component label vector sits behind the
    # localCheckpoint barrier (invisible to the final plan), so assert
    # the two properties that survive it: no cartesian in the audit
    # aggregation, and — the invariant the operator exists to enforce —
    # the component-hash split puts ZERO multi-doc components across a
    # split boundary while the naive doc-hash split does leak.
    df = q("split_leakage_audit")
    f = assert_plan(df)
    assert f["cartesian_products"] == 0
    row = df.collect()[0]
    assert row["component_leaky_components"] == 0
    assert row["n_train"] + row["n_val"] + row["n_test"] > 0


def test_blocked_er_equi_join_on_block_key(q):
    """Blocked entity resolution: the name-pair join must be an
    equi-join on the block key (candidate pairs bounded by block
    sizes), never a nested-loop over N^2 names; only the three needed
    customer columns leave the scan."""
    f = assert_plan(
        q("blocked_name_match_stats"),
        forbid_nested_loop=True,
        max_scan_columns=3,
    )
    assert f["sort_merge_joins"] + f["broadcast_hash_joins"] >= 1


def test_sorted_neighborhood_no_join_at_all(q):
    """Sorted-neighborhood ER is a window lead(), not a self-join:
    O(N*w) comparisons with exactly one shuffle (the block key)."""
    f = assert_plan(
        q("sorted_neighborhood_matches"),
        forbid_nested_loop=True,
        max_shuffles=2,
        max_scan_columns=3,
    )
    assert f["sort_merge_joins"] == 0 and f["broadcast_hash_joins"] == 0


def test_skew_audit_counters_only_single_column_scans(q):
    """The skew audit reads exactly one column per scanned table and
    shuffles only (key, count) counters — the audit of a 100 TB table
    must itself be 100 TB-safe."""
    f = assert_plan(
        q("join_key_skew_audit"),
        forbid_nested_loop=True,
        max_scan_columns=1,
    )
    assert f["partial_aggs"] > 0


def test_partition_balance_single_column_scans(q):
    assert_plan(
        q("partition_balance_audit"),
        forbid_nested_loop=True,
        max_scan_columns=1,
    )


def test_rrf_fusion_bounded_lists_topk(q):
    """RRF: the fused result re-cuts via TakeOrderedAndProject; the
    within-list ranking is a bounded broadcast theta-join over the
    20-row lists (allowed nested-loop — bounded by RRF_LIST_N, not by
    corpus size), and nothing plans as a cartesian product."""
    f = assert_plan(q("rrf_hybrid_topk"), require_top_k=True)
    assert f["cartesian_products"] == 0


def test_fertility_two_column_scan_one_shuffle(q):
    f = assert_plan(
        q("tokenizer_fertility_stats"),
        forbid_nested_loop=True,
        max_shuffles=2,
        max_scan_columns=2,
    )
    assert f["partial_aggs"] > 0


def test_threshold_sweep_pairs_source_blocked(spark, sf_dir):
    """The sensitivity sweep computes pairs ONCE at the loosest
    threshold through the same source-blocked equi-join as
    ngram_jaccard_similar_pairs — never a cartesian re-pairing per
    threshold. Asserted on the memo BUILDER's plan: the consumers see
    a checkpoint scan (r9 dedup.jaccard_pairs memo), so the join shape
    lives in the build path."""
    from sierradb_spark.functions.dedup import _build_jaccard_pairs_base

    f = assert_plan(
        _build_jaccard_pairs_base(spark, sf_dir),
        forbid_nested_loop=True,
    )
    assert f["sort_merge_joins"] + f["broadcast_hash_joins"] >= 1


def test_token_budget_totals_ride_broadcasts(q):
    """Both fold-back joins (corpus totals, leftover pool) are 1-row
    broadcasts over the source table — no shuffle of the allocation
    rows themselves."""
    f = assert_plan(q("token_budget_allocation"))
    assert f["nested_loop_joins"] <= 2  # the two 1-row broadcast folds


def test_lsh_cost_audit_digest_counters_only(q):
    """The join-cost audit is two aggregates over the band table —
    digests and counters shuffle, never text, never pairs."""
    f = assert_plan(q("lsh_join_cost_audit"), forbid_nested_loop=True)
    assert f["sort_merge_joins"] + f["broadcast_hash_joins"] == 0
    assert f["partial_aggs"] > 0


def test_cross_lingual_pairs_equi_joins(q):
    """Language attribution rides doc_id equi-joins onto the collision-
    scaled candidate list — no cartesian, no nested loop."""
    assert_plan(q("cross_lingual_template_pairs"), forbid_nested_loop=True)


def test_rfm_no_partitionless_window(q):
    """RFM scoring must stay window-free: thresholds fold to ONE
    broadcast row (nested-loop count 1 == that broadcast), assignment
    is a map — the ntile() shape would single-task at scale."""
    f = assert_plan(q("user_rfm_segments"))
    assert "Window" not in f["plan"], f["plan"][:1500]
    assert f["nested_loop_joins"] <= 1


def test_ivf_balance_broadcast_centroids(q):
    """Cell assignment is a broadcast map (centroid literals), the
    histogram is (cell_id, count) rows, and the share/load fold is a
    1-row broadcast — nothing corpus-sized shuffles."""
    f = assert_plan(q("ivf_cell_balance_audit"))
    assert "Window" not in f["plan"], f["plan"][:1500]
    assert f["nested_loop_joins"] <= 1


def test_multitouch_pairing_is_user_equi_join(q):
    """The conversion-touch pairing must ride a user equi-join with the
    time band as a post-condition — per-user work only, never a
    time-theta nested loop over all users."""
    f = assert_plan(q("multitouch_attribution"), forbid_nested_loop=True)
    assert "Window" not in f["plan"], f["plan"][:1500]


def test_sorted_neighborhood_subset_of_blocked(q):
    """Containment property: every sorted-neighborhood match is a
    blocked match (SN compares a subset of each block's pairs), so per
    nation n_matched(SN) <= n_pairs(blocked)."""
    blocked = {r["nationkey"]: r["n_pairs"] for r in q("blocked_name_match_stats").collect()}
    for r in q("sorted_neighborhood_matches").collect():
        assert r["n_matched"] <= blocked.get(r["nationkey"], 0) or r["n_matched"] == 0


def test_holt_fold_no_windows_bounded_state(q):
    """The Holt recurrence is a per-key sequential fold: no window
    functions, no joins — one daily aggregate and one groupBy whose
    rows carry a day-bounded array, never event-bounded."""
    f = assert_plan(q("holt_linear_forecast"), forbid_nested_loop=True)
    assert "Window" not in f["plan"], f["plan"][:1500]
    assert f["sort_merge_joins"] + f["broadcast_hash_joins"] == 0


def test_ewma_fold_no_windows_bounded_state(q):
    """Like Holt: the EWMA anomaly recurrence is a per-key fold — no
    window functions, no joins; state is 4 doubles per type."""
    f = assert_plan(q("ewma_anomaly_daily"), forbid_nested_loop=True)
    assert "Window" not in f["plan"], f["plan"][:1500]
    assert f["sort_merge_joins"] + f["broadcast_hash_joins"] == 0


def test_seasonal_decompose_windows_are_partitioned(q):
    """Both windows (trend MA, seasonal centering) are type-partitioned
    and the seasonal join is a broadcast of |types|x7 rows."""
    f = assert_plan(q("weekly_seasonal_decompose"))
    assert f["broadcast_hash_joins"] >= 1
    # every Window node carries an explicit partition spec
    import re as _re

    for m in _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f["plan"]):
        assert m.strip(), "unpartitioned (global) window in plan"


def test_burst_detection_grid_broadcast(q):
    """The dense hour grid joins back to hourly counts broadcast-side;
    the trailing-average window is type-partitioned."""
    f = assert_plan(q("hourly_burst_detection"))
    assert f["broadcast_hash_joins"] >= 1
    assert "RowFrame, -24, -1" in f["plan"], f["plan"][:1500]


def test_interarrival_single_exchange(q):
    """lag window and the per-type aggregate share hash(event_type):
    one exchange total."""
    assert_plan(q("interarrival_time_stats"), max_shuffles=1)


def test_two_hop_equi_join_topk(q):
    assert_plan(
        q("two_hop_reach_topk"), forbid_nested_loop=True, require_top_k=True
    )


def test_local_clustering_equi_joins_only(q):
    f = assert_plan(q("local_clustering_histogram"))
    assert f["nested_loop_joins"] == 0


def test_pmi_totals_broadcast_topk(q):
    """The two corpus totals are 1-row broadcasts (nested-loop count
    <= 2 == those); the ranking is TakeOrderedAndProject."""
    f = assert_plan(q("pmi_collocations"), require_top_k=True)
    assert f["nested_loop_joins"] <= 2


def test_gemm_topk_is_arrow_batched(q):
    """The numpy scorer must plan as one Arrow-batched python stage and
    a global top-k — not a per-row UDF, not a global sort."""
    f = assert_plan(q("gemm_topk_cosine"), require_top_k=True)
    assert "MapInPandas" in f["plan"] or "mapInPandas" in f["plan"]
    assert "BatchEvalPython" not in f["plan"]  # row-at-a-time UDF path


def test_rake_run_window_is_doc_partitioned(q):
    """The gaps-and-islands window partitions by doc_id; phrase scoring
    folds an ordered array (no float-order nondeterminism)."""
    f = assert_plan(q("rake_keyphrases"), require_top_k=True)
    import re as _re

    for m in _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f["plan"]):
        assert m.strip(), "unpartitioned (global) window in plan"


def test_quality_calibration_boundaries_broadcast(q):
    """Decile boundaries are a 1-row broadcast; the dup flag rides an
    equi-join on doc_id — no ntile, no global window."""
    f = assert_plan(q("quality_dup_calibration"))
    assert "Window" not in f["plan"], f["plan"][:1500]
    assert f["nested_loop_joins"] <= 1


def test_markov_iteration_state_is_broadcast(q):
    """Every power-iteration step joins the O(|types|) state broadcast-
    side against the transition matrix; the final plan must not contain
    a sort-merge join anywhere in the chain."""
    f = assert_plan(q("markov_stationary_distribution"))
    assert f["sort_merge_joins"] == 0, f["plan"][:2000]


def test_basket_rules_equi_pair_join_topk(q):
    """Pair candidates come from the basket-keyed equi self-join (never
    a cartesian over parts); only (orderkey, partkey) are scanned; the
    one allowed nested loop is the 1-row n_orders broadcast; top-k by
    lift plans as TakeOrderedAndProject."""
    f = assert_plan(
        q("basket_association_rules"),
        require_top_k=True,
        max_scan_columns=2,
    )
    assert f["nested_loop_joins"] <= 1, f["plan"][:1500]


def test_hard_negative_mining_broadcast_queries(q):
    """The query batch is THE broadcast side (exactly one nested loop,
    carrying the label-mismatch predicate); the per-query top-k window
    is q_id-partitioned, never global."""
    import re as _re

    f = assert_plan(q("hard_negative_mining"))
    assert f["nested_loop_joins"] == 1, f["plan"][:1500]
    for m in _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f["plan"]):
        assert m.strip(), "unpartitioned (global) window in plan"


def test_conditional_entropy_user_partitioned_window(q):
    """The lead() window partitions by user_id; everything after the
    pair aggregate is |types|-sized."""
    import re as _re

    f = assert_plan(q("event_conditional_entropy"), forbid_nested_loop=True)
    wins = _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f["plan"])
    assert wins and all("user_id" in m for m in wins), f["plan"][:1500]


def test_vocab_coverage_no_window_tiny_nested_loops(q):
    """The coverage curve must NOT use a ranked global window: word
    counts fold to the count-of-counts histogram and the cumulative is
    a nested-loop join over that tiny aggregate (plus the 1-row totals
    broadcast) — at most two nested loops, zero windows, text-only scan."""
    f = assert_plan(q("vocab_coverage_curve"), max_scan_columns=1)
    assert "Window" not in f["plan"], f["plan"][:1500]
    assert f["nested_loop_joins"] <= 2, f["plan"][:1500]


def test_kcenter_argmax_rounds_no_joins(q):
    """Every greedy round reduces a single scan of the pinned
    (id, emb, vv, mind) state against ONE literal new-center distance
    (r11: the running min rides a per-round checkpoint instead of
    re-evaluating all j center folds) — no join of any kind, no window;
    driver traffic is O(k)."""
    f = assert_plan(q("kcenter_coreset_selection"), forbid_nested_loop=True)
    assert f["sort_merge_joins"] == 0 and f["broadcast_hash_joins"] == 0
    assert "Window" not in f["plan"], f["plan"][:1500]


def test_changepoint_windows_type_partitioned(q):
    """All prefix-sum/argmin windows partition by event_type; nothing
    joins (totals are last_value over the ordered frame, not a
    separate aggregate)."""
    import re as _re

    f = assert_plan(q("changepoint_binary_segmentation"), forbid_nested_loop=True)
    assert f["sort_merge_joins"] == 0 and f["broadcast_hash_joins"] == 0
    wins = _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f["plan"])
    assert wins and all("event_type" in m for m in wins), f["plan"][:1500]


def test_mmr_pool_is_distributed_topk(q):
    """The MMR candidate pool comes from one distributed top-k scan
    (TakeOrderedAndProject appears in the pool job); the greedy itself
    is O(pool^2) driver work, so the returned plan is a local scan with
    no joins, shuffles, or windows."""
    from sierradb_spark.plans import plan_features

    f = plan_features(q("mmr_diverse_rerank"))
    assert f["exchanges"] == 0 and f["sort_merge_joins"] == 0
    assert "Window" not in f["plan"]


def test_ks_drift_no_global_window(q):
    """CDFs run under type-partitioned windows; the global CDF is the
    sum of per-type cumulatives, so no unpartitioned window exists."""
    import re as _re

    f = assert_plan(q("ks_drift_by_event_type"))
    wins = _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f["plan"])
    assert wins and all("event_type" in m for m in wins), f["plan"][:1500]
    # the 1-row min/max bounds broadcast (planned twice: the cum subtree
    # feeds both the scored side and the global-CDF aggregate)
    assert f["nested_loop_joins"] <= 2


def test_kaplan_meier_no_global_window(q):
    """Sessionization windows are user-partitioned; the KM cumulative
    (risk set + log-survival product) rides nested-loop joins over the
    tiny duration histogram plus the 1-row horizon broadcast — no
    unpartitioned window anywhere."""
    import re as _re

    f = assert_plan(q("kaplan_meier_retention"))
    for m in _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f["plan"]):
        assert "user_id" in m, f["plan"][:1500]


def test_benford_single_scan_tiny_broadcast(q):
    """One lineitem scan of one column, a 9-row digit aggregate, and a
    1-row total broadcast — nothing else."""
    f = assert_plan(q("benford_law_audit"), max_scan_columns=1)
    assert f["nested_loop_joins"] <= 1 and "Window" not in f["plan"]


def test_kcore_peels_are_equi_semi_joins(q):
    """Every peeling round is a degree aggregate + two semi-joins on
    node ids; a nested-loop/cartesian here is the N^2 failure mode."""
    assert_plan(q("kcore_near_dup"), forbid_nested_loop=True)


def test_bootstrap_fanout_is_map_side(q):
    """The x64 replicate fan-out happens map-side (explode before the
    (type, replicate) partial aggregate); the ranking window is
    type-partitioned; the obs-side join is an equi hash join."""
    import re as _re

    f = assert_plan(q("poisson_bootstrap_ci"), forbid_nested_loop=True)
    assert f["partial_aggs"] >= 1
    for m in _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f["plan"]):
        assert "event_type" in m, f["plan"][:1500]


def test_ab_test_single_fold(q):
    """One 4-counter aggregate over a 2-column scan — no joins, no
    windows, no shuffle beyond the single-row final agg."""
    f = assert_plan(q("ab_test_proportions"), forbid_nested_loop=True, max_scan_columns=2)
    assert "Window" not in f["plan"]
    assert f["broadcast_hash_joins"] == 0 and f["sort_merge_joins"] == 0


def test_oof_encoding_single_pass_equi_join(q):
    """One (type, fold) partial aggregate and one |types|-row equi join
    — no windows, no nested loops."""
    f = assert_plan(q("target_encoding_oof"), forbid_nested_loop=True)
    assert "Window" not in f["plan"] and f["partial_aggs"] >= 1


def test_order_stat_windows_type_partitioned(q):
    """Rank/count windows for the median CI and the robust means are
    type-partitioned — never global."""
    import re as _re

    for name in ("median_ci_order_stat", "trimmed_winsorized_stats"):
        f = assert_plan(q(name), forbid_nested_loop=True)
        wins = _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f["plan"])
        assert wins and all("event_type" in m for m in wins), (
            name,
            f["plan"][:1200],
        )


def test_shapley_coalition_table_broadcast(q):
    """Everything after the per-user mask fold runs over 16-row
    coalition tables: the containment/term joins are broadcast (no
    sort-merge, no cartesian)."""
    f = assert_plan(q("shapley_channel_attribution"))
    assert f["sort_merge_joins"] == 0, f["plan"][:1500]


def test_gini_mad_windows_type_partitioned(q):
    import re as _re

    for name in ("value_concentration_gini", "mad_robust_outliers"):
        f = assert_plan(q(name), forbid_nested_loop=True)
        wins = _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f["plan"])
        assert wins and all("event_type" in m for m in wins), (
            name,
            f["plan"][:1200],
        )


def test_holt_winters_is_fold_no_window(q):
    """Like holt_linear: one daily aggregate then a bounded per-key
    sequential fold — no window functions at all."""
    f = assert_plan(q("holt_winters_forecast"), forbid_nested_loop=True)
    assert "Window" not in f["plan"], f["plan"][:1200]


def test_psi_tiny_grid_equi_joins(q):
    """After the (type,bin,half) count everything is O(types x bins):
    equi joins only, the one nested loop is the 1-row bounds broadcast
    (planned once per subtree reuse)."""
    f = assert_plan(q("psi_value_drift"))
    assert f["nested_loop_joins"] <= 2 and "Window" not in f["plan"]


def test_theil_sen_pairs_per_type_equi(q):
    """The slope pair join is an equi join on event_type over the DAILY
    aggregate (days^2 pairs per type, bounded by corpus age); rank
    windows are type-partitioned."""
    import re as _re

    f = assert_plan(q("theil_sen_trend"), forbid_nested_loop=True)
    wins = _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f["plan"])
    assert wins and all("event_type" in m for m in wins), f["plan"][:1200]


def test_empirical_bayes_two_aggregates(q):
    """Per-user and per-type moment folds plus |users|-row equi joins —
    partial aggregation map-side, no windows, no nested loops."""
    f = assert_plan(q("empirical_bayes_user_means"), forbid_nested_loop=True)
    assert f["partial_aggs"] >= 1 and "Window" not in f["plan"]


def test_time_to_convert_no_global_window(q):
    """Percentiles come from the minutes-histogram cumulative via the
    r10 two-level prefix sum (registry.bucketed_cumulative) — every
    window PARTITIONED by the quantile bucket, never global, and the
    only nested loops are the broadcast B-row/1-row sides. (Pre-r10
    this was a windowless broadcast range join — quadratic in distinct
    latency minutes, ~10^12 comparisons on a multi-year corpus.)"""
    import re as _re

    f = assert_plan(q("time_to_convert_stats"))
    wins = _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f["plan"])
    assert wins and all("__sdb_b#" in m for m in wins), f["plan"][:1200]
    # bounds crossJoin appears once per reference to the bucketed
    # relation (3x textual) + the B-row cum + 2 one-row totals; the
    # repeated subtrees collapse at runtime via ReuseExchange
    # (verified: 6 ReusedExchange nodes in the executed plan).
    assert f["nested_loop_joins"] <= 6


def test_ab_power_two_counter_fold(q):
    f = assert_plan(q("ab_test_power"), max_scan_columns=1)
    assert "Window" not in f["plan"]


def test_assortativity_equi_degree_joins(q):
    """Degree joins back by node id as hash joins; corr folds map-side."""
    f = assert_plan(q("degree_assortativity"), forbid_nested_loop=True)
    assert f["partial_aggs"] >= 1


def test_band_calibration_equi_band_join(q):
    """Agreement pairs come from the band equi-join; exact jaccard only
    touches colliding pairs via doc_id equi joins — never a
    nested-loop over the corpus."""
    assert_plan(q("band_agreement_calibration"), forbid_nested_loop=True)


def test_lsh_planner_is_pure_arithmetic(q):
    """Literal grids only: no file scan in the plan at all."""
    f = assert_plan(q("lsh_parameter_planner"))
    assert "FileScan" not in f["plan"], f["plan"][:800]


def test_overdispersion_anova_single_pass(q):
    """Both count-model diagnostics fold from grouped aggregates with
    map-side partials — no windows, no joins beyond the moment folds."""
    for name in ("overdispersion_index", "dow_anova_ftest"):
        f = assert_plan(q(name), forbid_nested_loop=True)
        assert "Window" not in f["plan"] and f["partial_aggs"] >= 1, name


def test_nonparametric_ranks_type_partitioned(q):
    import re as _re

    for name in ("mann_whitney_u_test", "spearman_rank_correlation"):
        f = assert_plan(q(name), forbid_nested_loop=True)
        wins = _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f["plan"])
        assert wins and all("event_type" in m for m in wins), (
            name,
            f["plan"][:1200],
        )


def test_cramers_v_broadcast_marginals(q):
    """Contingency cells join broadcast marginals; no windows."""
    f = assert_plan(q("cramers_v_association"))
    assert "Window" not in f["plan"] and f["sort_merge_joins"] == 0


def test_cohort_matrix_cumulative_on_aggregate(q):
    """The LTV cumulative is a broadcast join over the (cohorts x ages)
    aggregate — no window touches row-scaled data."""
    f = assert_plan(q("cohort_value_matrix"))
    assert "Window" not in f["plan"], f["plan"][:1200]


def test_skyline_dominance_on_dates_aggregate(q):
    """Dominance testing runs on the per-date aggregate (broadcast
    anti-join); order rows rejoin by equi-key — no cartesian over
    orders."""
    f = assert_plan(q("pareto_skyline_orders"), max_scan_columns=3)
    assert f["cartesian_products"] == 0


def test_expected_steps_broadcast_iteration(q):
    """The value iteration runs driver-side over the collected
    O(|types|^2) pair table (r11, the markov discipline); the only
    distributed work is the one events pass, so no sort-merge join can
    appear anywhere in the chain."""
    f = assert_plan(q("expected_steps_to_purchase"))
    assert f["sort_merge_joins"] == 0, f["plan"][:1500]


def test_streak_bounce_user_partitioned(q):
    import re as _re

    for name in ("longest_activity_streak", "session_bounce_stats"):
        f = assert_plan(q(name), forbid_nested_loop=True)
        wins = _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f["plan"])
        assert wins and all("user_id" in m for m in wins), (
            name,
            f["plan"][:1200],
        )


def test_waste_curve_shard_partitioned_prefix(q):
    """The cum table reuses the shard-partitioned prefix (no
    unpartitioned window); the ctx grid is a tiny broadcast."""
    import re as _re

    f = assert_plan(q("packing_waste_curve"))
    for m in _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f["plan"]):
        assert m.strip(), "unpartitioned window in waste curve"


def test_label_margin_broadcast_centroids(q):
    """Centroids broadcast (|labels| rows); corpus scanned twice
    (centroid partial agg + scoring), never joined to itself."""
    f = assert_plan(q("embedding_label_margin"))
    assert f["sort_merge_joins"] == 0 and f["partial_aggs"] >= 1


def test_wilson_ci_single_count_fold(q):
    f = assert_plan(q("event_mix_wilson_ci"), max_scan_columns=1)
    assert "Window" not in f["plan"] and f["nested_loop_joins"] <= 1


def test_daily_bands_partitioned_welch_fold(q):
    import re as _re

    f = assert_plan(q("daily_value_bands"), forbid_nested_loop=True)
    wins = _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f["plan"])
    assert wins and all("event_type" in m for m in wins)
    f2 = assert_plan(q("weekend_lift_welch_t"), forbid_nested_loop=True)
    assert "Window" not in f2["plan"] and f2["partial_aggs"] >= 1


def test_interpurchase_pareto_windowless_quantiles(q):
    """interpurchase uses the histogram-cumulative broadcast-join
    quantile over the BOUNDED day-gap histogram (no global window);
    the lag window is customer-partitioned. revenue_concentration's
    histogram is UNBOUNDED (near-one-row-per-customer), so r10 moved
    it to the two-level prefix sum: its windows must exist but be
    PARTITIONED by the quantile bucket — never global — and the only
    nested-loop joins are the broadcast one-row/B-row sides."""
    import re as _re

    f = assert_plan(q("interpurchase_time_stats"))
    wins = _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f["plan"])
    assert wins and all("o_custkey" in m for m in wins)
    f2 = assert_plan(q("revenue_concentration_8020"), max_scan_columns=2)
    wins2 = _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", f2["plan"])
    assert wins2 and all("b#" in m for m in wins2), f2["plan"][:1200]


def test_bucketed_cumulative_callers_satisfy_key_contract(q, spark):
    """r11 (VERDICT item 3): both production callers of
    registry.bucketed_cumulative feed it key-aggregated, non-null keys.
    Executing them under the debug key check validates that on real
    data — a future caller (or an upstream edit) that breaks the UNIQUE
    + NON-NULL contract turns this red via the check's ValueError."""
    spark.conf.set("spark.sierradb.debug.checkCumulativeKeys", "true")
    try:
        assert q("revenue_concentration_8020").limit(1).count() >= 0
        assert q("time_to_convert_stats").limit(1).count() >= 0
    finally:
        spark.conf.set("spark.sierradb.debug.checkCumulativeKeys", "false")


def test_expected_steps_round9_matches_spark_half_up(q, spark):
    """r11 (driver-side value iteration): the per-round HALF_UP
    round(_, 9) moved to the driver; _round9 must agree with Spark's
    round(col, 9) bit-for-bit — including exact .5e-9 decimal ties,
    where Python's builtin half-even round() diverges."""
    import random

    from sierradb_spark.operators.event_analytics import _round9

    rng = random.Random(9)
    vals = [1.0000000005, 2.0000000015, 0.0000000005, 3.1415926535,
            1.9999999995, 7.0000000025]
    vals += [rng.uniform(0.0, 20.0) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    from pyspark.sql import functions as F

    got = [r[0] for r in df.select(F.round("x", 9)).collect()]
    want = [_round9(v) for v in vals]
    assert got == want


def test_kcenter_releases_every_checkpoint_generation(q, spark):
    """r11 (incremental farthest-point traversal): each greedy round
    pins (id, emb, vv, mind) behind a lazy localCheckpoint; every
    generation — including the last, after the eager cover scan — must
    be released deterministically, so a completed query leaves the
    block store where it found it."""
    sc = spark.sparkContext

    def cached_ids() -> set:
        infos = sc._jsc.sc().getRDDStorageInfo()
        return {infos[i].id() for i in range(len(infos))}

    # Compare block-store IDs, not a global count: the ContextCleaner
    # reaps OTHER tests' dead blocks asynchronously, so an equality on
    # the count is order-dependent in a full-suite run (observed: count
    # dropped 15 -> 13 mid-test). A leak is precisely "a block id that
    # did not exist before and survives the query".
    before = cached_ids()
    assert q("kcenter_coreset_selection").collect()
    leaked = cached_ids() - before
    assert not leaked, f"kcenter left pinned checkpoint blocks: {leaked}"
