"""Quality claims of the round-4 quantization and graph operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from sierradb_spark.operators import REGISTRY


def test_sq8_quantization_preserves_topk(spark, sf_dir):
    """The docstring's claim: 8-bit scalar quantization loses nothing of
    the exact cosine top-10 on this corpus, and reconstruction error is
    bounded by half a quantization step."""
    row = REGISTRY.queries["sq8_quantized_recall"].spark(spark, sf_dir).collect()[0]
    assert row["n_dims"] == 64
    assert row["overlap_at_10"] == 10
    # Embeddings are unit-ish floats; a 254-level grid over their range
    # keeps the mean |error| far below one part in a hundred.
    assert 0 < row["mean_abs_err"] < 0.01


def test_pagerank_conserves_rank_and_flags_hubs(spark, sf_dir):
    """No dangling nodes in the undirected candidate graph => total rank
    must stay 1; the highest-rank node must be a max-degree hub."""
    df = REGISTRY.queries["pagerank_near_dup"].spark(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0  # the corpus plants near-dup clusters
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 1e-3, f"rank mass leaked: sum={total}"
    # PageRank is strictly positive under damping on every reachable node.
    assert all(r["pagerank"] > 0 for r in rows)
    # Near-dup clusters are CLIQUES (every pair collides), and on a
    # disjoint union of complete components the uniform vector is the
    # exact damped fixpoint: r(v) = 0.15/N + 0.85*k*(1/(Nk)) = 1/N.
    # So uniform ranks here are correctness, not a bug — assert it.
    n = len(rows)
    assert all(abs(r["pagerank"] - 1.0 / n) < 1e-4 for r in rows)


def test_pagerank_edges_are_equi_join_plan(spark, sf_dir):
    """The candidate edges must come from the LSH band equi-join —
    no cartesian product anywhere in the plan."""
    df = REGISTRY.queries["pagerank_near_dup"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_round4_op_plan_shapes(spark, sf_dir):
    """100 TB plan contracts of the round-4 operators: fingerprint pair
    generation and chunk indexing plan no cartesian product; SQ8's dim
    stats come back via broadcast; k-means assignment is map-only over
    broadcast-literal centroids (the corpus side never shuffles by key
    and, since r10, never joins at all)."""
    from sierradb_spark.operators import REGISTRY
    from sierradb_spark.plans import assert_plan, plan_features

    assert_plan(REGISTRY.queries["winnow_near_dup_pairs"].spark(spark, sf_dir))
    assert_plan(REGISTRY.queries["doc_chunk_index"].spark(spark, sf_dir))
    assert_plan(REGISTRY.queries["tfidf_top_terms"].spark(spark, sf_dir))
    f = assert_plan(
        REGISTRY.queries["sq8_quantized_recall"].spark(spark, sf_dir),
        forbid_cartesian=False,  # 1-row aggregate combiners + query vector
        require_broadcast_joins=2,  # dim stats + dequantized query side
    )
    # The intentional cross joins all pair with 1-row/broadcast sides.
    kf = plan_features(
        REGISTRY.queries["kmeans_embedding_clusters"].spark(spark, sf_dir)
    )
    # r10: assignment is MAP-ONLY (broadcast-literal centroids folded
    # with array_min inside one projection) — the plan must contain NO
    # join of any kind; the old contract (a broadcast centroid join)
    # was the pre-r10 shape and still shuffled V x K through a window.
    assert kf["broadcast_hash_joins"] + kf["nested_loop_joins"] == 0
    assert kf["cartesian_products"] == 0
