"""The end-to-end pipeline example must run and preserve its funnel
invariants (each stage only removes rows; export is complete + sharded)."""

from __future__ import annotations

import os


def test_pretrain_pipeline_end_to_end(spark, sf_dir, tmp_path):
    from examples.pretrain_pipeline import run_pipeline

    out = str(tmp_path / "corpus")
    funnel = run_pipeline(spark, sf_dir, out)
    # '#'-prefixed keys are informational (e.g. downweighted-hub counts),
    # not funnel stages — only stage counts must shrink monotonically.
    ns = [v for k, v in funnel.items() if not k.startswith("#")]
    assert ns[0] > 0
    assert all(a >= b for a, b in zip(ns, ns[1:])), funnel  # monotone funnel
    assert ns[-1] > 0
    got = spark.read.parquet(out)
    assert got.count() == ns[-1]
    shards = {r["shard"] for r in got.select("shard").distinct().collect()}
    assert shards <= set(range(8)) and len(shards) > 1


def test_validate_invariants_healthy_store(spark, tmp_path):
    """The invariant checker (examples/validate_invariants.py — the
    validate_partition_sequences.rs analogue) reports zero problems on a
    healthy store and detects a forged heads-log divergence."""
    from examples.validate_invariants import validate
    from sierradb_spark.config import EngineConfig
    from sierradb_spark.eventstore import AppendRequest, EventStore

    store = EventStore(
        spark, str(tmp_path / "vs"), EngineConfig(shuffle_partitions=8)
    )
    for b in range(2):
        store.append([AppendRequest(f"v-{i % 4}", f"E{b}") for i in range(12)])
    store.compact()
    store.append([AppendRequest("v-0", "tail")])
    problems = validate(store)
    assert problems == {k: 0 for k in problems}, problems
