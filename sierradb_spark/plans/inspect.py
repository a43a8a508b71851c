"""Physical-plan inspection — the plan-quality contract, testable.

The reference has no optimizer (SURVEY §4.1): its "plans" are fixed
index-arithmetic paths. On Spark the equivalent guarantee is that
Catalyst actually produces the shapes we designed for — filters pushed
to the scan, dimensions broadcast, no accidental cartesian products,
top-k never becoming a global sort. This module turns those properties
into assertions so a regression (e.g. a join condition that silently
degrades to BroadcastNestedLoopJoin) fails a test instead of an SLO.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_features(df: DataFrame) -> dict:
    """Summarize the executed (AQE-initial) physical plan."""
    # default maxMetadataStringLength=100 truncates PushedFilters lists
    # mid-bracket, which would make pushdown checks silently pass/fail
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    pushed = [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m]
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian_products": plan.count("CartesianProduct"),
        "exchanges": plan.count("Exchange"),
        "top_k": plan.count("TakeOrderedAndProject"),
        "partial_aggs": plan.count("partial_"),
        "pushed_filters": pushed,
        "scan_columns": [
            [c.split(":")[0] for c in s.split(",") if c] for s in read_schemas
        ],
        "plan": plan,
    }


def assert_plan(
    df: DataFrame,
    max_shuffles: int | None = None,
    require_broadcast_joins: int | None = None,
    forbid_cartesian: bool = True,
    forbid_nested_loop: bool = False,
    require_pushed_filter: str | None = None,
    require_top_k: bool = False,
    max_scan_columns: int | None = None,
) -> dict:
    """Assert plan-shape properties; returns the feature dict for chaining."""
    f = plan_features(df)
    if forbid_cartesian:
        assert f["cartesian_products"] == 0, "cartesian product in plan"
    if forbid_nested_loop:
        assert f["nested_loop_joins"] == 0, "nested-loop join in plan"
    if max_shuffles is not None:
        assert f["exchanges"] <= max_shuffles, (
            f"{f['exchanges']} exchanges > {max_shuffles}\n{f['plan'][:2000]}"
        )
    if require_broadcast_joins is not None:
        assert f["broadcast_hash_joins"] >= require_broadcast_joins, (
            f"wanted >= {require_broadcast_joins} broadcast joins, "
            f"got {f['broadcast_hash_joins']}"
        )
    if require_pushed_filter is not None:
        assert any(
            require_pushed_filter in p for p in f["pushed_filters"]
        ), f"filter {require_pushed_filter!r} not pushed: {f['pushed_filters']}"
    if require_top_k:
        assert f["top_k"] >= 1, "top-k did not plan as TakeOrderedAndProject"
    if max_scan_columns is not None:
        widest = max((len(s) for s in f["scan_columns"]), default=0)
        assert widest <= max_scan_columns, (
            f"scan reads {widest} columns > {max_scan_columns} "
            f"(column pruning failed): {f['scan_columns']}"
        )
    return f
