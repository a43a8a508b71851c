"""Bucketed-table co-located joins: the shuffle-free join evidence.

At 100 TB the biggest single lever on a repeated fact-fact join is not
running the shuffle at all: write both tables bucketed (and sorted) by
the join key, and Spark's scan reports a compatible HashPartitioning,
so EnsureRequirements inserts ZERO exchanges — the join runs
bucket-against-bucket. These tests materialize bucketed copies of
orders/lineitem (tiny at the test sf) and assert the property on the
actual physical plan, plus the negative control: the same join over
plain parquet DOES shuffle both sides.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sierradb_spark.plans import plan_features
from sierradb_spark.registry import load

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    (
        load(spark, sf_dir, "orders")
        .write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable("bkt_orders")
    )
    (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable("bkt_lineitem")
    )
    yield spark.table("bkt_lineitem"), spark.table("bkt_orders")


def _join(li, orders):
    # A disable-broadcast join so the test exercises the shuffle path,
    # not a broadcast that would hide it at test scale.
    return (
        li.hint("merge")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev"
            ),
        )
    )


def test_bucketed_join_runs_without_exchange(spark, bucketed):
    li, orders = bucketed
    f = plan_features(_join(li, orders))
    # The join itself must be exchange-free: both scans report bucketed
    # HashPartitioning(orderkey, 8). The single allowed exchange is the
    # groupBy on o_orderpriority AFTER the join.
    assert f["sort_merge_joins"] >= 1, f["plan"][:1500]
    assert f["exchanges"] <= 1, f["plan"][:2500]
    assert "SortMergeJoin" in f["plan"]


def test_unbucketed_control_shuffles_both_sides(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load(spark, sf_dir, "orders")
    f = plan_features(_join(li, orders))
    # Negative control: plain parquet has no reported partitioning, so
    # the same join shuffles both inputs (2 exchanges) plus the agg.
    assert f["exchanges"] >= 3, f["plan"][:2500]


def test_bucketed_scan_sorted_within_buckets(spark, bucketed):
    li, orders = bucketed
    f = plan_features(
        li.hint("merge").join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
    )
    # sortBy at write time means the SMJ needs no extra global sort
    # shuffle — only (at most) a local sort per bucket; still no
    # exchange anywhere in the join subtree.
    assert f["exchanges"] == 0, f["plan"][:2500]


def test_bucketed_values_match_unbucketed(spark, sf_dir, bucketed):
    li, orders = bucketed
    plain = _join(
        load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        load(spark, sf_dir, "orders"),
    )
    got = {
        r["o_orderpriority"]: (r["n"], round(r["rev"], 2))
        for r in _join(li, orders).collect()
    }
    want = {
        r["o_orderpriority"]: (r["n"], round(r["rev"], 2))
        for r in plain.collect()
    }
    assert got == want
