"""Bucketed co-located joins: the shuffle-free fact-fact join strategy.

At 100 TB the one join that cannot broadcast is fact-to-fact
(lineitem x orders). Pre-bucketing both tables on the join key makes
that join exchange-free forever after: each bucket pair joins locally
(the Spark analogue of the reference's partition-aligned storage, where
a partition's events and indexes live together by construction,
bucket.rs:57-83). This test pins the contract: bucketed tables of the
same bucket count join with ZERO Exchange operators in the plan.
"""

from __future__ import annotations

import pytest

from sierradb_spark.plans import plan_features


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        li.write.mode("overwrite")
        .option("path", str(wh / "li"))  # external table: keep data in tmp
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.mode("overwrite")
        .option("path", str(wh / "o"))
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("o_bucketed")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_no_exchange(bucketed):
    spark = bucketed
    # disable broadcast so the join strategy is decided by bucketing,
    # as it would be for two 50 TB fact tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.sql(
            """
            SELECT o.o_orderkey, count(*) AS n, round(sum(l.l_extendedprice), 2) AS rev
            FROM li_bucketed l JOIN o_bucketed o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey
            """
        )
        f = plan_features(joined)
        # sort-merge join over aligned buckets: no shuffle for the join;
        # the groupBy on the same key rides the bucket partitioning too
        assert f["sort_merge_joins"] == 1
        assert f["exchanges"] == 0, f["plan"][:1500]
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_same_join_shuffles(bucketed, sf_dir):
    """Control: the identical join over raw parquet DOES shuffle — the
    difference is precisely what bucketing buys at scale."""
    spark = bucketed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderkey").count()
        f = plan_features(joined)
        assert f["exchanges"] >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_regroup_other_key_single_exchange(bucketed):
    """Aggregating the bucket-joined result on a DIFFERENT key pays
    exactly one exchange (the re-keyed agg) — the join itself still
    rides the buckets."""
    spark = bucketed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.sql(
            """
            SELECT o.o_orderpriority, count(*) AS n,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS rev
            FROM li_bucketed l JOIN o_bucketed o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority
            """
        )
        f = plan_features(joined)
        assert f["sort_merge_joins"] == 1
        assert f["exchanges"] <= 1, f["plan"][:1500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_values_match_unbucketed(bucketed, sf_dir):
    """The zero-exchange plan is the SAME computation: value parity
    between the bucketed and plain-parquet join. Counts compare
    exactly; the double sums compare with a tolerance because the two
    plans accumulate partitions in different orders."""
    spark = bucketed
    got = {
        r["o_orderpriority"]: (r["n"], r["rev"])
        for r in spark.sql(
            """
            SELECT o.o_orderpriority, count(*) AS n,
                   sum(l.l_extendedprice) AS rev
            FROM li_bucketed l JOIN o_bucketed o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority
            """
        ).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    from pyspark.sql import functions as F

    want = {
        r["o_orderpriority"]: (r["n"], r["rev"])
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_extendedprice").alias("rev"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k, (n, rev) in got.items():
        assert n == want[k][0]
        assert abs(rev - want[k][1]) < 1e-6 * max(abs(rev), 1.0)
