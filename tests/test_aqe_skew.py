"""AQE skew-join handling: the runtime answer to hot keys, asserted.

docs/SCALE.md prescribes two answers to join-key skew at 100 TB:
explicit salting (the salted_event_type_stats query) and AQE's
OptimizeSkewedJoin, which splits oversized shuffle partitions at
runtime. These tests prove the second one actually engages on this
session's configuration — and pin the one shape where it DOESN'T:
when a downstream aggregate rides the join stage, Spark declines the
split unless ``forceOptimizeSkewedJoin`` is set, which is exactly why
the join-key skew audit (operators/audits.py) and explicit salting
remain first-class even with AQE on.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

_SKEW_CONFS = {
    # thresholds scaled down so a ~100 KB test partition counts as
    # "skewed"; at production scale the defaults (256 MB) do this job.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}

_N = 60_000


@pytest.fixture()
def skew_confs(spark):
    prev = {}
    for k, v in _SKEW_CONFS.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_join(spark):
    # key 0 carries over half the fact rows (a classic hot key), payload
    # padded so the hot partition crosses the lowered byte threshold.
    fact = spark.range(_N).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.col("id") % 97)
        .alias("k"),
        F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
    )
    dim = spark.range(97).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    return fact.join(dim, "k")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_skewed_join_partition(skew_confs):
    j = _skewed_join(skew_confs)
    rows = j.collect()  # force execution of THIS dataframe's plan
    assert len(rows) == _N
    plan = _executed_plan(j)
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin(skew=true)" in plan, plan[:2500]
    assert "AQEShuffleRead skewed" in plan, plan[:2500]


def test_downstream_agg_suppresses_skew_split(skew_confs):
    """The documented caveat: when a partial aggregate rides the join
    stage, OptimizeSkewedJoin declines the split (splitting the join's
    shuffle partitions would break the stage's required distribution) —
    the SAME hot key that splits in the direct join stays hot here,
    with the values still correct. This structural gap is exactly why
    the join-key skew AUDIT (operators/audits.py) and explicit salting
    (salted_event_type_stats) remain first-class tools even with AQE
    skew handling enabled."""
    spark = skew_confs
    agg = _skewed_join(spark).groupBy("w").agg(F.count("*").alias("c"))
    rows = {r["w"]: r["c"] for r in agg.collect()}
    assert rows[0] >= _N // 2  # the hot key really is hot
    assert "skew=true" not in _executed_plan(agg), _executed_plan(agg)[:2000]


def test_uniform_join_is_not_marked_skewed(skew_confs):
    spark = skew_confs
    # realistic factor for this test: "skewed" = 5x the median AND over
    # the byte threshold; a uniform key space must trip neither.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5.0")
    try:
        fact = spark.range(50_000).select(
            (F.col("id") % 97).alias("k"),
            F.col("id").cast("string").alias("pad"),
        )
        dim = spark.range(97).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        j = fact.join(dim, "k")
        j.collect()
        assert "skew=true" not in _executed_plan(j), _executed_plan(j)[:2000]
    finally:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            _SKEW_CONFS["spark.sql.adaptive.skewJoin.skewedPartitionFactor"],
        )
