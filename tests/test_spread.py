"""registry.spread(): the single-split safety net (docs/SCALE.md,
"Pre-exchange parallelism: the single-split trap").

These tests pin the two mechanisms the r8 spread pass depends on, at
RUNTIME (spark_partition_id over an executed plan), not by plan-string
inspection — AQE rewrites the plan during execution, which is exactly
the behavior under test:

1. spread() survives AQE coalescing on byte-tiny inputs (an
   explicit-count repartition is exempt; a count-less one is folded
   back to one partition).
2. A spread keyed on a groupBy's own grouping key is collapsed as a
   redundant repartition and loses to the AQE coalesce — the trap that
   made revenue_concentration_8020's first fix a silent no-op. Keying
   on any other column (or round-robin) restores the width.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sierradb_spark.registry import spread


def _runtime_partitions(df) -> int:
    """Distinct spark_partition_id over the EXECUTED dataframe — the
    post-AQE truth, unlike df.rdd.getNumPartitions() on the unexecuted
    plan."""
    return (
        df.withColumn("_p", F.spark_partition_id())
        .select("_p")
        .distinct()
        .count()
    )


def test_spread_survives_aqe_on_tiny_input(spark):
    base = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    assert _runtime_partitions(spread(base, "id")) > 1
    assert _runtime_partitions(spread(base)) > 1  # round-robin form


def test_countless_repartition_is_coalesced_but_spread_is_not(spark):
    # Control: the failure mode spread() exists to avoid. A count-less
    # repartition of byte-tiny rows is AQE-coalesced to ONE partition,
    # so downstream per-row work would serialize on one core.
    base = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    assert _runtime_partitions(base.repartition(F.col("id"))) == 1
    assert _runtime_partitions(spread(base, "id")) > 1


def test_same_key_spread_after_groupby_is_collapsed(spark):
    """Documents the collapsed-repartition trap: hist is already
    hash(k)-partitioned out of the groupBy, so spread(hist, "k") is
    optimized away and AQE coalesces the remaining exchange; keying on
    another column keeps the width."""
    hist = (
        spark.range(0, 1000)
        .select((F.col("id") % 97).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("c"))
    )
    assert _runtime_partitions(spread(hist, "k")) == 1  # the trap
    assert _runtime_partitions(spread(hist, "c")) > 1
    assert _runtime_partitions(spread(hist)) > 1


def test_spread_width_follows_session_conf(spark):
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = spark.range(0, 10_000)
    # every configured slice receives rows (range input is uniform)
    assert _runtime_partitions(spread(base, "id")) == n
