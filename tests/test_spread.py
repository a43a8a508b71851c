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
    # Most configured slices receive rows. Hash partitioning makes an
    # exactly-n assertion probabilistic (and brittle if the conftest
    # width is ever raised relative to the distinct-key count), so pin
    # a floor instead: with 10k uniform keys, > n/2 non-empty slices is
    # overwhelmingly certain while still proving the exchange ran wide.
    assert _runtime_partitions(spread(base, "id")) > n // 2


def test_spread_skips_exchange_on_already_wide_narrow_input(spark):
    """Width-awareness: a shuffle-free input that already reports >= the
    target width is returned UNCHANGED — no exchange node added — so on
    a real multi-split cluster spread() stops costing a full shuffle of
    the base relation (the dq/bootstrap full-table sites)."""
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    wide = spark.range(0, 10_000, numPartitions=n)
    assert spread(wide) is wide
    assert spread(wide, "id") is wide
    # narrow ops on top keep the lineage probe-able and the skip active
    wider_sel = wide.select((F.col("id") % 5).alias("k"))
    assert spread(wider_sel, "k") is wider_sel
    # runtime width really is preserved without the exchange
    assert _runtime_partitions(spread(wide)) == n


def test_spread_still_exchanges_single_split_and_shuffle_lineage(spark):
    """The two cases that must KEEP the exchange: (a) a narrow input
    below the target width (the single-split test-parquet trap), (b) a
    shuffle-bearing lineage, whose width the helper refuses to probe
    (doing so would execute the upstream stages under AQE)."""
    narrow = spark.range(0, 1000, numPartitions=1)
    assert spread(narrow) is not narrow
    assert _runtime_partitions(spread(narrow)) > 1
    hist = (
        spark.range(0, 1000)
        .select((F.col("id") % 97).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("c"))
    )
    assert spread(hist, "c") is not hist
    assert _runtime_partitions(spread(hist, "c")) > 1


def test_spread_width_aware_conf_gate(spark):
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    wide = spark.range(0, 10_000, numPartitions=n)
    spark.conf.set("spark.sierradb.spread.widthAware", "false")
    try:
        assert spread(wide) is not wide  # gate off → unconditional
    finally:
        spark.conf.unset("spark.sierradb.spread.widthAware")
    assert spread(wide) is wide  # default on


def test_exchange_nodes_regex_canary(spark):
    """r10 (VERDICT r9 residual): ``_EXCHANGE_NODES`` is a regex over
    analyzed-plan strings, so a node rename in a future Spark version
    would silently disable the width-aware skip (safe direction — an
    extra exchange, never wrongness — but it should fail LOUDLY). Pin
    both directions: every exchange-introducing lineage kind matches,
    and a narrow scan-project lineage — including a column literally
    named ``join_key`` — does not."""
    from pyspark.sql import Window

    from sierradb_spark.registry import _EXCHANGE_NODES

    def plan(df) -> str:
        return df._jdf.queryExecution().analyzed().toString()

    narrow = spark.range(0, 100).select(
        (F.col("id") % 5).alias("join_key"), F.col("id")
    )
    assert not _EXCHANGE_NODES.search(plan(narrow))

    shuffling = {
        "aggregate": narrow.groupBy("join_key").agg(F.count("*").alias("c")),
        "join": narrow.join(
            spark.range(0, 10).select(F.col("id").alias("rid")),
            narrow.id == F.col("rid"),
        ),
        "window": narrow.select(
            F.row_number()
            .over(Window.partitionBy("join_key").orderBy("id"))
            .alias("r")
        ),
        "distinct": narrow.distinct(),
        "sort": narrow.orderBy("id"),
        "repartition": narrow.repartition(4, "join_key"),
    }
    for kind, df in shuffling.items():
        assert _EXCHANGE_NODES.search(plan(df)), (
            f"{kind} lineage no longer matches _EXCHANGE_NODES — "
            "Spark renamed the node; update the regex or the "
            "width-aware skip silently turns off\n" + plan(df)
        )


# --- bucketed_cumulative (registry's two-level prefix sum) -----------


def test_shuffle_width_guards_non_numeric_conf():
    """r11 (ADVICE): both spread and bucketed_cumulative size off
    _shuffle_width, which degrades to defaultParallelism when the
    shuffle-partitions conf is non-numeric (e.g. "auto" on Databricks
    AQE auto mode) instead of raising at plan-build time. A real
    session rejects non-int values at set time, so pin the guard with
    a minimal fake."""
    from sierradb_spark.registry import _shuffle_width

    class _Conf:
        def __init__(self, v):
            self._v = v

        def get(self, key, default=None):
            return self._v

    class _SC:
        defaultParallelism = 7

    class _Sess:
        sparkContext = _SC()

        def __init__(self, v):
            self.conf = _Conf(v)

    assert _shuffle_width(_Sess("auto")) == 7
    assert _shuffle_width(_Sess(None)) == 7
    assert _shuffle_width(_Sess("16")) == 16


def test_bucketed_cumulative_matches_global_window(spark):
    """Exactness of the two-level prefix sum against the one-partition
    global-window reference, across all four (descending, inclusive)
    corners. Values are small integers so double sums are exact in any
    accumulation order."""
    import random

    from pyspark.sql import Window

    from sierradb_spark.registry import bucketed_cumulative

    rnd = random.Random(11)
    keys = rnd.sample(range(100_000), 500)
    rows = [(k, float(rnd.randint(1, 100)), rnd.randint(0, 5)) for k in keys]
    df = spark.createDataFrame(rows, "k bigint, v double, w bigint")
    for desc in (False, True):
        for inc in (False, True):
            got = bucketed_cumulative(
                df,
                "k",
                {"v": "cv", "w": "cw"},
                descending=desc,
                inclusive=inc,
                n_buckets=8,
            )
            w = (
                Window.orderBy(F.col("k").desc() if desc else F.col("k").asc())
                .rowsBetween(Window.unboundedPreceding, 0 if inc else -1)
            )
            exp = df.select(
                "k",
                F.coalesce(F.sum("v").over(w), F.lit(0.0)).alias("cv"),
                F.coalesce(F.sum("w").over(w), F.lit(0)).alias("cw"),
            )
            got_m = {r["k"]: (r["cv"], r["cw"]) for r in got.collect()}
            exp_m = {r["k"]: (r["cv"], r["cw"]) for r in exp.collect()}
            assert got_m == exp_m, (desc, inc)


def test_bucketed_cumulative_key_precondition_is_loud(spark):
    """r11 (VERDICT item 3 + ADVICE): the helper is the designated
    growing-histogram cumulative idiom, so misuse of its UNIQUE +
    NON-NULL key contract must be a plan-build-time ValueError under
    the debug conf, not a silent double-count / null-mass leak."""
    import pytest as _pytest

    from sierradb_spark.registry import bucketed_cumulative

    dup = spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 1.0)], "k int, v double"
    )
    nullkey = spark.createDataFrame(
        [(None, 10.0), (2, 1.0)], "k int, v double"
    )
    # default off: the plan builds (GIGO — the docstring contract)
    bucketed_cumulative(dup, "k", {"v": "cv"}, n_buckets=4)
    spark.conf.set("spark.sierradb.debug.checkCumulativeKeys", "true")
    try:
        # The messages are branch-specific (r11 review: a shared
        # "UNIQUE + NON-NULL" message matched either pattern, so a
        # broken branch could hide behind the other's raise).
        with _pytest.raises(ValueError, match="UNIQUE precondition"):
            bucketed_cumulative(dup, "k", {"v": "cv"}, n_buckets=4)
        with _pytest.raises(ValueError, match="NON-NULL precondition"):
            bucketed_cumulative(nullkey, "k", {"v": "cv"}, n_buckets=4)
        # unique + non-null passes the check and still computes
        ok = spark.createDataFrame(
            [(1, 10.0), (2, 5.0), (3, 1.0)], "k int, v double"
        )
        out = bucketed_cumulative(
            ok, "k", {"v": "cv"}, inclusive=True, n_buckets=4
        )
        assert {r["k"]: r["cv"] for r in out.collect()} == {
            1: 10.0,
            2: 15.0,
            3: 16.0,
        }
    finally:
        spark.conf.set("spark.sierradb.debug.checkCumulativeKeys", "false")
