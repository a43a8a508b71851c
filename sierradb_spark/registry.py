"""Query registry plumbing.

Every declared operator is a ``Query``: a Spark callable plus (usually)
an equivalent ANSI-SQL oracle that DuckDB can run on the same parquet
tables. The driver's correctness gate hash-matches the two at sf0.01
(order-insensitive), so:

- every computed column is aliased identically on both sides;
- floating aggregates are rounded identically on both sides (doubles
  accumulated in different orders by two engines agree to ~1e-12
  relative; rounding makes the hash stable);
- DuckDB integer aggregates are cast to BIGINT in the oracle (DuckDB
  widens sum(int) to HUGEINT, Spark to LONG).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name}")
    if name == "events":
        # The events table carries TIMESTAMP(NANOS) parquet timestamps,
        # which Spark only reads as raw longs. Convert to µs-precision
        # TIMESTAMP by truncation — exactly what DuckDB does when it
        # reads the same file, so oracle comparisons agree.
        from pyspark.sql import functions as F

        # session.get_spark owns this conf; the guarded set below exists
        # only for FOREIGN sessions (e.g. the driver's own harness
        # session), where reading nanos timestamps would otherwise
        # throw. Sessions from our factory never hit the mutation.
        if (
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
            != "true"
        ):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


import re

# Logical-plan nodes whose presence means the input's lineage contains
# an exchange (or would make a `.rdd` width probe execute query stages
# under AQE). Matched as whole node names at tree-line starts, so a
# column called `join_key` can't false-positive.
_EXCHANGE_NODES = re.compile(
    r"^[\s+:|\-!>*()]*(?:Aggregate|Join|Window|Distinct|Deduplicate|"
    r"Sort|GlobalLimit|Repartition|RepartitionByExpression|"
    r"Intersect|Except|CoGroup|FlatMapGroups)\b",
    re.MULTILINE,
)


def _narrow_input_width(df: DataFrame) -> int | None:
    """Partition count of ``df`` when its lineage is shuffle-free (a
    file scan or LogicalRDD plus narrow ops only), else ``None``.

    For narrow lineages the ``.rdd`` probe is pure planning — split
    enumeration, no query-stage execution — so it is cheap and
    side-effect-free. For plans containing exchanges, AQE's
    ``doExecute`` would MATERIALIZE the upstream stages just to count
    partitions, so we refuse to probe and the caller keeps the
    unconditional exchange (the input width there is an AQE runtime
    decision anyway). Any introspection failure degrades the same way.
    """
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
        if _EXCHANGE_NODES.search(plan):
            return None
        return df.rdd.getNumPartitions()
    except Exception:
        return None


def _shuffle_width(sess: SparkSession) -> int:
    """The session's shuffle width as an int, guarded against platforms
    where ``spark.sql.shuffle.partitions`` is non-numeric (e.g. "auto"
    under Databricks AQE auto mode): degrade to the cluster's default
    parallelism rather than raising at plan-build time."""
    try:
        return int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
    except (ValueError, TypeError):
        return sess.sparkContext.defaultParallelism or 32


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition to the session's shuffle width with an EXPLICIT
    count — unless the input is already that wide.

    The test corpus arrives as single-row-group parquet files, so a scan
    is ONE input split, and everything upstream of a plan's first
    exchange — which is exactly where the heavy per-row work usually
    sits (pair joins against a broadcast side, explode fan-outs, per-row
    hashing, higher-order array folds) — would run on a single core. A
    count-less ``repartition()`` does not help: the rows are small
    byte-wise, so AQE coalesces the exchange right back to one
    partition; the work that matters happens DOWNSTREAM of it, invisible
    to AQE's size heuristic. An explicit count (REPARTITION_BY_NUM) is
    exempt from coalescing.

    Width-awareness: on a real multi-split cluster the scan is already
    wide, and for the sites that spread a full base relation (the
    profiled table in dq_completeness_report, the events scan before the
    ×64 bootstrap explode) the exchange would shuffle the biggest
    relation in the plan for nothing. So when the input's lineage is
    shuffle-free and already reports >= the target width, ``df`` is
    returned unchanged (no exchange in the plan at all). Shuffle-bearing
    lineages keep the unconditional exchange — probing their width
    would execute the upstream stages under AQE, and their width is an
    AQE runtime decision regardless. The skip can be disabled with
    ``spark.sierradb.spread.widthAware=false`` (partitioning is never
    semantically load-bearing here — every registry result is
    partition-agnostic — so the only effect is the extra exchange).
    """
    sess = df.sparkSession
    n = _shuffle_width(sess)
    if sess.conf.get("spark.sierradb.spread.widthAware", "true") == "true":
        width = _narrow_input_width(df)
        if width is not None and width >= n:
            return df
    return df.repartition(n, *cols) if cols else df.repartition(n)


def bucketed_cumulative(
    df: DataFrame,
    key: str,
    sums: dict[str, str],
    *,
    descending: bool = False,
    inclusive: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    """Exact running sums over ``key`` order for a relation with UNIQUE
    ``key`` rows — without a global window and without an O(n²) range
    join. For every ``src -> out`` in ``sums``, adds column ``out`` =
    the sum of ``src`` over rows strictly before the row in ``key``
    order (``inclusive`` adds the row itself; ``descending`` reverses
    the order, i.e. sums over strictly-greater keys).

    The two classic cumulative idioms both break at scale: the
    histogram-cumulative broadcast range join is right for BOUNDED
    histograms (day gaps, count-of-counts) but quadratic when the
    histogram grows with the data (per-customer revenue levels,
    per-minute latencies), and a global window is exact but runs on a
    single partition. This is the distributed TWO-LEVEL PREFIX SUM
    instead: approximate-quantile boundaries bucket the keys (broadcast
    one-row array — sketch accuracy moves only bucket BALANCE, never
    the result, because assignment is monotone in ``key``), a broadcast
    B-row self-join supplies each bucket's exact other-bucket totals,
    and a window PARTITIONED by bucket supplies the exact within-bucket
    remainder. One shuffle (the bucket window), linear at any scale.

    **Preconditions on ``key`` (the caller's contract):**

    - **UNIQUE**: one row per key value. Duplicate keys would
      double-count each other inside the within-bucket window (a twin
      is order-ambiguous under the non-total ``key`` sort). Callers
      aggregate to the key immediately upstream (``groupBy(key)``).
    - **NON-NULL**: ``F.col(key) > bound`` is null-safe-false, so a
      null-key row would land in bucket 0 and (ascending order, nulls
      first) leak its mass into other rows' running sums — unlike the
      O(n²) range join this replaces, whose ``r.key > h.key`` condition
      excluded null rows from every sum.

    Both are validated when ``spark.sierradb.debug.checkCumulativeKeys``
    is ``true`` (default ``false`` — the check executes the upstream
    plan one extra time, so it is for tests/debugging, not the hot
    path): a duplicate or null key raises ``ValueError`` at plan-build
    time instead of silently mis-summing. ``tests/test_plans.py`` runs
    both callers under the check and pins the red path on misuse.

    The returned plan references ``df`` several times (the boundary
    sketch, the per-bucket totals, the final join); Spark's
    ReuseExchange dedupes the repeated exchange-rooted subtrees at
    runtime (verified on the executed plan), so the upstream of ``df``
    computes once — callers do NOT need to pre-materialize it.
    """
    from pyspark.sql import Window

    sess = df.sparkSession
    if (
        sess.conf.get("spark.sierradb.debug.checkCumulativeKeys", "false")
        == "true"
    ):
        bad = (
            df.groupBy(key)
            .count()
            .where(F.col("count") > 1)
            .select(
                F.col(key).alias("k"),
                "count",
                F.lit("UNIQUE").alias("violated"),
            )
            .unionByName(
                df.where(F.col(key).isNull())
                .groupBy(key)
                .count()
                .select(
                    F.col(key).alias("k"),
                    "count",
                    F.lit("NON-NULL").alias("violated"),
                )
            )
            .limit(1)
            .collect()
        )
        if bad:
            raise ValueError(
                f"bucketed_cumulative: key column {key!r} violates the "
                f"{bad[0]['violated']} precondition "
                f"(offending key={bad[0]['k']!r}, count={bad[0]['count']}); "
                "aggregate to the key (groupBy) and filter nulls "
                "upstream — see the docstring"
            )
    n_b = n_buckets or _shuffle_width(sess)
    bounds = df.agg(
        F.percentile_approx(
            key, [i / n_b for i in range(1, n_b)], 10_000
        ).alias("__sdb_bounds")
    )
    bucketed = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "__sdb_b",
            F.aggregate(
                F.col("__sdb_bounds"),
                F.lit(0),
                lambda acc, bd: acc
                + F.when(F.col(key) > bd, 1).otherwise(0),
            ),
        )
        .drop("__sdb_bounds")
    )
    per_b = bucketed.groupBy("__sdb_b").agg(
        *[F.sum(src).alias(f"__sdb_s_{src}") for src in sums]
    )
    x, y = per_b.alias("x"), per_b.alias("y")
    cond = (
        F.col("y.__sdb_b") > F.col("x.__sdb_b")
        if descending
        else F.col("y.__sdb_b") < F.col("x.__sdb_b")
    )
    other_b = (
        x.join(F.broadcast(y), cond, "left")
        .groupBy(F.col("x.__sdb_b").alias("__sdb_b"))
        .agg(
            *[
                F.coalesce(F.sum(F.col(f"y.__sdb_s_{src}")), F.lit(0)).alias(
                    f"__sdb_o_{src}"
                )
                for src in sums
            ]
        )
    )
    w = (
        Window.partitionBy("__sdb_b")
        .orderBy(F.col(key).desc() if descending else F.col(key).asc())
        .rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    )
    out_cols = [
        (
            F.col(f"__sdb_o_{src}")
            + F.coalesce(F.sum(src).over(w), F.lit(0))
        ).alias(out)
        for src, out in sums.items()
    ]
    return bucketed.join(F.broadcast(other_b), "__sdb_b").select(
        *df.columns, *out_cols
    )


@dataclass(frozen=True)
class Query:
    """One declared operator: Spark implementation + DuckDB oracle."""

    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    headline: bool = False  # included in bench.py
    doc: str = ""


class Registry:
    def __init__(self) -> None:
        self._queries: dict[str, Query] = {}

    def add(
        self,
        name: str,
        oracle: str | None,
        headline: bool = False,
        doc: str = "",
    ) -> Callable:
        def deco(fn: Callable[[SparkSession, str], DataFrame]):
            if name in self._queries:
                raise ValueError(f"duplicate query {name}")
            self._queries[name] = Query(name, fn, oracle, headline, doc or fn.__doc__ or "")
            return fn

        return deco

    def merge(self, other: "Registry") -> None:
        for q in other._queries.values():
            if q.name in self._queries:
                raise ValueError(f"duplicate query {q.name}")
            self._queries[q.name] = q

    def reorder_front(self, front: list[str]) -> None:
        """Pin ``front`` as the first registry entries (insertion order),
        leaving every other query in merge order behind them. Raises on
        unknown names so the pinned list can't silently drift from the
        actual surface."""
        missing = [n for n in front if n not in self._queries]
        if missing:
            raise ValueError(f"reorder_front: unknown queries {missing}")
        ordered = {n: self._queries[n] for n in front}
        for n, q in self._queries.items():
            if n not in ordered:
                ordered[n] = q
        self._queries = ordered

    @property
    def queries(self) -> dict[str, Query]:
        return dict(self._queries)
