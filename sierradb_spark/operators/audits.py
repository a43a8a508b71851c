"""Shuffle-planning audits: key skew and partition balance.

Before a 100 TB join or aggregation you ask two questions of the data,
not the code: is any join key hot enough to need salting / AQE skew
handling, and does the intended partitioner spread load evenly? Both
answers are one aggregate over the fact table — these queries make
them first-class, oracle-checked operators so the decision inputs the
docs cite (docs/SCALE.md's salting and AQE sections) are measured, not
assumed.

- ``join_key_skew_audit``: per candidate join key — row count, distinct
  keys, max/avg rows per key, the hottest key's share. ``skew`` (max /
  avg) is the number AQE's skew-join threshold reasons about.
- ``partition_balance_audit``: load per partition under a fixed
  partitioner (``key % 32`` — a stand-in for ``pmod(hash(key), P)``
  that both engines compute identically), reporting the max/avg
  imbalance ratio. An imbalance near 1.0 means hash partitioning
  spreads this key well; >> 1 predicts straggler tasks.

Both are unions of single-scan aggregates — no joins, no text columns,
nothing leaves the scan but counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load

REG = Registry()

# (label, table, column) — the join keys the relational suite actually
# shuffles on, plus the event keys the sessionization/state queries use.
_SKEW_KEYS = (
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("events.user_id", "events", "user_id"),
    ("events.event_type", "events", "event_type"),
)

_N_BUCKETS = 32

_BALANCE_KEYS = (
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("events.user_id", "events", "user_id"),
)


def _skew_sql(label: str, table: str, col: str) -> str:
    return f"""
        SELECT '{label}' AS key_col,
               CAST(sum(c) AS BIGINT) AS total_rows,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(max(c) AS BIGINT) AS max_per_key,
               round(avg(CAST(c AS DOUBLE)), 4) AS avg_per_key,
               round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top1_share,
               round(CAST(max(c) AS DOUBLE) / avg(CAST(c AS DOUBLE)), 4) AS skew
        FROM (SELECT {col}, count(*) AS c FROM {table} GROUP BY {col})
    """


@REG.add(
    "join_key_skew_audit",
    oracle=" UNION ALL ".join(_skew_sql(*k) for k in _SKEW_KEYS),
    doc="Join-key skew audit over the keys the relational/event suites "
    "shuffle on: rows, distinct keys, max and mean rows per key, the "
    "hottest key's share of the table, and skew = max/avg — the inputs "
    "to the salt-or-AQE decision at 100 TB. One groupBy per key column "
    "(partial aggregation map-side), folded to a 5-row result; nothing "
    "but counters leaves the scans.",
)
def join_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for label, table, col in _SKEW_KEYS:
        per_key = (
            load(spark, sf_dir, table).groupBy(col).agg(F.count("*").alias("c"))
        )
        parts.append(
            per_key.agg(
                F.lit(label).alias("key_col"),
                F.sum("c").alias("total_rows"),
                F.count("*").alias("n_keys"),
                F.max("c").alias("max_per_key"),
                F.round(F.avg(F.col("c").cast("double")), 4).alias("avg_per_key"),
                F.round(
                    F.max("c").cast("double") / F.sum("c"), 6
                ).alias("top1_share"),
                F.round(
                    F.max("c").cast("double")
                    / F.avg(F.col("c").cast("double")),
                    4,
                ).alias("skew"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _balance_sql(label: str, table: str, col: str) -> str:
    return f"""
        SELECT '{label}' AS key_col,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(min(c) AS BIGINT) AS min_load,
               CAST(max(c) AS BIGINT) AS max_load,
               round(avg(CAST(c AS DOUBLE)), 4) AS avg_load,
               round(CAST(max(c) AS DOUBLE) / avg(CAST(c AS DOUBLE)), 4)
                   AS imbalance
        FROM (SELECT {col} % {_N_BUCKETS} AS b, count(*) AS c
              FROM {table} GROUP BY b)
    """


@REG.add(
    "partition_balance_audit",
    oracle=" UNION ALL ".join(_balance_sql(*k) for k in _BALANCE_KEYS),
    doc=f"Partition-balance audit: rows per bucket under key % "
    f"{_N_BUCKETS} (an engine-portable stand-in for pmod(hash(key), P) "
    "— DuckDB and Spark hash differently, modulo they share), with "
    "imbalance = max/avg bucket load. Near 1.0 means hash partitioning "
    "spreads the key well; large values predict straggler tasks and "
    "argue for a different shuffle key or an explicit salt.",
)
def partition_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for label, table, col in _BALANCE_KEYS:
        per_bucket = (
            load(spark, sf_dir, table)
            .groupBy((F.col(col) % _N_BUCKETS).alias("b"))
            .agg(F.count("*").alias("c"))
        )
        parts.append(
            per_bucket.agg(
                F.lit(label).alias("key_col"),
                F.count("*").alias("n_buckets"),
                F.min("c").alias("min_load"),
                F.max("c").alias("max_load"),
                F.round(F.avg(F.col("c").cast("double")), 4).alias("avg_load"),
                F.round(
                    F.max("c").cast("double")
                    / F.avg(F.col("c").cast("double")),
                    4,
                ).alias("imbalance"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@REG.add(
    "benford_law_audit",
    oracle="""
        WITH cents AS (
            SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
            FROM lineitem WHERE l_extendedprice > 0
        ),
        dig AS (
            SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit
            FROM cents
        ),
        cnt AS (SELECT digit, count(*) AS n FROM dig GROUP BY digit),
        tot AS (SELECT sum(n) AS total FROM cnt)
        SELECT digit,
               CAST(n AS BIGINT) AS n_values,
               round(n::DOUBLE / total, 6) AS obs_share,
               round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford_share,
               round(pow(n - total * (ln(1.0 + 1.0 / digit) / ln(10.0)), 2)
                     / (total * (ln(1.0 + 1.0 / digit) / ln(10.0))), 6)
                   AS chi2_component
        FROM cnt CROSS JOIN tot
    """,
    doc="Benford's-law first-digit audit over extended prices — the "
    "classic fabricated-data / unit-mixing detector a data-quality "
    "suite runs on monetary columns. The first digit is extracted from "
    "the INTEGER cents string (never floor(log10(x)), whose libm "
    "rounding differs across engines at powers of ten); expected shares "
    "are log10(1+1/d) and each digit row carries its chi-square "
    "component. One scan, one 9-row aggregate, one 1-row total "
    "broadcast.",
)
def benford_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cents = li.where(F.col("l_extendedprice") > 0).select(
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("c")
    )
    dig = cents.select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit")
    )
    cnt = dig.groupBy("digit").agg(F.count("*").alias("n"))
    tot = cnt.agg(F.sum("n").alias("total"))
    exp_share = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    n, total = F.col("n").cast("double"), F.col("total").cast("double")
    return cnt.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("bigint").alias("n_values"),
        F.round(n / total, 6).alias("obs_share"),
        F.round(exp_share, 6).alias("benford_share"),
        F.round(
            F.pow(n - total * exp_share, F.lit(2.0)) / (total * exp_share), 6
        ).alias("chi2_component"),
    )
