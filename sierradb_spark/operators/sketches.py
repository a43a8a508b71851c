"""Approximate/sketch operators: HLL distinct counts, approximate
percentiles, frequent items, grouping sets.

The reference has no approximate query surface (SURVEY §2.7 — its bloom
filters are index-internal); these are the sketch operators any
100 TB analytics engine needs, where exact computation would be a
full shuffle of the key universe.

Oracle strategy: a sketch estimate is algorithm-specific, so the two
engines can never hash-match on the raw estimate. Each query therefore
emits the EXACT value (computable by both engines) plus a boolean
``within tolerance`` check of its own estimate against that exact
value. Both sides run their own sketch; both assert the published
error bound; the booleans (and exact values) hash-match. That checks
the sketch is wired correctly AND within spec, not that two different
algorithms agree digit-for-digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load

REG = Registry()


@REG.add(
    "approx_distinct_users",
    oracle="""
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
               (abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
                    <= 0.05 * count(DISTINCT user_id)) AS approx_ok
        FROM events GROUP BY event_type
    """,
    doc="HyperLogLog distinct users per event type. At 100 TB the exact "
    "count(DISTINCT) is a full shuffle of the (type, user) universe; the HLL "
    "sketch is a fixed-size partial aggregate mergeable map-side. Oracle "
    "compares exact counts and each engine's own sketch-vs-exact error bound "
    "(rsd 5%), not the algorithm-specific estimates.",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.02)
                - F.countDistinct("user_id")
            )
            <= 0.05 * F.countDistinct("user_id")
        ).alias("approx_ok"),
    )


@REG.add(
    "approx_value_percentiles",
    oracle="""
        WITH exact AS (
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 4) AS p50,
                   round(quantile_cont(value, 0.99), 4) AS p99
            FROM events GROUP BY event_type
        ),
        approx AS (
            SELECT event_type,
                   approx_quantile(value, 0.5) AS a50
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, e.p50, e.p99,
               (abs(a.a50 - e.p50) <= 0.05 * (e.p99 - e.p50 + 1.0)) AS approx_ok
        FROM exact e JOIN approx a ON e.event_type = a.event_type
    """,
    doc="Approximate percentiles (t-digest / Greenwald-Khanna class sketches): "
    "mergeable fixed-size state vs the full sort an exact percentile needs. "
    "Output = exact interpolated p50/p99 (both engines agree on those) + each "
    "engine's own sketch-error check against a range-scaled tolerance. The "
    "check is on the MEDIAN only: a tail quantile's rank error converts to an "
    "unbounded value error on small groups (order-stat gaps near the max), so "
    "p99 sketch error is not a stable cross-engine assertion at small SF.",
)
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )
    approx = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 10000)").alias("a50"),
    )
    tol = 0.05 * (F.col("p99") - F.col("p50") + 1.0)
    return (
        exact.join(approx, "event_type")
        .select(
            "event_type",
            "p50",
            "p99",
            (F.abs(F.col("a50") - F.col("p50")) <= tol).alias("approx_ok"),
        )
    )


@REG.add(
    "grouping_sets_revenue",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
               round(sum(l_extendedprice), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS (the general form of cube/rollup, which the "
    "registry also covers): four aggregation granularities in ONE shuffle pass "
    "with grouping() flags disambiguating NULL group keys from NULL data. At "
    "scale this replaces four separate scans with one.",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_gs")
    return li.sparkSession.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
               round(sum(l_extendedprice), 2) AS revenue,
               count(*) AS n_items
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus), ())
        """
    )


@REG.add(
    "frequent_event_values",
    oracle="""
        WITH b AS (
            SELECT CAST(floor(value / 50) * 50 AS BIGINT) AS bucket,
                   count(*) AS c
            FROM events GROUP BY 1
        ),
        total AS (SELECT sum(c) AS n FROM b)
        SELECT bucket, CAST(c AS BIGINT) AS n_events,
               round(c / n, 4) AS frac
        FROM b, total
        WHERE c >= 0.05 * n
        ORDER BY bucket
    """,
    doc="Heavy-hitters over a bucketed value domain (the exact form of a "
    "count-min / space-saving sketch query): buckets above a 5% support "
    "threshold. The bucketing partial-aggregates map-side, so the shuffle "
    "carries |buckets| rows; the support filter needs the total, a 1-row "
    "broadcast.",
)
def frequent_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    b = ev.groupBy(
        (F.floor(F.col("value") / 50) * 50).cast("long").alias("bucket")
    ).agg(F.count("*").alias("c"))
    total = b.agg(F.sum("c").alias("n"))
    return (
        b.crossJoin(F.broadcast(total))
        .where(F.col("c") >= 0.05 * F.col("n"))
        .select(
            "bucket",
            F.col("c").alias("n_events"),
            F.round(F.col("c") / F.col("n"), 4).alias("frac"),
        )
        .orderBy("bucket")
    )
