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


# ---------------------------------------------------------------------------
# Deterministic portable HyperLogLog (m=256 registers, md5-derived hash)
# ---------------------------------------------------------------------------
#
# approx_distinct_users above uses each engine's NATIVE estimator (so the
# oracle can only compare tolerance booleans). This one implements HLL
# itself from the md5 hash both engines share: identical registers ->
# identical estimate -> the estimate hash-matches digit-for-digit, giving
# the strongest possible cross-engine evidence that the sketch math is
# right. m=256 (b=8): standard error 1.04/sqrt(256) = 6.5%.
#
# rho(w) over the low 24 hash bits is computed with length(bin(w)):
# both engines render integers as minimal binary strings, so
# 25 - length(bin(w)) == 24 - floor(log2 w) exactly, with w = 0 -> 25.

_HLL_M = 256
_HLL_ALPHA = 0.7213 / (1 + 1.079 / 256)

_SQL_HLL = f"""
    WITH regs AS (
        SELECT event_type, h // 16777216 AS j,
               max(CASE WHEN h % 16777216 = 0 THEN 25
                        ELSE 25 - length(bin(h % 16777216)) END) AS m_j
        FROM (SELECT event_type,
                     ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::UBIGINT AS h
              FROM events)
        GROUP BY event_type, h // 16777216
    ),
    agg AS (
        SELECT event_type,
               sum(power(2.0, -m_j)) + ({_HLL_M} - count(*)) AS s,
               {_HLL_M} - count(*) AS v
        FROM regs GROUP BY event_type
    ),
    est AS (
        SELECT event_type,
               CASE WHEN {_HLL_ALPHA!r}::DOUBLE * {_HLL_M * _HLL_M} / s <= {2.5 * _HLL_M}
                         AND v > 0
                    THEN {_HLL_M} * ln({_HLL_M} / v::DOUBLE)
                    ELSE {_HLL_ALPHA!r}::DOUBLE * {_HLL_M * _HLL_M} / s END AS e
        FROM agg
    ),
    exact AS (
        SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        FROM events GROUP BY event_type
    )
    SELECT x.event_type,
           CAST(x.exact_distinct AS BIGINT) AS exact_distinct,
           round(e.e, 4) AS hll_estimate,
           round(abs(e.e - x.exact_distinct) / x.exact_distinct, 6)
               AS rel_error,
           abs(e.e - x.exact_distinct) / x.exact_distinct < 0.195
               AS within_3_sigma
    FROM exact x JOIN est e ON e.event_type = x.event_type
"""


@REG.add(
    "hll_distinct_audit",
    oracle=_SQL_HLL,
    doc=f"From-scratch HyperLogLog (m={_HLL_M} registers, b=8, md5-derived "
    "32-bit hash, small-range linear-counting correction) for distinct users "
    "per event type, audited against the exact count with the 3-sigma "
    "(19.5%) bound of the m=256 configuration. Unlike approx_distinct_users "
    "(engine-native sketches, tolerance-boolean oracle), the registers here "
    "are deterministic and IDENTICAL across engines, so the estimate itself "
    "hash-matches. Scale shape: the register table is "
    f"O(groups x {_HLL_M}) regardless of stream size, built by one "
    "map-side-combining max aggregate — and registers merge across "
    "shards/streams by element-wise max, which is what you ship to "
    "1000 executors.",
)
def hll_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    h = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        )
        .cast("long")
        .alias("h")
    )
    hashed = e.select("event_type", h)
    w = F.col("h") % 16777216
    regs = (
        hashed.select(
            "event_type",
            (F.col("h") / F.lit(16777216)).cast("long").alias("j"),
            F.when(w == 0, F.lit(25)).otherwise(
                F.lit(25) - F.length(F.bin(w))
            ).alias("rho"),
        )
        .groupBy("event_type", "j")
        .agg(F.max("rho").alias("m_j"))
    )
    agg = regs.groupBy("event_type").agg(
        (
            F.sum(F.pow(F.lit(2.0), -F.col("m_j")))
            + (F.lit(_HLL_M) - F.count("*"))
        ).alias("s"),
        (F.lit(_HLL_M) - F.count("*")).alias("v"),
    )
    e_raw = F.lit(_HLL_ALPHA) * F.lit(_HLL_M * _HLL_M) / F.col("s")
    est = agg.select(
        "event_type",
        F.when(
            (e_raw <= F.lit(2.5 * _HLL_M)) & (F.col("v") > 0),
            F.lit(_HLL_M) * F.log(F.lit(_HLL_M) / F.col("v").cast("double")),
        )
        .otherwise(e_raw)
        .alias("e"),
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return exact.join(est, "event_type").select(
        "event_type",
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        F.round("e", 4).alias("hll_estimate"),
        F.round(
            F.abs(F.col("e") - F.col("exact_distinct")) / F.col("exact_distinct"), 6
        ).alias("rel_error"),
        (
            F.abs(F.col("e") - F.col("exact_distinct")) / F.col("exact_distinct")
            < 0.195
        ).alias("within_3_sigma"),
    )
