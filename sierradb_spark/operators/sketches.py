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


def hll_registers_for(df: DataFrame, key: str, value: str) -> DataFrame:
    """(key, j, m_j) HLL register table for distinct ``value`` per ``key``.

    Registers merge across any partitioning of the input — batches,
    shards, streams — by groupBy(key, j).max(m_j); that max-merge is
    idempotent AND commutative, which is what the streaming fold
    (streaming/sketchstream.py) leans on for crash safety."""
    h = (
        F.conv(
            F.substring(F.md5(F.col(value).cast("string").cast("binary")), 1, 8),
            16,
            10,
        )
        .cast("long")
        .alias("h")
    )
    # Key cast to string: the streaming register store reads back with
    # a fixed `key string` schema, so a bigint key column must not leak
    # its type into the written parquet.
    hashed = df.select(F.col(key).cast("string").alias("key"), h)
    w = F.col("h") % 16777216
    return (
        hashed.select(
            "key",
            (F.col("h") / F.lit(16777216)).cast("long").alias("j"),
            F.when(w == 0, F.lit(25)).otherwise(
                F.lit(25) - F.length(F.bin(w))
            ).alias("rho"),
        )
        .groupBy("key", "j")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate_from(regs: DataFrame) -> DataFrame:
    """(key, e) distinct estimates from a (key, j, m_j) register table,
    with the standard small-range linear-counting correction."""
    agg = regs.groupBy("key").agg(
        (
            F.sum(F.pow(F.lit(2.0), -F.col("m_j")))
            + (F.lit(_HLL_M) - F.count("*"))
        ).alias("s"),
        (F.lit(_HLL_M) - F.count("*")).alias("v"),
    )
    e_raw = F.lit(_HLL_ALPHA) * F.lit(_HLL_M * _HLL_M) / F.col("s")
    return agg.select(
        "key",
        F.when(
            (e_raw <= F.lit(2.5 * _HLL_M)) & (F.col("v") > 0),
            F.lit(_HLL_M) * F.log(F.lit(_HLL_M) / F.col("v").cast("double")),
        )
        .otherwise(e_raw)
        .alias("e"),
    )



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
    regs = hll_registers_for(e, "event_type", "user_id")
    est = hll_estimate_from(regs).withColumnRenamed("key", "event_type")
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


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch: distinct + set-operation estimates
# ---------------------------------------------------------------------------
#
# The theta-sketch family's simplest member: keep the k smallest 32-bit
# hashes of the distinct keys. Distinct estimate = (k-1) * 2^32 / h_(k);
# merged sketches estimate |A u B|; the fraction of the merged top-k
# present in BOTH input sketches estimates Jaccard, hence |A n B| by
# multiplication — the standard trick for distinct-INTERSECTION
# estimation, which HLL alone cannot do. All rank/integer arithmetic on
# the shared md5 hash, so both engines' sketches are identical and the
# estimates hash-match exactly.

_KMV_K = 64

_SQL_KMV = f"""
    WITH du AS MATERIALIZED (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::UBIGINT AS h
        FROM events
    ),
    sk AS MATERIALIZED (
        SELECT event_type, h FROM (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM du
        ) WHERE rn <= {_KMV_K}
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b
        FROM (SELECT DISTINCT event_type FROM du) a
        JOIN (SELECT DISTINCT event_type FROM du) b
          ON a.event_type < b.event_type
    ),
    merged AS MATERIALIZED (
        SELECT type_a, type_b, h, rn FROM (
            SELECT p.type_a, p.type_b, u.h,
                   row_number() OVER (PARTITION BY p.type_a, p.type_b
                                      ORDER BY u.h) AS rn
            FROM pairs p
            JOIN (SELECT DISTINCT s.event_type, s.h FROM sk s) u
              ON u.event_type IN (p.type_a, p.type_b)
            GROUP BY p.type_a, p.type_b, u.h
        ) WHERE rn <= {_KMV_K}
    ),
    both_flags AS (
        SELECT m.type_a, m.type_b, m.h, m.rn,
               (EXISTS (SELECT 1 FROM sk WHERE sk.event_type = m.type_a
                                           AND sk.h = m.h)
                AND EXISTS (SELECT 1 FROM sk WHERE sk.event_type = m.type_b
                                               AND sk.h = m.h)) AS in_both
        FROM merged m
    ),
    est AS (
        SELECT type_a, type_b,
               max(CASE WHEN rn = {_KMV_K} THEN h END) AS kth,
               count(*) AS n_merged,
               sum(CASE WHEN in_both THEN 1 ELSE 0 END) AS n_both
        FROM both_flags GROUP BY type_a, type_b
    ),
    exact AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(DISTINCT CASE WHEN b.user_id IS NOT NULL
                                   THEN a.user_id END) AS exact_intersect
        FROM (SELECT DISTINCT event_type, user_id FROM events) a
        LEFT JOIN (SELECT DISTINCT event_type, user_id FROM events) b
          ON b.user_id = a.user_id AND a.event_type < b.event_type
        WHERE b.event_type IS NOT NULL
        GROUP BY a.event_type, b.event_type
    ),
    exact_u AS (
        SELECT p.type_a, p.type_b, count(DISTINCT e.user_id) AS exact_union
        FROM pairs p
        JOIN events e ON e.event_type IN (p.type_a, p.type_b)
        GROUP BY p.type_a, p.type_b
    )
    SELECT e.type_a, e.type_b,
           CAST(xu.exact_union AS BIGINT) AS exact_union,
           round(({_KMV_K} - 1) * 4294967296.0 / e.kth, 4) AS union_est,
           CAST(coalesce(x.exact_intersect, 0) AS BIGINT) AS exact_intersect,
           round(e.n_both / {_KMV_K}.0
                 * (({_KMV_K} - 1) * 4294967296.0 / e.kth), 4)
               AS intersect_est,
           round(e.n_both / {_KMV_K}.0, 6) AS jaccard_est
    FROM est e
    JOIN exact_u xu ON xu.type_a = e.type_a AND xu.type_b = e.type_b
    LEFT JOIN exact x ON x.type_a = e.type_a AND x.type_b = e.type_b
"""


@REG.add(
    "kmv_set_ops",
    oracle=_SQL_KMV,
    doc=f"KMV/theta sketch set operations (k={_KMV_K}): per-event-type "
    "k-minimum-value sketches over md5-hashed user ids, merged pairwise to "
    "estimate distinct union, Jaccard, and distinct INTERSECTION (the "
    "operation HLL cannot provide), with exact counts alongside. Identical "
    "integer sketches on both engines, so estimates hash-match "
    "digit-for-digit. Scale shape: sketches are O(groups x k) rows built "
    "with one rank window over distinct hashes; only sketch rows (never "
    "user ids) join pairwise, and KMV sketches merge across shards by "
    "union + re-rank.",
)
def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    du = (
        e.select(
            "event_type",
            F.conv(
                F.substring(
                    F.md5(F.col("user_id").cast("string").cast("binary")), 1, 8
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # sketch + type list reuse
    )
    w = Window.partitionBy("event_type").orderBy("h")
    sk = (
        du.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .select("event_type", "h")
        .localCheckpoint(eager=True)  # reused 4 times below
    )
    types = du.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
    )
    u = sk.select("event_type", "h").distinct()
    merged = (
        pairs.join(
            F.broadcast(u),
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .select("type_a", "type_b", "h")
        .distinct()
    )
    wm = Window.partitionBy("type_a", "type_b").orderBy("h")
    merged_k = (
        merged.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") <= _KMV_K)
    )
    sk_a = sk.select(
        F.col("event_type").alias("type_a"), F.col("h").alias("h"), F.lit(1).alias("ia")
    )
    sk_b = sk.select(
        F.col("event_type").alias("type_b"), F.col("h").alias("h"), F.lit(1).alias("ib")
    )
    flags = (
        merged_k.join(F.broadcast(sk_a), ["type_a", "h"], "left")
        .join(F.broadcast(sk_b), ["type_b", "h"], "left")
        .withColumn(
            "in_both", F.col("ia").isNotNull() & F.col("ib").isNotNull()
        )
    )
    est = flags.groupBy("type_a", "type_b").agg(
        F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("kth"),
        F.count("*").alias("n_merged"),
        F.sum(F.when(F.col("in_both"), 1).otherwise(0)).alias("n_both"),
    )
    duu = e.select("event_type", "user_id").distinct()
    xa, xb = duu.alias("xa"), duu.alias("xb")
    exact_i = (
        xa.join(
            xb,
            (F.col("xb.user_id") == F.col("xa.user_id"))
            & (F.col("xa.event_type") < F.col("xb.event_type")),
        )
        .groupBy(
            F.col("xa.event_type").alias("type_a"),
            F.col("xb.event_type").alias("type_b"),
        )
        .agg(F.countDistinct("xa.user_id").alias("exact_intersect"))
    )
    exact_u = (
        pairs.join(
            e.select("event_type", "user_id"),
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.countDistinct("user_id").alias("exact_union"))
    )
    union_est = (_KMV_K - 1) * 4294967296.0 / F.col("kth")
    return (
        est.join(exact_u, ["type_a", "type_b"])
        .join(exact_i, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.col("exact_union").cast("long").alias("exact_union"),
            F.round(union_est, 4).alias("union_est"),
            F.coalesce(F.col("exact_intersect"), F.lit(0))
            .cast("long")
            .alias("exact_intersect"),
            F.round(F.col("n_both") / float(_KMV_K) * union_est, 4).alias(
                "intersect_est"
            ),
            F.round(F.col("n_both") / float(_KMV_K), 6).alias("jaccard_est"),
        )
    )
