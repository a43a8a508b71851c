"""Window-function operators: running aggregates, per-group top-k,
sessionization, as-of join.

The reference's only window-shaped primitive is the gapless sequence
assignment (row_number per partition, SURVEY §2.7); the rest are the
extension surface a time-series/event engine needs. The as-of join is
implemented the scalable way — union + last-non-null window — instead
of an inequality range join, because the range join is O(n·m) per key
while the window pass is one sort per partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load

REG = Registry()


@REG.add(
    "running_total_per_stream",
    oracle="""
        SELECT user_id, event_id,
               round(sum(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 4) AS running_value
        FROM events WHERE user_id < 10
    """,
    doc="Running aggregate per stream — one shuffle on the partition key, then a "
    "sorted single pass. Frame is ROWS (not RANGE) so ties are resolved by the "
    "deterministic (ts, event_id) order in both engines.",
)
def running_total_per_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(F.col("user_id") < 10)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


@REG.add(
    "top3_orders_per_customer",
    oracle="""
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC
                   ) AS INT) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    headline=True,
    doc="Per-group top-k via row_number — the canonical dedup/ranking pattern. At "
    "scale Spark pushes a per-partition top-k (WindowGroupLimit) before the shuffle.",
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            "rn",
        )
    )


@REG.add(
    "sessionize_streams",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL 30 MINUTE
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts, event_id,
                   CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_no
            FROM flagged
        )
        SELECT user_id, session_no,
               CAST(count(*) AS BIGINT) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM sessions GROUP BY user_id, session_no
    """,
    headline=True,
    doc="Gap-based sessionization (30-min inactivity): lag → flag → cumulative sum → "
    "session aggregate. One shuffle on user_id serves all three window steps (same "
    "partitioning), then the groupBy reuses it.",
)
def sessionize_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                # microsecond-exact gap comparison (matches DuckDB's
                # interval arithmetic; casting to seconds would truncate).
                # cast("timestamp_ltz"): unix_micros rejects TIMESTAMP_NTZ,
                # and the testdata parquet may carry either type; with the
                # session tz pinned to UTC the cast is a reinterpretation.
                F.unix_micros(F.col("ts").cast("timestamp_ltz"))
                - F.unix_micros(F.lag("ts").over(w).cast("timestamp_ltz"))
                > 30 * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@REG.add(
    "asof_join_last_signup",
    oracle="""
        SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        ON p.user_id = s.user_id AND s.ts <= p.ts
    """,
    headline=True,
    doc="As-of join: each purchase matched to the latest signup at-or-before it. "
    "Implemented as union + last-non-null window (one sort per user) rather than an "
    "inequality range join — O(n log n) per key instead of O(n*m); this is the plan "
    "that survives 100x scale. Oracle uses DuckDB's native ASOF JOIN.",
)
def asof_join_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    both = ev.where(F.col("event_type").isin("purchase", "signup")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("signup_marker"),
    )
    # At equal ts a signup is visible to a purchase (ASOF uses <=), so
    # signups sort before purchases on ties.
    w = (
        W.partitionBy("user_id")
        .orderBy(
            "ts",
            F.when(F.col("event_type") == "signup", 0).otherwise(1),
            "event_id",
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tagged = both.withColumn(
        "signup_ts", F.last("signup_marker", ignorenulls=True).over(w)
    )
    return tagged.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "signup_ts"
    )
