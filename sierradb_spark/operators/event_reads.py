"""SierraDB read patterns re-expressed over the driver's analytic event table.

The driver's ``events`` table (event_id BIGINT, ts TIMESTAMP, user_id
BIGINT, event_type STRING, value DOUBLE, props STRING) is a generic
event stream; we map the reference's five read patterns onto it
(SURVEY §2.2) with: stream := user_id, stream position := event_id
(monotone, unique), partition_id := user_id % 32 (the reference's
hash-mod routing, eappend.rs:197 with num_partitions=32).

Every query here is the *shape* Catalyst must optimize well at 100 TB:
point lookups prune on the filter column (parquet min/max + dictionary
pushdown), range scans push both bounds into the scan, heads queries
are partial-aggregated map-side before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark.registry import Registry, load

REG = Registry()

N_PARTITIONS = 32


@REG.add(
    "eget_point_lookup",
    oracle="SELECT event_id, ts, user_id, event_type, value, props FROM events WHERE event_id = 500",
    doc="EGET (R1): point lookup by event id. Reference: request/eget.rs, database.rs:127-207. "
    "At scale: parquet predicate pushdown + column stats prune to one row group.",
)
def eget_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.where(F.col("event_id") == 500).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


@REG.add(
    "escan_stream_range",
    oracle="""
        SELECT event_id, ts, event_type, round(value, 2) AS value_r
        FROM events
        WHERE user_id = 7 AND event_id BETWEEN 100 AND 5000
    """,
    doc="ESCAN (R2): range scan of one stream by position. Reference: request/escan.rs:105-162, "
    "iter.rs:151-256. Both range bounds push down to the scan.",
)
def escan_stream_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.where((F.col("user_id") == 7) & F.col("event_id").between(100, 5000))
        .select(
            "event_id",
            "ts",
            "event_type",
            F.round("value", 2).alias("value_r"),
        )
    )


@REG.add(
    "escan_reverse_limit",
    oracle="""
        SELECT event_id, event_type FROM events
        WHERE user_id = 3 ORDER BY event_id DESC LIMIT 50
    """,
    doc="ESCAN reverse + COUNT (R2/R6/R7): reverse iteration with batch limit. "
    "Reference: IterDirection::Reverse lib.rs:130-134, COUNT read.rs:663-697. "
    "Spark: orderBy desc + limit = TakeOrderedAndProject (top-k, no full sort).",
)
def escan_reverse_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.where(F.col("user_id") == 3)
        .select("event_id", "event_type")
        .orderBy(F.col("event_id").desc())
        .limit(50)
    )


@REG.add(
    "epscan_partition_range",
    oracle=f"""
        SELECT user_id % {N_PARTITIONS} AS partition_id, event_id, user_id, event_type
        FROM events
        WHERE user_id % {N_PARTITIONS} = 5 AND event_id BETWEEN 1000 AND 8000
    """,
    doc="EPSCAN (R3): sequence-range scan of one partition. Reference: request/epscan.rs:90-136. "
    "On the real event table partition_id is the hive partition column → directory pruning.",
)
def epscan_partition_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    pid = (F.col("user_id") % N_PARTITIONS).cast("long")
    return (
        ev.where((pid == 5) & F.col("event_id").between(1000, 8000))
        .select(
            pid.alias("partition_id"),
            "event_id",
            "user_id",
            "event_type",
        )
    )


@REG.add(
    "esver_stream_heads",
    oracle="""
        SELECT user_id AS stream_id,
               max(event_id) AS head_position,
               CAST(count(*) AS BIGINT) AS n_events,
               max(ts) AS last_ts
        FROM events GROUP BY user_id
    """,
    headline=True,
    doc="ESVER (R4): latest position per stream — the stream-heads table the write path "
    "joins against. Reference: request/esver.rs, database.rs:298-358. Partial agg map-side; "
    "shuffle carries one row per stream, not per event.",
)
def esver_stream_heads(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.col("user_id").alias("stream_id")).agg(
        F.max("event_id").alias("head_position"),
        F.count("*").alias("n_events"),
        F.max("ts").alias("last_ts"),
    )


@REG.add(
    "epseq_partition_heads",
    oracle=f"""
        SELECT user_id % {N_PARTITIONS} AS partition_id,
               max(event_id) AS head_sequence,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id % {N_PARTITIONS}
    """,
    doc="EPSEQ (R5): latest sequence per partition. Reference: request/epseq.rs, "
    "database.rs:228-277. On the store's table this is served O(partitions) from the "
    "watermark side table.",
)
def epseq_partition_heads(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    pid = (F.col("user_id") % N_PARTITIONS).cast("long")
    return ev.groupBy(pid.alias("partition_id")).agg(
        F.max("event_id").alias("head_sequence"),
        F.count("*").alias("n_events"),
    )


@REG.add(
    "watermark_gated_scan",
    oracle=f"""
        WITH wm AS (
            SELECT user_id % {N_PARTITIONS} AS partition_id,
                   max(event_id) - 50 AS confirmed_sequence
            FROM events GROUP BY user_id % {N_PARTITIONS}
        )
        SELECT e.user_id % {N_PARTITIONS} AS partition_id,
               CAST(count(*) AS BIGINT) AS visible_events,
               max(e.event_id) AS visible_head
        FROM events e JOIN wm ON e.user_id % {N_PARTITIONS} = wm.partition_id
        WHERE e.event_id <= wm.confirmed_sequence
        GROUP BY e.user_id % {N_PARTITIONS}
    """,
    headline=True,
    doc="Watermark-gated visibility (R9): readers only see positions ≤ the per-partition "
    "confirmed watermark. Reference: confirmation.rs:769-800, read.rs:460-496. The watermark "
    "side is tiny → broadcast join, map-side filter, no shuffle of the event table.",
)
def watermark_gated_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "partition_id", (F.col("user_id") % N_PARTITIONS).cast("long")
    )
    wm = ev.groupBy("partition_id").agg(
        (F.max("event_id") - 50).alias("confirmed_sequence")
    )
    return (
        ev.join(F.broadcast(wm), "partition_id")
        .where(F.col("event_id") <= F.col("confirmed_sequence"))
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("visible_events"),
            F.max("event_id").alias("visible_head"),
        )
    )
