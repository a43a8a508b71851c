"""Event-time windowed streaming: watermarks, late data, stream dedup.

The reference has NO event-time windowing — its "watermark" is a
replication-confirmation watermark (SURVEY §2.7: ordering is by
sequence, not time). These operators are the extension surface a
Spark-native engine adds on top: tumbling/sliding event-time
aggregation with late-data bounds, and watermark-bounded streaming
deduplication (the generalization of the reference's ``has_seen`` seam
dedup, subscription.rs:101-293, to arbitrary key spaces).

Scale notes: event-time state is per (window, key) — the watermark is
what lets the state store evict closed windows, keeping state O(open
windows x keys) instead of O(history). Without it a 100 TB stream's
aggregation state grows without bound; that eviction contract is
exactly what the tests pin down (late rows below the watermark are
dropped, finalized windows never change).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: Optional[str] = None,
    watermark: str = "10 minutes",
    time_col: str = "ts",
    key_col: str = "event_type",
    value_col: Optional[str] = "value",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) event-time aggregation
    with a late-data watermark. ``value_col=None`` (or a frame without
    the column) aggregates counts only — the store's own EVENT_SCHEMA
    stream has no numeric value column.

    In append output mode a window is emitted exactly once — when the
    watermark passes its end — and events arriving later than
    ``watermark`` behind the max seen event time are dropped, which is
    the state-eviction bound that keeps streaming aggregation state
    finite.
    """
    w = (
        F.window(F.col(time_col), window, slide)
        if slide
        else F.window(F.col(time_col), window)
    )
    aggs = [F.count("*").alias("n_events")]
    if value_col is not None and value_col in events.columns:
        aggs.append(F.round(F.sum(value_col), 2).alias("total_value"))
    out_cols = [
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        key_col,
        "n_events",
    ] + (["total_value"] if len(aggs) > 1 else [])
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(w.alias("win"), F.col(key_col))
        .agg(*aggs)
        .select(*out_cols)
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "event_id",
    left_time: str = "ts",
    right_time: str = "ts",
    watermark: str = "10 minutes",
    within: str = "5 minutes",
) -> DataFrame:
    """Stream-stream interval join: a right-stream event matches a
    left-stream event with the same key when it arrives in
    ``[left_ts, left_ts + within]`` — the attribution-join shape
    (impression→click, order→payment, request→response).

    Both sides carry watermarks, and the time-range condition is what
    bounds the join STATE: a left row can stop waiting for matches once
    the watermark passes ``left_ts + within`` (and symmetrically for
    the right), so state is O(events per horizon), not O(stream
    history). A right event arriving later than the watermark allows
    finds its left partner already evicted and is dropped — matched
    pairs are emitted exactly once and never retro-appear.
    """
    l = left.withWatermark(left_time, watermark).alias("l")
    r = right.withWatermark(right_time, watermark).alias("r")
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond).select(
        F.col(f"l.{key_col}").alias(key_col),
        lt.alias("left_ts"),
        rt.alias("right_ts"),
        (rt.cast("long") - lt.cast("long")).alias("delay_seconds"),
    )


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    watermark: str = "10 minutes",
    time_col: str = "ts",
) -> DataFrame:
    """Watermark-bounded exactly-once-per-key delivery.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes, so dedup state is O(keys per watermark horizon) —
    the streaming generalization of the reference's catch-up/live seam
    dedup (``matcher.has_seen``), which only needed to remember one
    position per subscription key.
    """
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
    time_col: str = "ts",
    key_col: str = "event_type",
    value_col: Optional[str] = "value",
) -> DataFrame:
    """Session-window event-time aggregation: a session is a run of
    events per key with no silence longer than ``gap``; the window
    closes — and its state evicts — once the watermark passes the last
    event plus the gap. Dynamic windows (unlike tumbling/sliding, the
    bounds come from the data), which is exactly why they need the
    watermark: without it, an idle key's open session pins state
    forever. The batch analogue is the ``sessionize_streams`` registry
    query; this is its streaming twin.
    """
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(
            F.session_window(F.col(time_col), gap).alias("win"),
            F.col(key_col),
        )
        .agg(*(
            [F.count("*").alias("n_events")]
            + (
                [F.round(F.sum(value_col), 2).alias("total_value")]
                if value_col is not None and value_col in events.columns
                else []
            )
        ))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            "n_events",
            *(
                ["total_value"]
                if value_col is not None and value_col in events.columns
                else []
            ),
        )
    )
