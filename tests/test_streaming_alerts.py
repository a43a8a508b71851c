"""Streaming EWMA alerting: cross-validation against the batch fold.

The same daily table must produce IDENTICAL final state (level, sigma
to the batch query's 4-decimal rounding — the underlying doubles are
bit-equal by construction) and the same anomaly count, whether folded
by the batch ``ewma_anomaly_daily`` query or streamed day-chunk by
day-chunk through ``anomaly_alert_stream`` with engine-checkpointed
state across restarts.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from sierradb_spark.operators.timeseries import ewma_anomaly_daily
from sierradb_spark.streaming.alerts import anomaly_alert_stream

SF = "/root/testdata/sf0.001"


def _daily(spark):
    """The exact daily table the batch query folds (rounded sums)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    return (
        ev.groupBy(
            F.col("event_type").alias("key"), F.to_date("ts").alias("day")
        )
        .agg(F.round(F.sum("value"), 6).alias("y"))
        .orderBy("day", "key")
    )


def _run_chunk(spark, chunk_df, land, ckpt, out):
    """Land one day-chunk as a file and drain it with availableNow —
    one micro-batch boundary per call, state restored from ckpt."""
    n = len(glob.glob(os.path.join(land, "part*")))
    chunk_df.coalesce(1).write.mode("append").parquet(land)
    src = (
        spark.readStream.schema("key string, day date, y double")
        .parquet(land)
    )
    q = (
        anomaly_alert_stream(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive


def test_stream_matches_batch_fold_across_restarts(spark, tmp_path):
    daily = _daily(spark).cache()
    days = sorted(r["day"] for r in daily.select("day").distinct().collect())
    assert len(days) >= 12
    cuts = [
        days[len(days) // 4],
        days[len(days) // 2],
        days[3 * len(days) // 4],
        days[-1],
    ]
    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "alerts")
    lo = None
    for hi in cuts:
        chunk = daily.where(
            (F.col("day") <= F.lit(hi))
            & (F.lit(True) if lo is None else (F.col("day") > F.lit(lo)))
        )
        _run_chunk(spark, chunk, land, ckpt, out)
        lo = hi

    alerts = spark.read.parquet(out)
    # no duplicates, nothing late, one row per (key, day)
    assert alerts.count() == daily.count()
    assert alerts.where("late").count() == 0
    # final streaming state per key == batch query output
    last = (
        alerts.orderBy("day")
        .groupBy("key")
        .agg(
            F.max("n_days").alias("n_days"),
            F.last("ewma_level").alias("level"),
            F.last("ewma_sigma").alias("sigma"),
            F.max("anomaly_days").alias("anomaly_days"),
        )
    )
    got = {
        r["key"]: (
            r["n_days"],
            round(r["level"], 4),
            round(r["sigma"], 4),
            r["anomaly_days"],
        )
        for r in last.collect()
    }
    want = {
        r["event_type"]: (
            r["n_days"],
            r["ewma_level"],
            r["ewma_sigma"],
            r["anomaly_days"],
        )
        for r in ewma_anomaly_daily(spark, SF).collect()
    }
    assert got == want
    daily.unpersist()


def test_poison_rows_route_invalid_without_corrupting_state(spark, tmp_path):
    """NaT days (would raise in toordinal and wedge the query) and
    NaN/inf values (would silently poison mu/var for every later day)
    must route out with late=true, leaving the recurrence bit-identical
    to a poison-free fold — including for VALID days arriving after the
    poison."""
    daily = _daily(spark).where(F.col("key") == "view").cache()
    days = sorted(r["day"] for r in daily.select("day").distinct().collect())
    mid = days[len(days) // 2]

    clean = (str(tmp_path / "c_land"), str(tmp_path / "c_ckpt"),
             str(tmp_path / "c_out"))
    _run_chunk(spark, daily, *clean)
    want = {
        (r["n_days"], round(r["ewma_level"], 10), r["anomaly_days"])
        for r in spark.read.parquet(clean[2])
        .orderBy("day").groupBy("key")
        .agg(F.max("n_days").alias("n_days"),
             F.last("ewma_level").alias("ewma_level"),
             F.max("anomaly_days").alias("anomaly_days"))
        .collect()
    }

    dirty = (str(tmp_path / "d_land"), str(tmp_path / "d_ckpt"),
             str(tmp_path / "d_out"))
    first_half = daily.where(F.col("day") <= F.lit(mid))
    _run_chunk(spark, first_half, *dirty)
    poison = spark.createDataFrame(
        [("view", None, 1.0),            # NaT day
         ("view", days[-1], float("nan")),   # NaN value
         ("view", days[-1], float("inf"))],  # inf value
        "key string, day date, y double",
    )
    _run_chunk(spark, poison, *dirty)  # must not raise / wedge
    _run_chunk(spark, daily.where(F.col("day") > F.lit(mid)), *dirty)

    res = spark.read.parquet(dirty[2])
    assert res.where("late").count() == 3  # all three routed invalid
    got = {
        (r["n_days"], round(r["ewma_level"], 10), r["anomaly_days"])
        for r in res.where(~F.col("late"))
        .orderBy("day").groupBy("key")
        .agg(F.max("n_days").alias("n_days"),
             F.last("ewma_level").alias("ewma_level"),
             F.max("anomaly_days").alias("anomaly_days"))
        .collect()
    }
    assert got == want  # recurrence unpoisoned, high-water untouched
    daily.unpersist()


def test_late_day_passes_through_without_touching_state(spark, tmp_path):
    daily = _daily(spark).cache()
    days = sorted(r["day"] for r in daily.select("day").distinct().collect())
    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "alerts")
    # fold everything, then replay the FIRST day again (out of order)
    _run_chunk(spark, daily, land, ckpt, out)
    replay = daily.where(F.col("day") == F.lit(days[0]))
    _run_chunk(spark, replay, land, ckpt, out)

    alerts = spark.read.parquet(out)
    late = alerts.where("late")
    assert late.count() == replay.count()
    # state untouched: the late rows report the pre-existing day count
    n_per_key = {
        r["key"]: r["mx"]
        for r in alerts.where(~F.col("late"))
        .groupBy("key")
        .agg(F.max("n_days").alias("mx"))
        .collect()
    }
    for r in late.collect():
        assert r["n_days"] == n_per_key[r["key"]]
        assert r["ewma_sigma"] is None
    daily.unpersist()
