"""Streaming exactly-once id dedup: dropDuplicatesWithinWatermark.

The ingestion seam dedups replays via source offsets + the delivery
cursor (streaming/subscribe.py); this pins the OTHER standard tool —
Structured Streaming's watermarked duplicate drop — for pipelines whose
at-least-once upstream can re-deliver the same event id across
micro-batches: ids recurring within the watermark are dropped even
across batch boundaries, with bounded (watermark-sized) state.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

_SCHEMA = "event_id long, ts timestamp, value double"


def _write_batch(dirpath: str, name: str, rows: list[tuple]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    tbl = pa.table(
        {
            "event_id": [r[0] for r in rows],
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "value": [r[2] for r in rows],
        }
    )
    pq.write_table(tbl, os.path.join(dirpath, name))


def test_duplicate_ids_across_batches_dropped(spark, tmp_path):
    from datetime import datetime

    t0 = datetime(2026, 1, 1, 12, 0, 0)

    def at(s):
        return datetime(2026, 1, 1, 12, 0, s)

    src = str(tmp_path / "src")
    # batch 0: ids 1-4; batch 1 re-delivers 2-4 (same ids, same times —
    # an upstream retry) plus new ids 5-6.
    _write_batch(src, "b0.parquet", [(i, at(i), float(i)) for i in (1, 2, 3, 4)])
    _write_batch(
        src,
        "b1.parquet",
        [(i, at(i), float(i)) for i in (2, 3, 4)]
        + [(i, at(i), float(i)) for i in (5, 6)],
    )

    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force separate micro-batches
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.read.schema(_SCHEMA)
        .parquet(out)
        .groupBy("event_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    counts = {r["event_id"]: r["n"] for r in got}
    assert counts == {i: 1 for i in (1, 2, 3, 4, 5, 6)}, counts
