"""Streaming PSI drift monitor: cross-validation against a batch
recomputation over the identical (reference, current) split.

The same (key, seq, bin) table must produce an IDENTICAL final PSI —
the histograms are exact integers and the smoothing formula runs in a
fixed bin order — whether folded in one pass or streamed chunk by
chunk through ``psi_drift_stream`` with engine-checkpointed state
across restarts; replayed (late) rows must be counted and skipped.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sierradb_spark.streaming.drift import (
    PSI_BINS,
    psi_drift_stream,
    psi_from_counts,
)

SF = "/root/testdata/sf0.001"
REF_TARGET = 120


def _binned(spark):
    """(key, seq, bin): per-type arrival order by (ts, event_id); bins
    from the global value bounds — the upstream contract the monitor
    documents (binning fixed at deploy time)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    b = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    raw = F.floor(
        (F.col("value") - F.col("mn"))
        / F.nullif(F.col("mx") - F.col("mn"), F.lit(0.0))
        * PSI_BINS
    )
    return ev.crossJoin(F.broadcast(b)).select(
        F.col("event_type").alias("key"),
        (F.row_number().over(w) - 1).cast("long").alias("seq"),
        F.coalesce(
            F.least(F.lit(PSI_BINS - 1), F.greatest(F.lit(0), raw)).cast(
                "int"
            ),
            F.lit(0),
        ).alias("bin"),
    )


def _run_chunk(spark, chunk_df, land, ckpt, out):
    chunk_df.coalesce(1).write.mode("append").parquet(land)
    src = spark.readStream.schema("key string, seq long, bin int").parquet(
        land
    )
    q = (
        psi_drift_stream(src, ref_target=REF_TARGET)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive


def _batch_psi(rows):
    """Direct recomputation: reference = first REF_TARGET rows per key
    in seq order, current = the rest; same smoothing, same bin order."""
    ref = [0] * PSI_BINS
    cur = [0] * PSI_BINS
    for i, b in enumerate(rows):
        (ref if i < REF_TARGET else cur)[b] += 1
    return psi_from_counts(ref, cur), sum(cur)


def test_stream_psi_matches_batch_split_across_restarts(spark, tmp_path):
    binned = _binned(spark).cache()
    max_seq = binned.agg(F.max("seq")).head()[0]
    cuts = [max_seq // 3, 2 * max_seq // 3, max_seq]
    land, ckpt, out = (str(tmp_path / d) for d in ("land", "ckpt", "out"))
    lo = -1
    for hi in cuts:
        chunk = binned.where(
            (F.col("seq") <= F.lit(hi)) & (F.col("seq") > F.lit(lo))
        )
        _run_chunk(spark, chunk, land, ckpt, out)
        lo = hi

    res = spark.read.parquet(out)
    assert res.where("late_rows > 0").count() == 0
    final = {
        r["key"]: (r["ref_n"], r["cur_n"], r["psi"], r["ready"])
        for r in res.orderBy("cur_n")
        .groupBy("key")
        .agg(
            F.max("ref_n").alias("ref_n"),
            F.max("cur_n").alias("cur_n"),
            F.last("psi").alias("psi"),
            F.last("ready").alias("ready"),
        )
        .collect()
    }
    for key, rows in (
        (k, [r["bin"] for r in binned.where(F.col("key") == k)
             .orderBy("seq").collect()])
        for k in final
    ):
        want_psi, want_cur = _batch_psi(rows)
        ref_n, cur_n, psi, ready = final[key]
        assert ready and ref_n == REF_TARGET and cur_n == want_cur, key
        assert psi == want_psi, (key, psi, want_psi)  # bit-for-bit


def test_out_of_range_bins_are_invalid_not_folded(spark, tmp_path):
    """A poison upstream row with bin outside [0, PSI_BINS) must neither
    wedge the streaming query (bin >= PSI_BINS would IndexError inside
    applyInPandasWithState) nor corrupt the histograms (bin = -1 would
    silently increment the LAST bin): it routes to the late/invalid
    counter and the PSI is bit-identical to the poison-free run."""
    binned = _binned(spark).where(F.col("key") == "view").cache()
    max_seq = binned.agg(F.max("seq")).head()[0]

    clean = (str(tmp_path / "c_land"), str(tmp_path / "c_ckpt"),
             str(tmp_path / "c_out"))
    _run_chunk(spark, binned, *clean)
    want = {
        (r["ref_n"], r["cur_n"], r["psi"])
        for r in spark.read.parquet(clean[2]).collect()
    }

    poison = spark.createDataFrame(
        [("view", int(max_seq) + 1, -1),
         ("view", int(max_seq) + 2, PSI_BINS),
         # poison seq AND poison bin: must not poison the high-water
         ("view", 2**40, PSI_BINS + 7),
         # NULLs arrive as NaN in the Arrow batch; int(NaN) would raise
         ("view", None, 2),
         ("view", int(max_seq) + 4, None)],
        "key string, seq long, bin int",
    )
    dirty = (str(tmp_path / "d_land"), str(tmp_path / "d_ckpt"),
             str(tmp_path / "d_out"))
    _run_chunk(spark, binned, *dirty)
    _run_chunk(spark, poison, *dirty)  # must not raise / wedge

    res = spark.read.parquet(dirty[2]).orderBy("cur_n").collect()
    last = [r for r in res if r["late_rows"] > 0]
    assert len(last) == 1 and last[0]["late_rows"] == 5
    assert last[0]["batch_rows"] == 0  # nothing folded
    assert (last[0]["ref_n"], last[0]["cur_n"], last[0]["psi"]) in want

    # invalid rows left the high-water alone: the next VALID rows —
    # with seqs far below the poison row's 2**40 — still fold.
    tail = spark.createDataFrame(
        [("view", int(max_seq) + 10, 0), ("view", int(max_seq) + 11, 1)],
        "key string, seq long, bin int",
    )
    _run_chunk(spark, tail, *dirty)
    res2 = spark.read.parquet(dirty[2]).collect()
    folded = [r for r in res2 if r["batch_rows"] == 2 and r["late_rows"] == 0]
    assert folded, "valid rows after poison were wrongly skipped"
    binned.unpersist()


def test_replayed_chunk_is_late_not_folded(spark, tmp_path):
    binned = _binned(spark).where(F.col("key") == "view").cache()
    land, ckpt, out = (str(tmp_path / d) for d in ("land", "ckpt", "out"))
    _run_chunk(spark, binned, land, ckpt, out)
    before = {
        (r["ref_n"], r["cur_n"], r["psi"])
        for r in spark.read.parquet(out).collect()
    }
    # replay the same rows: all late, state untouched, psi unchanged
    _run_chunk(spark, binned, land, ckpt, out)
    res = spark.read.parquet(out).orderBy("cur_n").collect()
    replay = [r for r in res if r["late_rows"] > 0]
    assert len(replay) == 1
    r = replay[0]
    assert r["batch_rows"] == 0 and r["late_rows"] == binned.count()
    assert (r["ref_n"], r["cur_n"], r["psi"]) in before
    binned.unpersist()
