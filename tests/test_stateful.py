"""applyInPandasWithState stream-heads maintenance tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sierradb_spark.config import EngineConfig
from sierradb_spark.eventstore import AppendRequest, EventStore
from sierradb_spark.streaming.stateful import StreamHeadsMaintainer


@pytest.fixture()
def store(spark, tmp_path):
    return EventStore(spark, str(tmp_path / "store"), EngineConfig(shuffle_partitions=8))


def _expected_heads(store):
    return {
        r["stream_id"]: (r["head"], r["n"])
        for r in store.events()
        .groupBy("stream_id")
        .agg(F.max("stream_version").alias("head"), F.count("*").alias("n"))
        .collect()
    }


def test_stream_heads_maintained_incrementally(store, tmp_path):
    store.append([AppendRequest(f"h-{i % 5}", "E") for i in range(50)])
    m = StreamHeadsMaintainer(store, str(tmp_path / "heads"))
    ckpt = str(tmp_path / "ckpt")
    m.run_once(ckpt)
    got = {
        r["stream_id"]: (r["head_version"], r["n_events"])
        for r in m.heads().collect()
    }
    assert got == _expected_heads(store)

    # incremental: state must carry across the restart (n_events is a
    # running count — wrong unless prior state was restored)
    store.append([AppendRequest(f"h-{i % 3}", "E") for i in range(21)])
    m.run_once(ckpt)
    got = {
        r["stream_id"]: (r["head_version"], r["n_events"])
        for r in m.heads().collect()
    }
    assert got == _expected_heads(store)


def test_heads_view_ignores_orphans_and_compaction_rewrites(store, tmp_path):
    """The stateful fold must see only COMMITTED events, each exactly
    once: an orphaned uncommitted parquet file in events/ must not fold
    into heads state, and compaction's rewritten files (re-containing
    all history) must not double n_events."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    store.append([AppendRequest(f"o-{i % 3}", "E") for i in range(12)])
    # Forge a crashed writer's orphan: an unreferenced copy of a
    # committed file, full of events the manifest never committed.
    [src] = _glob.glob(store.events_path + "/partition_id=*/*.parquet")[:1]
    _shutil.copy(src, _os.path.join(_os.path.dirname(src), "orphan-x.parquet"))

    m = StreamHeadsMaintainer(store, str(tmp_path / "heads"))
    ckpt = str(tmp_path / "ckpt")
    m.run_once(ckpt)
    assert {
        r["stream_id"]: (r["head_version"], r["n_events"])
        for r in m.heads().collect()
    } == _expected_heads(store)

    # Compaction rewrites every event into new files; a raw-directory
    # stream would re-fold all history. The committed feed must not.
    store.compact()
    store.append([AppendRequest("o-0", "post")])
    m.run_once(ckpt)
    assert {
        r["stream_id"]: (r["head_version"], r["n_events"])
        for r in m.heads().collect()
    } == _expected_heads(store)
