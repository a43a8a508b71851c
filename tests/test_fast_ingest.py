"""Fast-path (pure-JVM) bulk ingest: invariants match the pandas path.

The fast path activates when a DataFrame append carries no
expected_version column (no optimistic-concurrency preconditions) —
assignment is two window functions over one hash(partition_id)
exchange. These tests pin the invariants the reference enforces in its
writer thread (writer_thread_pool.rs:560-645): gapless per-partition
sequences, gapless per-stream versions, cross-batch continuity, and
request-validation rejections that consume nothing.
"""

import pytest
from pyspark.sql import functions as F

from sierradb_spark.config import EngineConfig
from sierradb_spark.eventstore import EventStore


@pytest.fixture()
def store(spark, tmp_path):
    return EventStore(spark, str(tmp_path / "store"), EngineConfig(shuffle_partitions=8))


def _mk_reqs(spark, n, streams, tag=""):
    return spark.range(n).select(
        F.concat(F.lit(f"fast{tag}-"), (F.col("id") % streams).cast("string")).alias(
            "stream_id"
        ),
        F.lit("E").alias("event_name"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("payload"),
    )


def _assert_gapless(store):
    ev = store.events()
    per_stream = (
        ev.groupBy("stream_id")
        .agg(
            F.count("*").alias("n"),
            F.min("stream_version").alias("lo"),
            F.max("stream_version").alias("hi"),
            F.count_distinct("stream_version").alias("d"),
        )
        .collect()
    )
    for r in per_stream:
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1 and r["d"] == r["n"], r
    per_part = (
        ev.groupBy("partition_id")
        .agg(
            F.count("*").alias("n"),
            F.min("partition_sequence").alias("lo"),
            F.max("partition_sequence").alias("hi"),
            F.count_distinct("partition_sequence").alias("d"),
        )
        .collect()
    )
    for r in per_part:
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1 and r["d"] == r["n"], r
        assert store.partition_sequence(r["partition_id"]) == r["hi"]


def test_fast_path_gapless_and_continuous(store, spark):
    res1 = store.append_df(_mk_reqs(spark, 500, 20))
    assert res1.where("NOT accepted").count() == 0
    _assert_gapless(store)
    # Second batch must continue versions/sequences exactly.
    res2 = store.append_df(_mk_reqs(spark, 300, 20))
    assert res2.where("NOT accepted").count() == 0
    _assert_gapless(store)
    # Heads agree with the events table (ESVER parity).
    for r in (
        store.events()
        .groupBy("stream_id")
        .agg(F.max("stream_version").alias("v"))
        .collect()
    ):
        assert store.stream_version(r["stream_id"]) == r["v"]


def test_fast_path_rejects_bad_event_id_without_consuming(store, spark):
    good = _mk_reqs(spark, 50, 5)
    # event_id with a partition hash that cannot match (all-zero uuid).
    bad = spark.range(3).select(
        F.lit("fast-0").alias("stream_id"),
        F.lit("E").alias("event_name"),
        F.lit(b"x").alias("payload"),
    ).withColumn("event_id", F.lit("00000000-0000-7000-8000-000000000000"))
    res = store.append_df(good.withColumn("event_id", F.lit(None).cast("string")).unionByName(bad))
    rej = res.where("NOT accepted").collect()
    assert len(rej) == 3
    assert all("partition hash" in r["error"] for r in rej)
    assert res.where("accepted").count() == 50
    _assert_gapless(store)


def test_fast_path_matches_row_api_semantics(store, spark):
    """Interleave fast-path DF appends with row-API appends: shared
    version/sequence spaces stay consistent."""
    from sierradb_spark.eventstore import AppendRequest

    store.append_df(_mk_reqs(spark, 100, 4))
    # fast-1 holds ids 1,5,...,97 → 25 events, head version 24.
    res = store.append([AppendRequest("fast-1", "E", expected_version="24")])
    assert res[0].accepted and res[0].stream_version == 25
    res = store.append([AppendRequest("fast-1", "E", expected_version="7")])
    assert not res[0].accepted
    _assert_gapless(store)


def test_fast_path_validation_rejections(store, spark):
    long_stream = "s" * 100
    df = spark.createDataFrame(
        [
            ("ok-stream", "E"),
            (long_stream, "E"),
            ("ok-stream", "N" * 300),
        ],
        "stream_id string, event_name string",
    )
    res = store.append_df(df)
    errs = {r["stream_id"]: r["error"] for r in res.where("NOT accepted").collect()}
    assert errs[long_stream] == "stream_id must be 1-64 chars"
    assert errs["ok-stream"] == "event_name too long"
    assert res.where("accepted").count() == 1
