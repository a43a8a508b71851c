"""EventStore read-path pruning: the EGET/ESCAN partition-pruning claim,
asserted on the physical plan.

The reference prunes by construction (key -> hash -> partition -> bucket
arithmetic, id.rs:51-54); our equivalent is a hive PartitionFilter on
``partition_id`` plus parquet pushdown on the stream/version predicates.
A regression here (e.g. events() losing the basePath option) would make
every point read scan the whole table — correct results, 100 TB disaster.
"""

from __future__ import annotations

import re

import pytest

from sierradb_spark.config import EngineConfig
from sierradb_spark.eventstore import AppendRequest, EventStore


@pytest.fixture()
def store(spark, tmp_path):
    s = EventStore(spark, str(tmp_path / "store"), EngineConfig(shuffle_partitions=8))
    s.append([AppendRequest(f"s-{i}", "E", payload=b"x") for i in range(40)])
    return s


def _filters(df) -> tuple[str, str]:
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "8000")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    part = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    return (part.group(1) if part else "", pushed.group(1) if pushed else "")


def test_scan_prunes_to_one_partition(store):
    part, pushed = _filters(store.scan("s-1"))
    assert re.search(r"partition_id#\d+ = \d+", part), part
    assert "EqualTo(stream_id,s-1)" in pushed, pushed


def test_scan_pushes_version_range(store):
    part, pushed = _filters(store.scan("s-1", 2, 9))
    assert re.search(r"partition_id#\d+ = \d+", part), part
    assert "GreaterThanOrEqual(stream_version,2)" in pushed, pushed
    assert "LessThanOrEqual(stream_version,9)" in pushed, pushed


def test_get_prunes_by_uuid_hash(store):
    eid = store.scan("s-3").collect()[0]["event_id"]
    part, pushed = _filters(store.get(eid))
    assert re.search(r"partition_id#\d+ = \d+", part), part


def test_pscan_prunes_and_pushes_sequence(store):
    pid = store.scan("s-1").collect()[0]["partition_id"]
    part, pushed = _filters(store.pscan(pid, 0, 3))
    assert f"partition_id#" in part and f"= {pid}" in part, part
    assert "LessThanOrEqual(partition_sequence,3)" in pushed, pushed
