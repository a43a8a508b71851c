"""Pure-Python unit tests for the ID scheme and version truth table.

Mirrors the reference's inline tests (id.rs:100-188) and the
ExpectedVersion::gap_from table (sierradb-protocol/src/lib.rs:47-72).
"""

from __future__ import annotations

import uuid

import pytest

from sierradb_spark import ids
from sierradb_spark import versions as V


def test_partition_key_is_uuid5_of_namespace():
    # namespace = uuid5(NAMESPACE_DNS, "sierradb.tqwewe.com")
    assert ids.NAMESPACE_PARTITION_KEY == uuid.uuid5(
        uuid.NAMESPACE_DNS, "sierradb.tqwewe.com"
    )
    k1 = ids.partition_key_for_stream("user-123")
    k2 = ids.partition_key_for_stream("user-123")
    assert k1 == k2  # deterministic


def test_uuid_v7_embeds_and_extracts_hash():
    for h in [0, 1, 0xFFFF, 0xABCD, 1234]:
        u = ids.uuid_v7_with_partition_hash(
            h, timestamp_ms=1_700_000_000_000, rand12=0xABC, rand46=0x123456789A
        )
        assert ids.uuid_to_partition_hash(u) == h
        assert ids.validate_event_id(u, h)
        assert not ids.validate_event_id(u, (h + 1) & 0xFFFF)
        # version/variant bits per the reference's (non-RFC) layout
        # [ts:48][rand:12][version:4 @ bits 67-64][variant:2 @ bits 63-62]
        # (id.rs:38-43 — "inspired by v7", version not at the RFC position)
        assert (u.int >> 64) & 0xF == 0x7
        assert (u.int >> 62) & 0x3 == 0b10


def test_uuid_v7_timestamp_prefix_sorts():
    u1 = ids.uuid_v7_with_partition_hash(5, timestamp_ms=1000, rand12=0, rand46=0)
    u2 = ids.uuid_v7_with_partition_hash(5, timestamp_ms=2000, rand12=0, rand46=0)
    assert u1.bytes < u2.bytes


def test_uuid_flag_bit():
    u = uuid.uuid4()
    flagged = ids.set_uuid_flag(u, True)
    assert ids.get_uuid_flag(flagged)
    unflagged = ids.set_uuid_flag(flagged, False)
    assert not ids.get_uuid_flag(unflagged)
    # only byte 8's MSB differs
    assert flagged.bytes[:8] == u.bytes[:8]
    assert flagged.bytes[9:] == u.bytes[9:]


def test_hash_distribution_over_buckets():
    # mirror id.rs:165-187 — uuid5-derived hashes spread evenly
    num_buckets = 64
    counts = [0] * num_buckets
    for i in range(10_000):
        h = ids.uuid_to_partition_hash(ids.partition_key_for_stream(f"s-{i}"))
        counts[h % num_buckets] += 1
    avg = sum(counts) / num_buckets
    std = (sum((c - avg) ** 2 for c in counts) / num_buckets) ** 0.5
    assert std < avg * 0.15


GAP_CASES = [
    # (expected, current, kind, by)
    ("any", None, "none", 0),
    ("any", 5, "none", 0),
    ("exists", None, "incompatible", 0),
    ("exists", 5, "none", 0),
    ("empty", None, "none", 0),
    ("empty", 4, "ahead", 5),
    (3, None, "behind", 4),
    (3, 3, "none", 0),
    (5, 3, "behind", 2),
    (3, 5, "ahead", 2),
]


@pytest.mark.parametrize("expected,current,kind,by", GAP_CASES)
def test_gap_from_truth_table(expected, current, kind, by):
    gap = V.gap_from(expected, current)
    assert gap.kind == kind
    if kind in ("ahead", "behind"):
        assert gap.by == by


def test_strict_mode():
    assert V.is_strict_allowed("empty")
    assert V.is_strict_allowed(7)
    assert not V.is_strict_allowed("any")
    assert not V.is_strict_allowed("exists")


def test_next_version():
    assert V.next_version(None) == 0
    assert V.next_version(0) == 1
    assert V.next_version(41) == 42
