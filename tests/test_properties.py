"""Property-based tests (hypothesis) for the pure-Python kernel: the
UUID bit scheme (id.rs parity) and the ExpectedVersion truth table
(protocol lib.rs parity). These are the semantics every engine layer
rests on; the fuzzer exercises them through the store, this exercises
them directly over the full input space.
"""

from __future__ import annotations

import uuid

from hypothesis import given, settings
from hypothesis import strategies as st

from sierradb_spark import ids
from sierradb_spark import versions as V


@settings(max_examples=300, deadline=None)
@given(
    phash=st.integers(0, 0xFFFF),
    ts=st.integers(0, (1 << 48) - 1),
    r12=st.integers(0, (1 << 12) - 1),
    r46=st.integers(0, (1 << 46) - 1),
)
def test_event_id_roundtrips_hash_and_timestamp(phash, ts, r12, r46):
    """uuid_v7_with_partition_hash embeds (timestamp, hash) recoverably
    for EVERY 16-bit hash and 48-bit timestamp, and always carries the
    v7/variant bits (id.rs:11-48)."""
    u = ids.uuid_v7_with_partition_hash(
        phash, timestamp_ms=ts, rand12=r12, rand46=r46
    )
    assert ids.uuid_to_partition_hash(u) == phash
    assert ids.validate_event_id(str(u), phash)
    assert u.int >> 80 == ts
    assert (u.int >> 64) & 0xF == 0x7
    assert (u.int >> 62) & 0x3 == 0b10


@settings(max_examples=300, deadline=None)
@given(phash=st.integers(0, 0xFFFF), n=st.integers(1, 1 << 16))
def test_partition_id_in_range(phash, n):
    pid = ids.partition_id_for_hash(phash, n)
    assert 0 <= pid < n
    assert pid == phash % n


@settings(max_examples=300, deadline=None)
@given(flag=st.booleans())
def test_uuid_flag_roundtrip(flag):
    src = uuid.uuid4()
    u = ids.set_uuid_flag(src, flag)
    assert ids.get_uuid_flag(u) == flag
    # flag manipulation touches ONLY byte 8's MSB: version nibble
    # (bits 76-79) and every other bit are preserved
    assert (u.int >> 76) & 0xF == 0x4
    assert u.int | (1 << 63) == src.int | (1 << 63)
    # idempotent and invertible
    assert ids.set_uuid_flag(u, flag) == u
    assert ids.get_uuid_flag(ids.set_uuid_flag(u, not flag)) == (not flag)


@settings(max_examples=500, deadline=None)
@given(
    expected=st.one_of(
        st.sampled_from(["any", "empty", "exists"]),
        st.integers(0, 50).map(str),
    ),
    current=st.one_of(st.none(), st.integers(0, 50)),
)
def test_expected_version_truth_table(expected, current):
    """The full ExpectedVersion x CurrentVersion truth table (protocol
    lib.rs): 'any' always passes; 'empty' iff stream absent; 'exists'
    iff present; an exact number iff it equals the current head.
    next_version is None->0, v->v+1."""
    e = V.parse_expected_version(expected)
    sat = V.is_satisfied_by(e, current)
    if expected == "any":
        assert sat
    elif expected == "empty":
        assert sat == (current is None)
    elif expected == "exists":
        assert sat == (current is not None)
    else:
        assert sat == (current is not None and int(expected) == current)
    if sat:
        nv = V.next_version(current)
        assert nv == (0 if current is None else current + 1)


@settings(max_examples=200, deadline=None)
@given(
    stream_id=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        min_size=1,
        max_size=64,
    )
)
def test_stream_routing_deterministic_and_stable(stream_id):
    """uuid5 routing: same stream always lands in the same partition,
    and the key is the RFC-4122 uuid5 of the stream id under the
    reference's namespace (id.rs:9)."""
    k1 = ids.partition_key_for_stream(stream_id)
    k2 = ids.partition_key_for_stream(stream_id)
    assert k1 == k2
    h = ids.uuid_to_partition_hash(k1)
    assert 0 <= h <= 0xFFFF
    assert ids.partition_id_for_hash(h, 32) == h % 32
