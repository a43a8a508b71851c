"""SierraDB ID scheme, re-implemented from observed behavior.

Reference semantics (all cited against /root/reference/):

- Default partition key: ``uuid5(NAMESPACE_PARTITION_KEY, stream_id)``
  (``crates/sierradb-server/src/request/eappend.rs:193-195``; namespace
  constant ``crates/sierradb/src/id.rs:9``).
- Event IDs are v7-style UUIDs with a 16-bit partition hash embedded in
  bits 46-61 of the 128-bit value (``id.rs:21-47``):
  [timestamp_ms:48][rand:12][version=7:4][variant=0b10:2][hash:16][rand:46]
- ``partition_hash`` is extracted from ANY uuid by reading bits 46-61
  (``id.rs:50-53``); for partition keys this doubles as the routing hash
  (``eappend.rs:192``).
- ``partition_id = partition_hash % num_partitions`` (``eappend.rs:197``),
  ``bucket_id = partition_id % num_buckets`` (``id.rs:63-69``).
- UUID flag bit: MSB of byte 8 (bit 65 counted from the MSB side), used
  to mark implicit-commit transactions (``id.rs:75-98``).

These are pure-Python (driver-side / ingest-side); the hash *extraction*
is also provided as a Column expression so EGET can prune partitions
JVM-side without a UDF.
"""

from __future__ import annotations

import uuid as _uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

# uuid5(NAMESPACE_DNS, "sierradb.tqwewe.com") — id.rs:8-9
NAMESPACE_PARTITION_KEY = _uuid.UUID("219bd637-e279-53e9-9e2b-eabe5d9120cc")


def partition_key_for_stream(stream_id: str) -> _uuid.UUID:
    """Default partition key: uuid5(namespace, stream_id). eappend.rs:193-195."""
    return _uuid.uuid5(NAMESPACE_PARTITION_KEY, stream_id)


def uuid_to_partition_hash(u: _uuid.UUID | str) -> int:
    """Extract the embedded 16-bit hash: bits 46-61 of the 128-bit value. id.rs:50-53."""
    if isinstance(u, str):
        u = _uuid.UUID(u)
    return (u.int >> 46) & 0xFFFF


def uuid_v7_with_partition_hash(
    partition_hash: int,
    *,
    timestamp_ms: int,
    rand12: int,
    rand46: int,
) -> _uuid.UUID:
    """v7-style UUID with embedded partition hash. id.rs:21-47.

    Randomness/timestamps are explicit parameters (caller supplies them)
    so ingest can be made deterministic under test; production callers
    pass ``int(time.time()*1000)`` and ``secrets.randbits``.
    """
    ts48 = timestamp_ms & 0xFFFFFFFFFFFF
    val = (
        (ts48 << 80)
        | ((rand12 & 0x0FFF) << 68)
        | (0x7 << 64)
        | (0x2 << 62)
        | ((partition_hash & 0xFFFF) << 46)
        | (rand46 & ((1 << 46) - 1))
    )
    return _uuid.UUID(int=val)


def new_event_id(partition_hash: int) -> _uuid.UUID:
    """Production event-id generator (non-deterministic)."""
    import secrets
    import time

    return uuid_v7_with_partition_hash(
        partition_hash,
        timestamp_ms=int(time.time() * 1000),
        rand12=secrets.randbits(12),
        rand46=secrets.randbits(46),
    )


def validate_event_id(event_id: _uuid.UUID | str, partition_hash: int) -> bool:
    """Event IDs must embed the routing hash. id.rs:71-73, database.rs:880.
    A string that is not a UUID at all is invalid, not a crash."""
    try:
        return uuid_to_partition_hash(event_id) == partition_hash
    except (ValueError, AttributeError, TypeError):
        return False


def partition_id_for_hash(partition_hash: int, num_partitions: int) -> int:
    """partition_id = hash % num_partitions. eappend.rs:197."""
    return partition_hash % num_partitions


def set_uuid_flag(u: _uuid.UUID, flag: bool) -> _uuid.UUID:
    """Set/clear the MSB of byte 8 (implicit-commit marker). id.rs:75-89."""
    b = bytearray(u.bytes)
    if flag:
        b[8] |= 0x80
    else:
        b[8] &= 0x7F
    return _uuid.UUID(bytes=bytes(b))


def get_uuid_flag(u: _uuid.UUID) -> bool:
    """id.rs:92-97."""
    return (u.bytes[8] & 0x80) != 0


# --- Column-expression variants (JVM-side, no UDF) ---------------------------


def uuid_hash_col(uuid_str_col: Column | str) -> Column:
    """Column expr extracting bits 46-61 from a canonical UUID string.

    The 16 embedded bits span hex nibbles: the UUID's 128-bit value
    >> 46 & 0xFFFF. Hex digit i (0-indexed from the left, dashes removed)
    holds bits (127-4i-3 .. 127-4i). Bits 61..46 live in hex digits
    16..20 (5 nibbles, shifted). Cheapest correct route: take hex chars
    17..21 (20 bits = bits 63..44), parse base-16, >>2 & 0xFFFF... but
    bits 63-62 are the variant; simpler: chars index 16..20 give bits
    63..44 → (v >> 2) & 0xFFFF drops bits 45-44 and masks the variant.
    """
    c = F.col(uuid_str_col) if isinstance(uuid_str_col, str) else uuid_str_col
    hex32 = F.lower(F.regexp_replace(c, "-", ""))
    # chars 17..21 (1-based substr): bits 63..44 of the 128-bit value
    top20 = F.conv(F.substring(hex32, 17, 5), 16, 10).cast("long")
    return (F.shiftright(top20, 2) % F.lit(1 << 16)).cast("int")


def partition_id_col(uuid_str_col: Column | str, num_partitions: int) -> Column:
    """partition_id from a uuid string column, for EGET pruning."""
    return F.pmod(uuid_hash_col(uuid_str_col), F.lit(num_partitions)).cast("int")


def _dashed(hex32: Column) -> Column:
    """Canonical 8-4-4-4-12 form from 32 hex chars."""
    return F.concat_ws(
        "-",
        F.substring(hex32, 1, 8),
        F.substring(hex32, 9, 4),
        F.substring(hex32, 13, 4),
        F.substring(hex32, 17, 4),
        F.substring(hex32, 21, 12),
    )


def _hex(value: Column, width: int) -> Column:
    """Non-negative long → fixed-width lowercase hex."""
    return F.lpad(F.lower(F.conv(value.cast("string"), 10, 16)), width, "0")


def uuid5_col(stream_id: Column | str) -> Column:
    """JVM-side uuid5(NAMESPACE_PARTITION_KEY, stream_id) — the default
    partition key (eappend.rs:193-195) with zero Python in the loop.

    uuid5 = SHA1(namespace_bytes || name_utf8)[0:16] with the version
    nibble forced to 5 (hex char 13) and the variant byte's top two bits
    forced to 0b10 ((b8 & 0x3f) | 0x80, hex chars 17-18). sha1/conv/
    substring are all codegen built-ins.
    """
    c = F.col(stream_id) if isinstance(stream_id, str) else stream_id
    digest = F.sha1(
        F.concat(F.lit(NAMESPACE_PARTITION_KEY.bytes), F.encode(c, "utf-8"))
    )
    b8 = F.conv(F.substring(digest, 17, 2), 16, 10).cast("int")
    variant = _hex((b8.bitwiseAND(F.lit(0x3F)).bitwiseOR(F.lit(0x80))).cast("long"), 2)
    hex32 = F.concat(
        F.substring(digest, 1, 12),
        F.lit("5"),
        F.substring(digest, 14, 3),
        variant,
        F.substring(digest, 19, 14),
    )
    return _dashed(hex32)


def event_id_col(
    partition_hash: Column, timestamp_ms: Column, seed: int | None = None
) -> Column:
    """JVM-side v7-with-embedded-hash event id (id.rs:21-47).

    Layout: [ts_ms:48][rand:12][ver=7:4][var=10:2][hash:16][rand:46].
    Randomness from F.rand() (rerolled on task retry — same caveat as
    any random id generator). The low 64 bits are assembled as two
    32-bit halves so conv() never sees a negative long.
    """
    rand12 = F.floor((F.rand(seed) if seed is not None else F.rand()) * (1 << 12)).cast("long")
    rand46 = (
        F.floor((F.rand(seed + 1) if seed is not None else F.rand()) * (1 << 23)).cast("long")
        * (1 << 23)
        + F.floor((F.rand(seed + 2) if seed is not None else F.rand()) * (1 << 23)).cast("long")
    )
    ts48 = _hex(timestamp_ms.cast("long").bitwiseAND(F.lit((1 << 48) - 1)), 12)
    # next 16 bits: rand12 then version nibble (always 7)
    mid16 = F.concat(_hex(rand12, 3), F.lit("7"))
    h = partition_hash.cast("long")
    high32 = (
        F.lit(0b10 << 30).cast("long")
        + F.shiftleft(h, 14)
        + F.shiftright(rand46, 32)
    )
    low32 = rand46.bitwiseAND(F.lit((1 << 32) - 1))
    return _dashed(F.concat(ts48, mid16, _hex(high32, 8), _hex(low32, 8)))


def txn_id_col(implicit_commit: bool, seed: int | None = None) -> Column:
    """JVM-side v4 transaction id with the implicit-commit flag as the
    MSB of byte 8 (id.rs:77-100): flagged ids draw the variant char from
    [89ab] (MSB set), unflagged from [0-7]."""

    def r(off: int) -> Column:
        return F.rand(seed + off) if seed is not None else F.rand()

    def rhex(off: int, nbits: int, width: int) -> Column:
        return _hex(F.floor(r(off) * (1 << nbits)).cast("long"), width)

    variant = (
        F.substring(F.lit("89ab"), (F.floor(r(3) * 4) + 1).cast("int"), 1)
        if implicit_commit
        else F.substring(F.lit("01234567"), (F.floor(r(3) * 8) + 1).cast("int"), 1)
    )
    hex32 = F.concat(
        rhex(0, 32, 8),
        rhex(1, 16, 4),
        F.lit("4"),
        rhex(2, 12, 3),
        variant,
        rhex(4, 12, 3),
        rhex(5, 24, 6),
        rhex(6, 24, 6),
    )
    return _dashed(hex32)
