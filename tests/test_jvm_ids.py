"""JVM-side ID generation must be bit-exact with the Python scheme."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from sierradb_spark import ids


def test_uuid5_col_matches_python(spark):
    streams = [f"user-{i}" for i in range(100)] + ["a", "αβγ-unicode", "x" * 64]
    df = spark.createDataFrame([(s,) for s in streams], "stream_id string")
    rows = df.select("stream_id", ids.uuid5_col("stream_id").alias("k")).collect()
    for r in rows:
        assert r["k"] == str(ids.partition_key_for_stream(r["stream_id"]))


def test_event_and_txn_id_cols_valid(spark):
    df = spark.createDataFrame(
        [(f"s-{i}",) for i in range(100)], "stream_id string"
    ).select(
        "stream_id", ids.uuid_hash_col(ids.uuid5_col("stream_id")).alias("h")
    )
    out = df.select(
        "h",
        ids.event_id_col(F.col("h"), F.lit(1_700_000_000_000)).alias("eid"),
        ids.txn_id_col(True).alias("flagged"),
        ids.txn_id_col(False).alias("unflagged"),
    ).collect()
    for r in out:
        u = uuid.UUID(r["eid"])
        # embedded hash, version 7, variant 10, 48-bit ms timestamp
        assert ids.uuid_to_partition_hash(u) == r["h"]
        assert (u.int >> 64) & 0xF == 0x7
        assert (u.int >> 62) & 0x3 == 0b10
        assert u.int >> 80 == 1_700_000_000_000
        t, t0 = uuid.UUID(r["flagged"]), uuid.UUID(r["unflagged"])
        assert ids.get_uuid_flag(t) and not ids.get_uuid_flag(t0)
        assert t.hex[12] == "4" and t0.hex[12] == "4"  # v4 nibble
    # ids must actually differ across rows (randomness plumbed through)
    assert len({r["eid"] for r in out}) == len(out)
    assert len({r["flagged"] for r in out}) == len(out)
