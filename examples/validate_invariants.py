"""Store invariant checker — the analogue of the reference's
``crates/sierradb/examples/validate_partition_sequences.rs`` (a runnable
tool that walks a database and asserts its core invariants), extended to
every invariant this engine maintains:

1. gapless per-partition sequences 0..N with no duplicates;
2. gapless per-stream versions 0..M with no duplicates;
3. every confirmed watermark equals its partition's max sequence;
4. the heads log agrees with the events table on every stream head;
5. every manifest-referenced file exists on disk;
6. stats()['total_events'] (watermark arithmetic) equals the scan count.

All checks are single aggregations over the committed table — run it
against any store directory after a crash, a compaction, or a doubted
migration. Exit code 0 = all invariants hold.

Run: PYTHONPATH=/root/repo python examples/validate_invariants.py <store_path>
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sierradb_spark.eventstore import EventStore  # noqa: E402
from sierradb_spark.session import get_spark  # noqa: E402


def validate(store: EventStore) -> dict:
    """Returns {check_name: problem_count}; all zeros = healthy."""
    ev = store.events()
    problems: dict[str, int] = {}

    # 1. gapless partition sequences: count == max+1 == distinct count
    part = ev.groupBy("partition_id").agg(
        F.count("*").alias("n"),
        F.max("partition_sequence").alias("hi"),
        F.count_distinct("partition_sequence").alias("d"),
        F.min("partition_sequence").alias("lo"),
    )
    problems["partition_sequence_gaps"] = part.where(
        (F.col("hi") != F.col("n") - 1)
        | (F.col("d") != F.col("n"))
        | (F.col("lo") != 0)
    ).count()

    # 2. gapless stream versions
    stream = ev.groupBy("stream_id").agg(
        F.count("*").alias("n"),
        F.max("stream_version").alias("hi"),
        F.count_distinct("stream_version").alias("d"),
        F.min("stream_version").alias("lo"),
    )
    problems["stream_version_gaps"] = stream.where(
        (F.col("hi") != F.col("n") - 1)
        | (F.col("d") != F.col("n"))
        | (F.col("lo") != 0)
    ).count()

    # 3. watermark == max sequence per partition
    wm = store.watermarks()
    heads = ev.groupBy("partition_id").agg(
        F.max("partition_sequence").alias("hi")
    )
    problems["watermark_mismatch"] = (
        wm.join(heads, "partition_id", "full")
        .where(
            F.col("confirmed_sequence").isNull()
            | F.col("hi").isNull()
            | (F.col("confirmed_sequence") != F.col("hi"))
        )
        .count()
    )

    # 4. heads log agrees with the events table (latest-wins per stream)
    hl = (
        store.heads()
        .groupBy("stream_id")
        .agg(F.max("stream_version").alias("head_v"))
    )
    sv = ev.groupBy("stream_id").agg(F.max("stream_version").alias("ev_v"))
    problems["heads_log_mismatch"] = (
        hl.join(sv, "stream_id", "full")
        .where(
            F.col("head_v").isNull()
            | F.col("ev_v").isNull()
            | (F.col("head_v") != F.col("ev_v"))
        )
        .count()
    )

    # 5. manifest-referenced files exist
    state = store._read_state()
    missing = [
        rel
        for rel in state.events_files
        if not os.path.exists(os.path.join(store.events_path, rel))
    ] + [
        rel
        for rel in state.heads_files
        if not os.path.exists(os.path.join(store.heads_path, rel))
    ]
    problems["missing_referenced_files"] = len(missing)

    # 6. watermark arithmetic equals the scan count
    problems["stats_count_mismatch"] = int(
        store.stats()["total_events"] != ev.count()
    )
    return problems


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    spark = get_spark(app_name="validate-invariants", shuffle_partitions=8)
    store = EventStore(spark, sys.argv[1])
    problems = validate(store)
    ok = True
    for check, n in problems.items():
        status = "ok " if n == 0 else "FAIL"
        print(f"{status} {check}: {n} problem(s)")
        ok = ok and n == 0
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
