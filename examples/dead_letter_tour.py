"""Dead-letter-queue tour — the poison-message lifecycle in one script.

The reference surfaces rejected appends as per-request RESP3 errors to
a connected client (crates/sierradb-server/src/request.rs); a queue-fed
streaming pipeline has no one to tell, so StreamIngest's dead-letter
table IS that error channel. This tour walks its whole contract:

1. ingest a batch with poison rows → rejects land in the DLQ, durable
   BEFORE the manifest commit;
2. read through ``read_dead_letters`` (the contract reader), never raw
   parquet — and see why, by forging the one artifact the pre-commit
   write ordering can leave behind (letters for a batch whose commit
   never landed);
3. ``prune_dead_letters`` sweeps orphans and empty batch dirs;
4. the checkpoint-reset recipe: prune a retired DLQ BEFORE restarting
   a stream whose checkpoint was deleted (the commitment proof is
   scoped to one checkpoint incarnation).

Run:  PYTHONPATH=/root/repo python examples/dead_letter_tour.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sierradb_spark.eventstore import EventStore  # noqa: E402
from sierradb_spark.session import get_spark  # noqa: E402
from sierradb_spark.streaming import (  # noqa: E402
    StreamIngest,
    prune_dead_letters,
    read_dead_letters,
)

SCHEMA = (
    "stream_id string, event_name string, payload binary, "
    "metadata binary, expected_version string"
)


def main() -> int:
    spark = get_spark(app_name="dead_letter_tour", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="dlq_tour_")
    store = EventStore(spark, os.path.join(root, "store"))
    src = os.path.join(root, "src")
    dlq = os.path.join(root, "dlq")
    ckpt = os.path.join(root, "ckpt")
    try:
        # -- 1. a micro-batch with two poison rows ----------------------
        spark.createDataFrame(
            [
                ("orders-1", "OrderPlaced", b'{"ok":1}', b"", "any"),
                (None, "OrderPlaced", b'{"poison":"null stream"}', b"", "any"),
                ("orders-2", "x" * 300, b'{"poison":"name too long"}', b"", "any"),
                ("orders-3", "OrderPlaced", b'{"ok":2}', b"", "any"),
            ],
            SCHEMA,
        ).write.parquet(os.path.join(src, "f0"))
        q = StreamIngest(store).start(
            spark.readStream.schema(SCHEMA).parquet(os.path.join(src, "f0")),
            checkpoint=ckpt,
            available_now=True,
            dead_letter_dir=dlq,
        )
        q.awaitTermination(300)
        n_events = store.events().count()
        letters = read_dead_letters(store, dlq)
        print(f"events committed: {n_events} (expected 2)")
        print("dead letters (contract read):")
        letters.select("stream_id", "event_name", "error").show(truncate=40)
        assert n_events == 2 and letters.count() == 2

        # -- 2. why the contract reader: forge the crash artifact -------
        # A crash between the pre-commit letter write and the manifest
        # rename leaves letters for a batch that never committed. Raw
        # parquet cannot tell them apart; the batch_token can.
        (committed_token,) = store._read_state().batch_tokens
        key = committed_token.rpartition("-")[0]
        orphan_dir = os.path.join(dlq, "batch=7")
        spark.read.parquet(os.path.join(dlq, "batch=0")).withColumn(
            "batch_token", F.lit(f"{key}-7")
        ).write.mode("overwrite").parquet(orphan_dir)
        raw_n = spark.read.parquet(dlq).count()
        contract_n = read_dead_letters(store, dlq).count()
        print(f"after forging a crash orphan: raw read sees {raw_n} letters, "
              f"contract read sees {contract_n}")
        assert raw_n == 4 and contract_n == 2

        # -- 3. physical sweep ------------------------------------------
        removed = prune_dead_letters(store, dlq)
        print(f"prune_dead_letters removed: {removed}")
        assert removed["orphaned"] == 1 and not os.path.exists(orphan_dir)

        # -- 4. checkpoint-reset recipe ----------------------------------
        # The commitment proof (token in chain, or batch id <= the key's
        # newest committed id) is scoped to ONE incarnation of the
        # checkpoint: after a reset, batch ids restart at 0 under the
        # same path-derived key — by design, so replaying the same
        # source cannot duplicate events. Retiring the DLQ at the same
        # time? Prune it FIRST, while orphans are still discriminable.
        prune_dead_letters(store, dlq)  # the recipe (idempotent here)
        shutil.rmtree(ckpt)
        q2 = StreamIngest(store).start(
            spark.readStream.schema(SCHEMA).parquet(os.path.join(src, "f0")),
            checkpoint=ckpt,
            available_now=True,
            dead_letter_dir=os.path.join(root, "dlq2"),
        )
        q2.awaitTermination(300)
        n_after = store.events().count()
        print(f"events after checkpoint reset + same-source replay: {n_after} "
              "(still 2 — the replayed batch matched its committed token)")
        assert n_after == 2
        # A missing/empty DLQ reads as an empty table, not an exception.
        assert read_dead_letters(store, os.path.join(root, "nowhere")).count() == 0
        print("tour complete: every assertion held")
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
