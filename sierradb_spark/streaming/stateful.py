"""Custom stateful streaming operators (applyInPandasWithState).

The reference keeps per-stream/per-partition heads in live indexes
updated by the writer thread (``writer_thread_pool.rs:43-54`` LiveIndexSet)
so ESVER/EPSEQ are O(1) reads. The streaming-native equivalent is a
stateful operator over the event stream: per-key state carries the
running head, each micro-batch folds its events in, and the operator
emits updated heads — a continuously-maintained materialized view.

This is the `applyInPandasWithState` shape for ANY custom stateful
operator over the event stream (counters, session state, CDC snapshots):
Arrow batches in, explicit typed state, incremental emission. State is
checkpointed by the engine; a restarted query resumes exactly.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sierradb_spark.eventstore.store import EventStore

HEADS_OUTPUT_SCHEMA = (
    "stream_id string, head_version long, n_events long, partition_id int"
)
HEADS_STATE_SCHEMA = "head_version long, n_events long, partition_id int"


def _update_stream_head(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold a micro-batch's events for one stream into its head state."""
    (stream_id,) = key
    if state.exists:
        head, n, pid = state.get
    else:
        head, n, pid = -1, 0, -1
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        head = max(head, int(pdf["stream_version"].max()))
        n += len(pdf)
        pid = int(pdf["partition_id"].iloc[0])
    state.update((head, n, pid))
    yield pd.DataFrame(
        {
            "stream_id": [stream_id],
            "head_version": [head],
            "n_events": [n],
            "partition_id": [pid],
        }
    )


def stream_heads_view(events_stream: DataFrame) -> DataFrame:
    """Continuously-maintained per-stream heads (the live stream index)."""
    return (
        events_stream.select("stream_id", "stream_version", "partition_id")
        .groupBy("stream_id")
        .applyInPandasWithState(
            _update_stream_head,
            outputStructType=HEADS_OUTPUT_SCHEMA,
            stateStructType=HEADS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class StreamHeadsMaintainer:
    """Run the heads view over a store's COMMITTED events; results land
    in a parquet-backed snapshot readable between runs (the O(1) ESVER
    path).

    The stateful query must never see uncommitted data: the raw
    ``events/`` directory contains a crashed/CAS-losing writer's orphan
    files (invisible to every manifest-driven reader) and compaction's
    rewritten ``compact-*`` files (which re-contain all history — a file
    stream would double-count every event). So the feed is a
    manifest-driven subscription SINK: ``catchup_to_sink`` appends
    exactly the committed events, exactly once per commit, to a
    dedicated directory the stateful query tails. Orphans never land
    there and compaction never rewrites it.
    """

    def __init__(self, store: EventStore, out_path: str) -> None:
        self.store = store
        self.out_path = out_path
        self.feed_path = out_path + "_feed"

    def run_once(self, checkpoint: str, timeout_s: float = 300.0) -> None:
        """One availableNow pass: advance the committed-events feed, fold
        the new events into heads state, and merge the emissions into the
        snapshot. State survives restarts via the checkpoint."""
        import os
        import secrets

        from sierradb_spark.streaming.subscribe import (
            PartitionMatcher,
            Subscription,
        )

        spark = self.store.spark
        # 1. Manifest-driven feed: only committed events, exactly once.
        Subscription(self.store, PartitionMatcher()).catchup_to_sink(
            self.feed_path, checkpoint + "_feed"
        )
        if not os.path.isdir(self.feed_path):
            return  # empty store: nothing to fold yet
        from sierradb_spark.streaming.subscribe import sink_schema

        src = spark.readStream.schema(sink_schema()).parquet(self.feed_path)
        heads = stream_heads_view(src)

        def sink(batch: DataFrame, _bid: int) -> None:
            # Merge updated keys into the snapshot (update output mode
            # emits only streams touched this batch). Publication is
            # versioned-dir + atomic pointer (the store's manifest
            # pattern), NOT overwrite-in-place: overwriting the live
            # snapshot deletes it before rewriting, and a crash in that
            # window — before the streaming checkpoint committed the
            # batch — would lose every stream the replayed batch does
            # not touch (update mode never re-emits untouched keys).
            # With the pointer, readers and the merge itself only ever
            # see a fully-written version; the replay just publishes a
            # fresh version and re-points.
            updated = batch.cache()
            try:
                current = self._current_version()
                if current is not None:
                    old = spark.read.parquet(current)
                    merged = old.join(
                        updated.select("stream_id"), "stream_id", "left_anti"
                    ).unionByName(updated)
                else:
                    merged = updated
                vdir = os.path.join(
                    self.out_path, f"v-{secrets.token_hex(4)}"
                )
                merged.write.mode("overwrite").parquet(vdir)
                ptr_tmp = os.path.join(
                    self.out_path, f".ptr-{secrets.token_hex(4)}"
                )
                with open(ptr_tmp, "w") as f:
                    f.write(os.path.basename(vdir))
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(ptr_tmp, os.path.join(self.out_path, "CURRENT"))
                # Sweep only after the new pointer is live; a crash
                # before this leaves harmless extras. The JUST-superseded
                # version is retained for one publication cycle: a
                # concurrent heads() reader that resolved the old pointer
                # moments before the re-point must be able to finish its
                # scan; it is deleted on the next publication (by then no
                # reader can still hold it without having re-read
                # CURRENT). Orphan .ptr-* files (crash between tmp write
                # and os.replace) are swept here too — os.replace
                # consumed THIS publication's tmp, so any .ptr-* present
                # is a dead leftover.
                import shutil

                prev = (
                    os.path.basename(current) if current is not None else None
                )
                for d in os.listdir(self.out_path):
                    p = os.path.join(self.out_path, d)
                    if d.startswith(".ptr-") and os.path.isfile(p):
                        os.remove(p)
                    elif (
                        d.startswith("v-")
                        and p != vdir
                        and d != prev
                        and os.path.isdir(p)
                    ):
                        shutil.rmtree(p, ignore_errors=True)
            finally:
                updated.unpersist()

        q: StreamingQuery = (
            heads.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()

    def _current_version(self) -> "str | None":
        """Path of the pointed-to snapshot version, or None if no
        snapshot has been published yet."""
        import os

        ptr = os.path.join(self.out_path, "CURRENT")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            name = f.read().strip()
        path = os.path.join(self.out_path, name)
        return path if os.path.isdir(path) else None

    def heads(self) -> DataFrame:
        current = self._current_version()
        if current is None:
            raise FileNotFoundError(
                f"no heads snapshot published under {self.out_path}"
            )
        return self.store.spark.read.parquet(current)
