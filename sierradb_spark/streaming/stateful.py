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
            # emits only streams touched this batch).
            updated = batch.cache()
            try:
                if os.path.exists(self.out_path):
                    old = spark.read.parquet(self.out_path)
                    merged = old.join(
                        updated.select("stream_id"), "stream_id", "left_anti"
                    ).unionByName(updated)
                else:
                    merged = updated
                tmp = f"{self.out_path}.tmp-{secrets.token_hex(4)}"
                try:
                    merged.write.mode("overwrite").parquet(tmp)
                    snap = spark.read.parquet(tmp)
                    snap.write.mode("overwrite").parquet(self.out_path)
                finally:
                    import shutil

                    shutil.rmtree(tmp, ignore_errors=True)
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

    def heads(self) -> DataFrame:
        return self.store.spark.read.parquet(self.out_path)
