"""Subscriptions: ESUB / EPSUB as Structured Streaming reads.

The reference's subscription task (``sierradb-cluster/src/
subscription.rs:402-438``) is a hand-rolled state machine: read history
from DB iterators, switch to the live broadcast bus, dedup the seam,
re-read history on broadcast lag. Here the streaming source is the
store's MANIFEST LOG (``_commits/*.json``), so a micro-batch can only
ever reference committed event files: the watermark gate is satisfied
by construction (exactly like the batch read paths), an orphaned file
from a crashed writer is never delivered, and there is no in-memory
pending buffer to lose on restart. A durable per-partition delivery
cursor (persisted beside the checkpoint, advanced from each manifest's
own watermark map) makes the seam exact across restarts and across
compaction's file rewrites.

Mapping (SURVEY §2.3):
- ESUB (S1)  → StreamMatcher: filter to streams, per-stream FROM versions
- EPSUB (S2) → PartitionMatcher: filter to partitions, FROM sequences
- catch-up→live (S3) → manifest-log backfill then tail, one checkpoint
- seam dedup (S4) → source offsets + durable delivery cursor (exact)
- EACK window (S5) → maxFilesPerTrigger (commits/trigger) + cursor as ack
- broadcast bus (S6) → not needed; the source polls the manifest log

Ordered delivery: within a micro-batch rows are sorted by
(partition_id, partition_sequence); across micro-batches file order is
append order because ingest commits files in sequence order. Per-stream
order follows because a stream lives in one partition and version order
is sequence order within a stream (gapless assignment invariant).
"""

from __future__ import annotations

import json
import os
import secrets
from dataclasses import dataclass, field
from typing import Callable, Iterable, Mapping, Optional

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from sierradb_spark.eventstore.store import EventStore

# What the subscription needs from each manifest: which files the commit
# added and the confirmed watermark it advanced to.
_MANIFEST_STREAM_SCHEMA = (
    "commit long, base boolean, events_add array<string>, "
    "watermarks map<string, long>"
)


@dataclass(frozen=True)
class StreamMatcher:
    """ESUB matcher (SubscriptionMatcher::Stream/Streams,
    subscription.rs:79-110). ``from_versions``: stream_id → first
    version to deliver (inclusive); streams absent from the map start
    from 0 (FROM DEFAULT). FROM LATEST is resolved by the caller via
    ``EventStore.stream_version() + 1``."""

    streams: tuple[str, ...]
    from_versions: Mapping[str, int] = field(default_factory=dict)

    def predicate(self) -> F.Column:
        cond = F.col("stream_id").isin(*self.streams)
        gates = None
        for sid in self.streams:
            start = int(self.from_versions.get(sid, 0))
            g = (F.col("stream_id") == sid) & (F.col("stream_version") >= start)
            gates = g if gates is None else (gates | g)
        return cond & gates if gates is not None else cond


@dataclass(frozen=True)
class PartitionMatcher:
    """EPSUB matcher: ``partitions=None`` = all (``EPSUB *``,
    PartitionRange::expand request.rs:518-555); ``from_sequences``:
    partition_id → first sequence to deliver (inclusive), with
    ``default_from`` for unlisted partitions (FromSequenceSpec DEFAULT,
    request.rs:556-572)."""

    partitions: Optional[tuple[int, ...]] = None
    from_sequences: Mapping[int, int] = field(default_factory=dict)
    default_from: int = 0

    def predicate(self) -> F.Column:
        cond = F.lit(True)
        if self.partitions is not None:
            cond = F.col("partition_id").isin(*[int(p) for p in self.partitions])
        gate = F.col("partition_sequence") >= F.lit(int(self.default_from))
        for pid, start in self.from_sequences.items():
            gate = F.when(
                F.col("partition_id") == int(pid),
                F.col("partition_sequence") >= int(start),
            ).otherwise(gate)
        return cond & gate


class Subscription:
    """A running subscription over an EventStore table."""

    def __init__(
        self,
        store: EventStore,
        matcher: StreamMatcher | PartitionMatcher,
        max_files_per_trigger: int | None = None,
    ) -> None:
        self.store = store
        self.matcher = matcher
        self.max_files_per_trigger = max_files_per_trigger

    def manifest_stream(self) -> DataFrame:
        """The streaming source: the manifest log, not the raw directory.

        Tailing ``_commits/`` means a micro-batch can only ever name
        manifest-committed event files — an orphaned parquet file from a
        crashed writer is simply never referenced, so the old
        above-watermark pending buffer is gone by construction (the
        batch read paths get the same guarantee from the same manifests).
        A subscription created before the store's first append just
        waits for the first manifest — subscribing to an empty stream is
        legal, as in the reference (subscription.rs:402-438).
        """
        reader = self.store.spark.readStream.schema(_MANIFEST_STREAM_SCHEMA)
        if self.max_files_per_trigger:
            # The EACK window (S5): bounds commits in flight per trigger
            # the way `cursor - last_ack > window` bounds unacked
            # deliveries (one manifest == one group commit).
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        return reader.json(self.store.commits_path)

    # --- durable delivery cursor --------------------------------------------

    @staticmethod
    def _cursor_path(checkpoint: str) -> str:
        return os.path.join(checkpoint, "delivered_watermarks.json")

    def _load_cursor(self, checkpoint: str) -> dict[int, int]:
        try:
            with open(self._cursor_path(checkpoint)) as f:
                return {int(k): int(v) for k, v in json.load(f).items()}
        except FileNotFoundError:
            return {}

    def _save_cursor(self, checkpoint: str, cur: dict[int, int]) -> None:
        path = self._cursor_path(checkpoint)
        tmp = f"{path}.tmp-{secrets.token_hex(4)}"
        with open(tmp, "w") as f:
            json.dump({str(k): int(v) for k, v in cur.items()}, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    def start(
        self,
        deliver: Callable[[list[Row]], None],
        checkpoint: str,
        available_now: bool = True,
        trigger_interval: str | None = None,
    ) -> StreamingQuery:
        """Deliver matched events, ordered within each micro-batch by
        (partition_id, partition_sequence) — the reference's per-
        partition ordered delivery (subscription.rs:441-460).

        Each micro-batch is a set of manifests; the batch reads exactly
        the event files those commits added, filters to the matcher, and
        gates on a durable per-partition delivery cursor persisted next
        to the checkpoint. The cursor advances to the manifests' own
        confirmed watermarks after ``deliver`` returns, which makes
        delivery exact across restarts AND across compaction: a ``base``
        manifest re-references already-delivered (rewritten) files, and
        the cursor filters every re-listed row out. Redelivery is
        possible only if the process dies between ``deliver`` returning
        and the cursor write — the standard checkpoint-as-ack window
        (EACK semantics, eack.rs:39-51)."""
        from sierradb_spark.eventstore.schema import EVENT_SCHEMA

        def process(batch: DataFrame, batch_id: int) -> None:
            manifests = batch.collect()  # O(commits per trigger) tiny rows
            if not manifests:
                return
            manifests.sort(key=lambda m: m["commit"])
            files = [f for m in manifests for f in (m["events_add"] or ())]
            if not files:
                return
            cursor = self._load_cursor(checkpoint)
            paths = [os.path.join(self.store.events_path, p) for p in files]
            events = (
                self.store.spark.read.schema(EVENT_SCHEMA)
                .option("basePath", self.store.events_path)
                .parquet(*paths)
            )
            # Cursor gate (JVM-side literal map): drops rows already
            # delivered before a restart or re-listed by a base manifest.
            gate = F.col("partition_sequence") > EventStore._wm_col(cursor)
            ready = (
                events.where(gate & self.matcher.predicate())
                .orderBy("partition_id", "partition_sequence")
                .collect()
            )
            if ready:
                deliver(ready)
            # Advance to the newest manifest's confirmed watermarks —
            # covers every row in the batch's files, matched or not.
            for k, v in (manifests[-1]["watermarks"] or {}).items():
                cursor[int(k)] = max(int(v), cursor.get(int(k), -1))
            self._save_cursor(checkpoint, cursor)

        writer = (
            self.manifest_stream()
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_interval:
            writer = writer.trigger(processingTime=trigger_interval)
        return writer.start()

    def catchup(
        self,
        deliver: Callable[[list[Row]], None],
        checkpoint: str,
        timeout_s: float = 300.0,
    ) -> None:
        """Run one catch-up pass (availableNow) to the current end of the
        table and wait for completion — the synchronous, testable form of
        the catch-up→live loop. Call repeatedly with the same checkpoint
        to tail: each call delivers exactly the events appended since the
        previous call (the seam is the checkpoint, so no duplicates and
        no gaps — S4's guarantee)."""
        q = self.start(deliver, checkpoint, available_now=True)
        try:
            q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()
