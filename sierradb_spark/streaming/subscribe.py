"""Subscriptions: ESUB / EPSUB as Structured Streaming reads.

The reference's subscription task (``sierradb-cluster/src/
subscription.rs:402-438``) is a hand-rolled state machine: read history
from DB iterators, switch to the live broadcast bus, dedup the seam,
re-read history on broadcast lag. Spark's file streaming source IS that
state machine: the checkpoint tracks which files were delivered, a
backfill (catch-up) and the live tail are the same code path, and the
seam is exact by construction — no ``has_seen`` dedup needed
(subscription.rs:101-293 becomes the source's offset log).

Mapping (SURVEY §2.3):
- ESUB (S1)  → StreamMatcher: filter to streams, per-stream FROM versions
- EPSUB (S2) → PartitionMatcher: filter to partitions, FROM sequences
- catch-up→live (S3) → file source backfill then tail, one checkpoint
- seam dedup (S4) → source offsets (exact)
- EACK window (S5) → maxFilesPerTrigger + checkpoint commit as the ack
- broadcast bus (S6) → not needed; the source polls the table

Ordered delivery: within a micro-batch rows are sorted by
(partition_id, partition_sequence); across micro-batches file order is
append order because ingest commits files in sequence order. Per-stream
order follows because a stream lives in one partition and version order
is sequence order within a stream (gapless assignment invariant).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Iterable, Mapping, Optional

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from sierradb_spark.eventstore.store import EventStore


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

    def dataframe(self) -> DataFrame:
        """The filtered streaming DataFrame (pre-delivery-ordering).

        Uses the static EVENT_SCHEMA (not inference), so a subscription
        can be created before the store's first append — matching the
        reference, where subscribing to an empty stream is legal
        (subscription.rs:402-438 just waits for live events).
        """
        from sierradb_spark.eventstore.schema import EVENT_SCHEMA

        reader = self.store.spark.readStream.schema(EVENT_SCHEMA)
        if self.max_files_per_trigger:
            # The EACK window (S5): bounds in-flight work per trigger the
            # way `cursor - last_ack > window` bounds unacked deliveries.
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        df = reader.parquet(self.store.events_path)
        return df.where(self.matcher.predicate())

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

        Deliveries are gated on the confirmed watermark, exactly like
        the batch read paths (subscription gate subscription.rs:512-524):
        the file source tails the events *directory*, which can briefly
        contain files whose commit manifest has not landed yet. Rows
        above the watermark are parked in a driver-side pending buffer
        and delivered on the trigger after their commit completes —
        held back, never dropped (the file source marks files processed
        once, so dropping would lose them)."""

        pending: list[Row] = []

        def process(batch: DataFrame, batch_id: int) -> None:
            wm = self.store._wm()
            candidates = pending + batch.collect()
            pending.clear()
            ready = []
            for r in candidates:
                if r["partition_sequence"] <= wm.get(r["partition_id"], -1):
                    ready.append(r)
                else:
                    pending.append(r)
            ready.sort(key=lambda r: (r["partition_id"], r["partition_sequence"]))
            if ready:
                deliver(ready)

        writer = (
            self.dataframe()
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
