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

from sierradb_spark.eventstore.commit_backend import fsync_dir
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


def sink_schema():
    """Schema of a ``start_to_sink``/``catchup_to_sink`` table:
    EVENT_SCHEMA plus the ``delivery_commit`` audit column. The ONE
    construction site — the empty-sink reader and the stateful heads
    feed both import this, so a future sink column can't silently
    diverge between them."""
    from pyspark.sql import types as T

    from sierradb_spark.eventstore.schema import EVENT_SCHEMA

    return T.StructType(
        EVENT_SCHEMA.fields
        + [T.StructField("delivery_commit", T.LongType(), True)]
    )


def _sink_read_schema():
    """sink_schema + the ``commit`` layout column (the ``commit=<n>``
    directory each delivery batch writes into; negative = a compaction
    fold)."""
    from pyspark.sql import types as T

    return T.StructType(
        sink_schema().fields + [T.StructField("commit", T.LongType(), True)]
    )


def read_subscription_sink(
    spark, sink_path: str, after_commit: int | None = None
) -> DataFrame:
    """Ordered consumer view of a :meth:`Subscription.start_to_sink`
    table. ``after_commit`` resumes past already-consumed deliveries via
    the ``delivery_commit`` audit column — a downstream consumer records
    the max commit it processed and passes it back, the sink-side
    analogue of the delivery cursor. Ordering by (partition_id,
    partition_sequence) reconstructs the callback form's delivery order
    (keys are unique and monotone per partition).

    The sink layout is one ``commit=<n>`` directory per delivered
    commit (overwrite semantics — a replayed micro-batch rewrites its
    own directory byte-identically instead of appending duplicates)
    plus at most a few negative-id fold directories from
    :func:`compact_subscription_sink`. Event identity (partition_id,
    partition_sequence) is unique, so the reader dedupes on it — this
    makes every remaining duplicate window (a fold published but its
    source dirs not yet swept, a replayed commit whose rows were
    already folded) invisible to consumers: exactly-once reads over an
    at-least-once layout, the standard Kafka-consumer contract.

    A sink whose subscription has not yet matched anything has no
    directory at all (the producer side legally starts on an empty
    store); that reads as an empty result, not an error."""
    if not os.path.isdir(sink_path):
        return spark.createDataFrame([], sink_schema())
    df = (
        spark.read.schema(_sink_read_schema())
        .option("basePath", sink_path)
        .parquet(sink_path)
        .drop("commit")
    )
    if after_commit is not None:
        df = df.where(F.col("delivery_commit") > int(after_commit))
    return df.dropDuplicates(["partition_id", "partition_sequence"]).orderBy(
        "partition_id", "partition_sequence"
    )


# Active start_to_sink queries per (abspath) sink, maintained by
# start_to_sink and checked by compact_subscription_sink: the fold must
# not race a writer whose streaming checkpoint has not committed (its
# replay's overwrite could race the sweep). Guards same-process writers
# — the same scope as StreamingCorpusDedup's per-object guard.
_ACTIVE_SINK_QUERIES: dict[str, list] = {}


def compact_subscription_sink(
    spark,
    sink_path: str,
    dir_ops=None,
    retain_after: int | None = None,
) -> None:
    """Fold a subscription sink's per-commit directories into one base
    directory, optionally applying retention (r04 brief item 5).

    A long-running subscription appends one small ``commit=<n>``
    directory per trigger forever; folding rewrites the whole table —
    event-identity-deduped, sorted by (partition_id, partition_sequence)
    for row-group locality — under a FRESH negative commit id, then
    removes every superseded directory. Same fold-before-delete
    protocol as the corpus band index (streaming/corpus.py), through
    the same :class:`~sierradb_spark.eventstore.commit_backend.DirOps`
    seam (object-store safe: promote may be per-object copy+delete).
    A crash anywhere leaves duplicates, never loss, and
    :func:`read_subscription_sink`'s event-identity dedup makes
    duplicates unobservable; the next fold heals them.

    ``retain_after``: drop rows with ``delivery_commit <= retain_after``
    during the fold — retention for consumers that have all processed
    past that commit (the sink-side analogue of the store's
    ``compact(retain_seconds)``).

    Must not run while a sink query on this path is active: the fold
    reads whatever directories exist, and folding a commit whose
    streaming checkpoint has not yet committed would otherwise race its
    replay's overwrite (the replay restores the directory, the reader
    dedups, but the sweep below could then remove rows the fold never
    saw). ENFORCED for queries started in this process (raises while
    any is active — same discipline as the corpus index's
    compact_index guard); cross-process writers remain the operator's
    responsibility, as with every single-writer table."""
    from sierradb_spark.eventstore.commit_backend import LocalDirOps

    key = os.path.abspath(sink_path)
    active = [q for q in _ACTIVE_SINK_QUERIES.get(key, ()) if q.isActive]
    if active:
        raise RuntimeError(
            f"compact_subscription_sink must not run while a sink query "
            f"on {sink_path!r} is active ({len(active)} running): a "
            "not-yet-checkpointed commit folded into the base could "
            "race its replay's overwrite with the sweep; stop the "
            "query first"
        )
    ops = dir_ops or LocalDirOps()
    if not ops.exists(sink_path):
        return
    dirs = [
        d for d in ops.list_subdirs(sink_path) if d.startswith("commit=")
    ]
    ids = [int(d.split("=")[1]) for d in dirs]
    if retain_after is None and len([i for i in ids if i >= 0]) == 0 and len(ids) <= 1:
        return  # nothing to fold
    df = (
        spark.read.schema(_sink_read_schema())
        .option("basePath", sink_path)
        .parquet(sink_path)
        .drop("commit")
        .dropDuplicates(["partition_id", "partition_sequence"])
    )
    if retain_after is not None:
        df = df.where(F.col("delivery_commit") > int(retain_after))
    tmp = os.path.join(sink_path, ".fold-tmp")
    (
        df.sortWithinPartitions("partition_id", "partition_sequence")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    new_id = min([i for i in ids if i < 0], default=0) - 1
    ops.promote(tmp, os.path.join(sink_path, f"commit={new_id}"))
    for d in dirs:
        ops.remove(os.path.join(sink_path, d))


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
    #
    # The cursor is three fields, persisted atomically beside the
    # checkpoint:
    #   last_commit — highest commit processed through a CONTIGUOUS
    #                 chain (or via a base manifest, which supersedes
    #                 everything below it);
    #   watermarks  — delivered-through sequence per partition, advanced
    #                 only for processed commits;
    #   pending     — manifests the source delivered OUT OF ORDER
    #                 (commit N+1 listed in a batch that excluded N:
    #                 mtime tie / clock step / maxFilesPerTrigger split).
    #                 Held — with their file lists, because the file
    #                 source never re-lists a seen file — until the gap
    #                 fills or a base manifest supersedes it. Without
    #                 this, advancing straight to the newest manifest's
    #                 watermarks would permanently suppress the gapped
    #                 commit's events: silent data loss.

    @staticmethod
    def _cursor_path(checkpoint: str) -> str:
        return os.path.join(checkpoint, "delivered_watermarks.json")

    def _load_cursor(self, checkpoint: str) -> dict:
        try:
            with open(self._cursor_path(checkpoint)) as f:
                raw = json.load(f)
        except FileNotFoundError:
            return {"last_commit": None, "watermarks": {}, "pending": {}}
        if "watermarks" not in raw:  # legacy flat {pid: seq} cursor file
            # ``legacy``: the old cursor has no commit anchor, but its
            # watermarks prove every commit the source already listed
            # was processed — so the NEXT pending commit (whatever its
            # number; the file source never re-lists processed
            # manifests) is a valid anchor. Without this flag the
            # cold-start rule (commit 1 or a base required) would block
            # every incremental commit and silently stall delivery
            # until the next compaction publishes a base.
            return {
                "last_commit": None,
                "watermarks": {int(k): int(v) for k, v in raw.items()},
                "pending": {},
                "legacy": True,
            }
        return {
            "last_commit": raw["last_commit"],
            "watermarks": {int(k): int(v) for k, v in raw["watermarks"].items()},
            "pending": {int(k): v for k, v in raw["pending"].items()},
        }

    def _save_cursor(self, checkpoint: str, cur: dict) -> None:
        path = self._cursor_path(checkpoint)
        tmp = f"{path}.tmp-{secrets.token_hex(4)}"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "last_commit": cur["last_commit"],
                    "watermarks": {
                        str(k): int(v) for k, v in cur["watermarks"].items()
                    },
                    "pending": {str(k): v for k, v in cur["pending"].items()},
                },
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)
        fsync_dir(os.path.dirname(path))

    @staticmethod
    def _pop_deliverable(cursor: dict) -> list[dict]:
        """Pop the manifests now safe to process, in commit order: the
        contiguous extension of ``last_commit``, plus any base manifest
        (a base supersedes — and re-lists the data of — every commit
        below it, so a gap beneath one can never fill and must not
        block). Gapped manifests stay pending.

        When the contiguous walk blocks on a gap, jump to the HIGHEST
        pending base past it (not just a base at the minimum): a
        retention sweep can unlink a gapped manifest while retaining
        non-base commits between the gap and the base, and those
        retained commits' data is re-listed by the base anyway —
        waiting on them would stall delivery forever."""
        todo: list[dict] = []
        pending = cursor["pending"]
        while pending:
            c = min(pending)
            last = cursor["last_commit"]
            entry = pending[c]
            if last is not None and c <= last:
                del pending[c]  # replay of an already-processed commit
                continue
            # Cold start (last_commit=None) must begin at a chain START:
            # commit 1 or a base. Accepting an arbitrary first commit
            # would advance the cursor to its CUMULATIVE watermark map,
            # permanently gating out earlier commits whose data only a
            # later base re-lists (manifest 1 swept, incrementals 2,3
            # retained, base 4 pending in a later trigger) — silent
            # loss. Blocking instead is safe: the chain resolves, so a
            # base (or commit 1) is guaranteed to be listed eventually.
            # A legacy (pre-anchor) cursor accepts ANY first commit: its
            # watermarks already cover everything the source listed
            # before the upgrade, and the source only delivers new
            # manifests — see _load_cursor.
            fresh_ok = last is None and (
                c == 1 or entry["base"] or cursor.get("legacy", False)
            )
            if fresh_ok or (last is not None and c == last + 1) or entry["base"]:
                todo.append(pending.pop(c))
                cursor["last_commit"] = c
                continue
            # Gap at c: unblock through the newest base above it, if any
            # (it supersedes c and everything between).
            bases = [k for k, e in pending.items() if e["base"]]
            if not bases:
                break
            b = max(bases)
            for k in [k for k in pending if k < b]:
                del pending[k]  # superseded by the base's full re-list
            todo.append(pending.pop(b))
            cursor["last_commit"] = b
        return todo

    def _make_processor(
        self, checkpoint: str, emit: Callable[[DataFrame, int], None]
    ) -> Callable[[DataFrame, int], None]:
        """The shared foreachBatch body: fold the micro-batch's manifests
        into the durable cursor, read exactly the files of the contiguous
        commit prefix, gate + match, hand the resulting DataFrame to
        ``emit``, then advance the cursor. ``emit`` decides where matched
        rows go (driver callback vs executor-side sink write)."""
        from sierradb_spark.eventstore.schema import EVENT_SCHEMA

        def process(batch: DataFrame, batch_id: int) -> None:
            manifests = batch.collect()  # O(commits per trigger) tiny rows
            if not manifests:
                return
            cursor = self._load_cursor(checkpoint)
            for m in manifests:
                c = int(m["commit"])
                last = cursor["last_commit"]
                if last is not None and c <= last:
                    continue  # already processed (replayed listing)
                cursor["pending"][c] = {
                    "base": bool(m["base"]),
                    "watermarks": {
                        str(k): int(v)
                        for k, v in (m["watermarks"] or {}).items()
                    },
                    "events_add": list(m["events_add"] or ()),
                }
            # Process only the contiguous prefix of the commit chain;
            # gapped manifests wait in the cursor file (with their file
            # lists) so commit N's events are never suppressed — or
            # delivered out of order — because N+1 got listed first.
            todo = self._pop_deliverable(cursor)
            # Fold the file lists the same way _read_state folds the
            # chain: a base manifest RESETS the list (it re-lists, in
            # rewritten files, all data of every commit below it — its
            # own predecessors included). Concatenating instead would
            # read the same rows twice when one micro-batch carries two
            # bases (compact() twice between triggers) or an incremental
            # plus the base that superseded it, and the cursor gate —
            # evaluated once per batch — cannot filter within-batch
            # duplicates.
            files: list[str] = []
            for e in todo:
                if e["base"]:
                    files = list(e["events_add"])
                else:
                    files.extend(e["events_add"])
            if files:
                paths = [
                    os.path.join(self.store.events_path, p) for p in files
                ]
                events = (
                    self.store.spark.read.schema(EVENT_SCHEMA)
                    .option("basePath", self.store.events_path)
                    .parquet(*paths)
                )
                # Cursor gate (JVM-side literal map): drops rows already
                # delivered before a restart or re-listed by a base
                # manifest.
                gate = F.col("partition_sequence") > EventStore._wm_col(
                    cursor["watermarks"]
                )
                emit(
                    events.where(gate & self.matcher.predicate()),
                    int(cursor["last_commit"]),
                )
            # Advance through exactly the processed commits' confirmed
            # watermarks — covers every row in their files, matched or
            # not — and persist pending for gapped ones.
            for e in todo:
                for k, v in e["watermarks"].items():
                    wm = cursor["watermarks"]
                    wm[int(k)] = max(int(v), wm.get(int(k), -1))
            self._save_cursor(checkpoint, cursor)

        return process

    def _start_stream(
        self,
        process: Callable[[DataFrame, int], None],
        checkpoint: str,
        available_now: bool,
        trigger_interval: str | None,
    ) -> StreamingQuery:
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

        def emit(matched: DataFrame, _commit: int) -> None:
            ready = matched.orderBy(
                "partition_id", "partition_sequence"
            ).collect()
            if ready:
                deliver(ready)

        process = self._make_processor(checkpoint, emit)
        return self._start_stream(
            process, checkpoint, available_now, trigger_interval
        )

    def start_to_sink(
        self,
        sink_path: str,
        checkpoint: str,
        available_now: bool = True,
        trigger_interval: str | None = None,
    ) -> StreamingQuery:
        """Executor-side delivery: append matched events to a parquet
        sink directory instead of collecting them to a driver callback.

        This is the many-subscriber fan-out form: the driver never holds
        event rows, so delivery bandwidth scales with executors, and any
        number of downstream consumers read the sink table. Ordered
        content is reconstructed by sorting on (partition_id,
        partition_sequence): those keys are unique and monotone per
        partition (gapless assignment), so the global sort equals the
        callback form's concatenated per-batch delivery order. The
        ``delivery_commit`` column records which commit delivered each
        row (per-batch sink-side audit / resume point).

        The reference's analogue is one push socket per subscriber
        (subscription.rs:441-460); a shared sink table is the Spark-first
        shape for the same fan-out.

        Layout: one ``commit=<n>`` directory per delivered commit,
        written with OVERWRITE semantics — a replayed micro-batch
        (crash between the sink write and the checkpoint commit)
        rewrites its own directory byte-identically instead of
        appending duplicate part files. Read with
        :func:`read_subscription_sink`; fold/retain with
        :func:`compact_subscription_sink`."""

        def emit(matched: DataFrame, commit: int) -> None:
            (
                matched.withColumn("delivery_commit", F.lit(commit))
                .sortWithinPartitions("partition_id", "partition_sequence")
                .write.mode("overwrite")
                .parquet(os.path.join(sink_path, f"commit={commit}"))
            )

        process = self._make_processor(checkpoint, emit)
        q = self._start_stream(
            process, checkpoint, available_now, trigger_interval
        )
        key = os.path.abspath(sink_path)
        live = [x for x in _ACTIVE_SINK_QUERIES.get(key, []) if x.isActive]
        live.append(q)
        _ACTIVE_SINK_QUERIES[key] = live
        return q

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

    def catchup_to_sink(
        self, sink_path: str, checkpoint: str, timeout_s: float = 300.0
    ) -> None:
        """Synchronous form of :meth:`start_to_sink`: one availableNow
        pass appending everything since the previous call with the same
        checkpoint to the sink table."""
        q = self.start_to_sink(sink_path, checkpoint, available_now=True)
        try:
            q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()
