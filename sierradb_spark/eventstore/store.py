"""EventStore — SierraDB capabilities on a partitioned Parquet event table.

Write path (mirrors the reference lifecycle, SURVEY §3.1):
request enrichment (partition key/hash/id derivation) → per-partition
serialized validation + gapless sequence assignment (the Spark-native
analogue of the single-writer-thread-per-bucket discipline,
``crates/sierradb/src/writer_thread_pool.rs:120-150,560-645``) → one
append commit → watermark advance.

Read path: EGET / ESCAN / EPSCAN / ESVER / EPSEQ as DataFrame queries
with partition pruning and watermark gating (``sierradb-cluster/src/
read.rs:460-496,663-697``).

Scale notes (100 TB):
- The events table is hive-partitioned by ``partition_id`` and sorted
  within files by (stream_id, stream_version) — stream scans prune to
  one partition directory and skip row groups via min/max stats; this
  replaces the reference's per-segment stream/partition indexes
  (SURVEY §2.4).
- Validation+assignment shuffles the *batch* (not the table) by
  partition_id — cost is O(batch), independent of table size, matching
  the reference's "consistent write performance regardless of database
  size" design goal (README.md:96-99).
- Heads (latest version per stream) are recovered per-batch by an
  aggregation over only the touched partitions; a compacted heads table
  (maintained in the same commit) caps that cost at scale — see
  ``refresh_heads``.
- On a production cluster the table format should be Delta/Iceberg so
  the append + watermark updates are a single atomic commit; plain
  Parquet is used here because the test container ships no table
  format. The commit protocol is isolated in ``_commit``.
"""

from __future__ import annotations

import os
import secrets
import time
import uuid as _uuid
from dataclasses import dataclass, field
from typing import Iterable, Iterator, Literal, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sierradb_spark import ids
from sierradb_spark.config import DEFAULT_CONFIG, EngineConfig
from sierradb_spark.eventstore.schema import (
    APPEND_REQUEST_SCHEMA,
    APPEND_RESULT_SCHEMA,
    EVENT_SCHEMA,
)
from sierradb_spark import versions as V

RangeValue = int | Literal["-", "+"]


@dataclass
class AppendRequest:
    """One event to append (EAPPEND; request/eappend.rs:49-58)."""

    stream_id: str
    event_name: str
    payload: bytes = b""
    metadata: bytes = b""
    expected_version: str = "any"
    event_id: str | None = None
    partition_key: str | None = None
    timestamp_ms: int | None = None


@dataclass
class AppendResult:
    accepted: bool
    error: str | None
    event_id: str | None
    partition_id: int
    partition_sequence: int | None
    stream_id: str
    stream_version: int | None


class VersionConflict(Exception):
    pass


def _validate_and_assign(pdf: pd.DataFrame) -> pd.DataFrame:
    """Serialized per-partition validation + assignment.

    Runs once per ``partition_id`` group (applyInPandas). Input carries
    ``cur_stream_version`` / ``cur_partition_sequence`` columns (heads
    as of the previous commit; NaN = empty). Transactions are processed
    in arrival order; a transaction is all-or-nothing (EMAPPEND,
    request/emappend.rs; database.rs:867-897 validates the whole txn).

    Pure pandas + the versions truth table — no Spark calls here; the
    sequential loop is the *semantic* serialization point the reference
    implements with one writer thread per bucket.
    """
    pdf = pdf.sort_values("arrival", kind="stable")
    cur_seq: Optional[int] = None
    seq_head = pdf["cur_partition_sequence"].dropna()
    if len(seq_head):
        cur_seq = int(seq_head.iloc[0])
    stream_heads: dict[str, Optional[int]] = {}
    for sid, ver in zip(pdf["stream_id"], pdf["cur_stream_version"]):
        if sid not in stream_heads:
            stream_heads[sid] = None if pd.isna(ver) else int(ver)

    out_rows = []
    for _, txn in pdf.groupby("txn_id", sort=False):
        # Validate the whole transaction against current state, tracking
        # in-txn version increments (a txn may append 2 events to one stream).
        txn_heads = dict(stream_heads)
        error = None
        planned = []
        for row in txn.itertuples(index=False):
            cur = txn_heads.get(row.stream_id)
            expected = V.parse_expected_version(row.expected_version)
            gap = V.gap_from(expected, cur)
            if not gap.ok:
                error = f"version conflict on {row.stream_id}: {gap.kind} by {gap.by}"
                break
            new_version = V.next_version(cur)
            txn_heads[row.stream_id] = new_version
            planned.append((row, new_version))
        if error is None:
            stream_heads = txn_heads
            for row, new_version in planned:
                cur_seq = 0 if cur_seq is None else cur_seq + 1
                out_rows.append(
                    {
                        "arrival": row.arrival,
                        "txn_id": row.txn_id,
                        "accepted": True,
                        "error": None,
                        "event_id": row.event_id,
                        "partition_key": row.partition_key,
                        "partition_id": row.partition_id,
                        "partition_sequence": cur_seq,
                        "stream_id": row.stream_id,
                        "stream_version": new_version,
                        "event_name": row.event_name,
                        "timestamp_ns": row.timestamp_ns,
                        "payload": row.payload,
                        "metadata": row.metadata,
                    }
                )
        else:
            for row in txn.itertuples(index=False):
                out_rows.append(
                    {
                        "arrival": row.arrival,
                        "txn_id": row.txn_id,
                        "accepted": False,
                        "error": error,
                        "event_id": row.event_id,
                        "partition_key": row.partition_key,
                        "partition_id": row.partition_id,
                        "partition_sequence": None,
                        "stream_id": row.stream_id,
                        "stream_version": None,
                        "event_name": row.event_name,
                        "timestamp_ns": row.timestamp_ns,
                        "payload": row.payload,
                        "metadata": row.metadata,
                    }
                )
    cols = [f.name for f in APPEND_RESULT_SCHEMA.fields]
    return pd.DataFrame(out_rows, columns=cols)


class EventStore:
    """An append-only event table with SierraDB read/write semantics."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        config: EngineConfig = DEFAULT_CONFIG,
    ) -> None:
        self.spark = spark
        self.path = path
        self.config = config
        self.events_path = os.path.join(path, "events")
        self.watermarks_path = os.path.join(path, "watermarks")
        os.makedirs(self.events_path, exist_ok=True)

    # --- helpers -------------------------------------------------------------

    def _events_exist(self) -> bool:
        for root, _dirs, files in os.walk(self.events_path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def events(self) -> DataFrame:
        """The raw events DataFrame (unfiltered; no watermark gate)."""
        if not self._events_exist():
            return self.spark.createDataFrame([], EVENT_SCHEMA)
        df = self.spark.read.schema(EVENT_SCHEMA).parquet(self.events_path)
        return df

    def watermarks(self) -> DataFrame:
        """Per-partition confirmed watermark table (SURVEY §4.3).

        On Spark storage a committed append is quorum-durable, so the
        confirmed watermark equals the max partition_sequence at the
        last commit (docs/Watermarks.md semantics preserved: readers
        never see a sequence above it, and it only advances gaplessly
        because sequence assignment itself is gapless).
        """
        if os.path.exists(self.watermarks_path):
            return self.spark.read.parquet(self.watermarks_path)
        return self.spark.createDataFrame(
            [], "partition_id int, confirmed_sequence long"
        )

    def _watermark_of(self, partition_id: int) -> Optional[int]:
        rows = (
            self.watermarks()
            .where(F.col("partition_id") == partition_id)
            .collect()
        )
        return rows[0]["confirmed_sequence"] if rows else None

    def visible_events(self) -> DataFrame:
        """Events gated by the confirmation watermark (read.rs:460-496).

        Broadcast-joins the (tiny) watermark table — at 100 TB this is a
        map-side filter, no shuffle of the event table.
        """
        wm = F.broadcast(self.watermarks())
        ev = self.events()
        return ev.join(wm, "partition_id", "inner").where(
            F.col("partition_sequence") <= F.col("confirmed_sequence")
        ).drop("confirmed_sequence")

    # --- write path ----------------------------------------------------------

    def append(self, requests: Sequence[AppendRequest]) -> list[AppendResult]:
        """EAPPEND: each request is its own transaction."""
        return self.append_transactions([[r] for r in requests])

    def append_transaction(self, requests: Sequence[AppendRequest]) -> list[AppendResult]:
        """EMAPPEND: all requests form one atomic transaction.

        All events must share one partition (request/emappend.rs;
        database.rs:867-897): we enforce a single partition_key.
        """
        keys = {r.partition_key or str(ids.partition_key_for_stream(r.stream_id)) for r in requests}
        if len(keys) > 1:
            raise ValueError("EMAPPEND requires a single partition_key across events")
        return self.append_transactions([list(requests)])

    def append_transactions(
        self, transactions: Sequence[Sequence[AppendRequest]]
    ) -> list[AppendResult]:
        """Apply a batch of transactions in arrival order.

        This is the same code path the streaming ingest uses per
        micro-batch (streaming/ingest.py); batch semantics == one
        group-commit of the reference (writer_thread_pool.rs:687-699).
        """
        rows = []
        arrival = 0
        now_ns = time.time_ns()
        for txn in transactions:
            txn_id = str(
                ids.set_uuid_flag(_uuid.uuid4(), len(txn) == 1)
            )  # implicit-commit flag for single-event txns (id.rs:75-89)
            for r in txn:
                pkey = r.partition_key or str(ids.partition_key_for_stream(r.stream_id))
                phash = ids.uuid_to_partition_hash(pkey)
                pid = ids.partition_id_for_hash(phash, self.config.num_partitions)
                eid = r.event_id or str(
                    ids.uuid_v7_with_partition_hash(
                        phash,
                        timestamp_ms=(
                            r.timestamp_ms
                            if r.timestamp_ms is not None
                            else now_ns // 1_000_000
                        ),
                        rand12=secrets.randbits(12),
                        rand46=secrets.randbits(46),
                    )
                )
                if not ids.validate_event_id(eid, phash):
                    raise ValueError(
                        f"event_id {eid} does not embed partition hash {phash}"
                    )  # database.rs:880
                if not (1 <= len(r.stream_id) <= self.config.max_stream_id_len):
                    raise ValueError("stream_id must be 1-64 chars")  # lib.rs:26,36-50
                if len(r.event_name) > self.config.max_event_name_len:
                    raise ValueError("event_name too long")  # format.rs:150
                expected = V.parse_expected_version(r.expected_version)
                if self.config.strict_versioning and not V.is_strict_allowed(expected):
                    raise ValueError(
                        "strict versioning rejects 'any'/'exists'"
                    )  # eappend.rs:180-188
                rows.append(
                    (
                        arrival,
                        txn_id,
                        r.stream_id,
                        r.event_name,
                        r.expected_version,
                        eid,
                        pkey,
                        pid,
                        (
                            r.timestamp_ms * 1_000_000  # ms→ns, eappend.rs:203-217
                            if r.timestamp_ms is not None
                            else now_ns
                        ),
                        r.payload,
                        r.metadata,
                    )
                )
                arrival += 1
        if not rows:
            return []
        batch = self.spark.createDataFrame(rows, APPEND_REQUEST_SCHEMA)
        result_df = self._apply_batch(batch)
        results = result_df.orderBy("arrival").collect()
        return [
            AppendResult(
                accepted=x["accepted"],
                error=x["error"],
                event_id=x["event_id"],
                partition_id=x["partition_id"],
                partition_sequence=x["partition_sequence"],
                stream_id=x["stream_id"],
                stream_version=x["stream_version"],
            )
            for x in results
        ]

    def append_df(self, requests: DataFrame) -> DataFrame:
        """Batch append from a DataFrame of request rows (the connector
        path — sources/connectors.py): columns ``stream_id, event_name``
        plus optional payload/metadata/expected_version/timestamp_ms/
        partition_key/event_id. Enrichment and validation identical to
        the row API; returns the per-request result DataFrame."""
        from sierradb_spark.streaming.ingest import enrich_requests

        enriched = enrich_requests(requests, self.config.num_partitions)
        cols = [f.name for f in APPEND_REQUEST_SCHEMA.fields]
        return self._apply_batch(enriched.select(*cols))

    def _apply_batch(self, batch: DataFrame) -> DataFrame:
        """Validate + assign + commit one batch. Returns per-request results.

        Heads recovery reads ONLY the touched partitions (partition
        pruning on the hive partition column) — O(touched partitions),
        not O(table).
        """
        touched = [r["partition_id"] for r in batch.select("partition_id").distinct().collect()]
        ev = self.events().where(F.col("partition_id").isin(touched))
        stream_heads = ev.groupBy("partition_id", "stream_id").agg(
            F.max("stream_version").alias("cur_stream_version")
        )
        part_heads = ev.groupBy("partition_id").agg(
            F.max("partition_sequence").alias("cur_partition_sequence")
        )
        enriched = (
            batch.join(stream_heads, ["partition_id", "stream_id"], "left")
            .join(part_heads, ["partition_id"], "left")
        )
        # One group per partition: the Spark-native single-writer-per-
        # partition discipline. Shuffle size = batch size, never table size.
        result = (
            enriched.repartition(
                min(self.config.num_partitions, self.config.shuffle_partitions),
                "partition_id",
            )
            .groupBy("partition_id")
            .applyInPandas(_validate_and_assign, schema=APPEND_RESULT_SCHEMA)
        )
        result = result.localCheckpoint(eager=True)  # pin results before commit
        self._commit(result.where(F.col("accepted")))
        return result

    def _commit(self, accepted: DataFrame) -> None:
        """Write accepted events + advance watermarks.

        With Delta/Iceberg this is one transactional multi-table commit;
        with plain Parquet we order writes so readers using the
        watermark gate never observe uncommitted sequences (events land
        first, watermark advance publishes them — §4.3).
        """
        events = accepted.select(
            "event_id",
            "partition_key",
            "partition_id",
            "partition_sequence",
            "stream_id",
            "stream_version",
            "event_name",
            F.timestamp_micros((F.col("timestamp_ns") / 1000).cast("long")).alias(
                "timestamp"
            ),
            "timestamp_ns",
            "payload",
            "metadata",
            F.col("txn_id").alias("transaction_id"),
            F.lit(2).cast("int").alias("confirmation_count"),  # quorum for rf=3
        )
        # Sort within files by (stream_id, stream_version) so row-group
        # stats make stream scans skip (replaces the reference's
        # per-segment stream index, SURVEY §2.4 X2).
        (
            events.sortWithinPartitions("stream_id", "stream_version")
            .write.mode("append")
            .partitionBy("partition_id")
            .parquet(self.events_path)
        )
        # Watermark advance is O(batch): merge the batch's per-partition
        # maxima over the previous watermark table (both tiny) — never a
        # rescan of the events table. Gap-freeness holds because sequence
        # assignment itself is gapless and this runs after the events land.
        batch_wm = accepted.groupBy("partition_id").agg(
            F.max("partition_sequence").alias("batch_max")
        )
        new_wm = (
            self.watermarks()
            .join(batch_wm, "partition_id", "full_outer")
            .select(
                "partition_id",
                F.greatest(
                    F.coalesce(F.col("confirmed_sequence"), F.lit(-1)),
                    F.coalesce(F.col("batch_max"), F.lit(-1)),
                ).alias("confirmed_sequence"),
            )
        )
        tmp = self.watermarks_path + ".tmp"
        new_wm.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = self.watermarks_path
        swap = self.watermarks_path + ".old"
        if os.path.exists(old):
            os.rename(old, swap)
        os.rename(tmp, old)
        if os.path.exists(swap):
            import shutil

            shutil.rmtree(swap)

    # --- read path -----------------------------------------------------------

    def get(self, event_id: str) -> DataFrame:
        """EGET: committed events of the transaction containing event_id.

        Partition pruned from the hash embedded in the UUID
        (id.rs:50-53; read path database.rs:127-207): only one
        partition directory is scanned, and parquet column stats skip
        row groups within it.
        """
        phash = ids.uuid_to_partition_hash(event_id)
        pid = ids.partition_id_for_hash(phash, self.config.num_partitions)
        wm = self._watermark_of(pid)
        if wm is None:
            return self.spark.createDataFrame([], EVENT_SCHEMA)
        part = self.events().where(F.col("partition_id") == pid)
        target = part.where(F.col("event_id") == event_id).select("transaction_id")
        # EGET returns the whole transaction's events (database.rs:127-207).
        out = (
            part.join(F.broadcast(target), "transaction_id", "left_semi")
            .where(F.col("partition_sequence") <= F.lit(wm))
            .orderBy("partition_sequence")
        )
        return out.select(*[f.name for f in EVENT_SCHEMA.fields])

    def _range_filter(
        self, col: str, start: RangeValue, end: RangeValue
    ) -> F.Column:
        cond = F.lit(True)
        if start != "-":
            cond = cond & (F.col(col) >= int(start))
        if end != "+":
            cond = cond & (F.col(col) <= int(end))
        return cond

    def scan(
        self,
        stream_id: str,
        start: RangeValue = "-",
        end: RangeValue = "+",
        count: int | None = None,
        direction: Literal["forward", "reverse"] = "forward",
        partition_key: str | None = None,
    ) -> DataFrame:
        """ESCAN: version-range scan of one stream (request/escan.rs:105-162).

        Pruned to the stream's single partition (a stream lives entirely
        in one partition — routing invariant), clamped to the confirmed
        watermark (read.rs:671-674), ordered by stream_version, with an
        optional COUNT limit (read.rs:663-697).
        """
        pkey = partition_key or str(ids.partition_key_for_stream(stream_id))
        pid = ids.partition_id_for_hash(
            ids.uuid_to_partition_hash(pkey), self.config.num_partitions
        )
        wm = self._watermark_of(pid)
        if wm is None:
            return self.spark.createDataFrame([], EVENT_SCHEMA)
        df = (
            self.events()
            .where(F.col("partition_id") == pid)
            .where(F.col("stream_id") == stream_id)
            .where(F.col("partition_sequence") <= F.lit(wm))
            .where(self._range_filter("stream_version", start, end))
        )
        order = F.col("stream_version").asc() if direction == "forward" else F.col("stream_version").desc()
        df = df.orderBy(order)
        if count is not None:
            df = df.limit(count)
        return df

    def pscan(
        self,
        partition_id: int,
        start: RangeValue = "-",
        end: RangeValue = "+",
        count: int | None = None,
        direction: Literal["forward", "reverse"] = "forward",
    ) -> DataFrame:
        """EPSCAN: sequence-range scan of one partition (request/epscan.rs:90-136)."""
        wm = self._watermark_of(partition_id)
        if wm is None:
            return self.spark.createDataFrame([], EVENT_SCHEMA)
        df = (
            self.events()
            .where(F.col("partition_id") == partition_id)
            .where(F.col("partition_sequence") <= F.lit(wm))
            .where(self._range_filter("partition_sequence", start, end))
        )
        order = (
            F.col("partition_sequence").asc()
            if direction == "forward"
            else F.col("partition_sequence").desc()
        )
        df = df.orderBy(order)
        if count is not None:
            df = df.limit(count)
        return df

    def scan_batches(
        self,
        stream_id: str,
        start: RangeValue = "-",
        end: RangeValue = "+",
        batch_size: int | None = None,
        direction: Literal["forward", "reverse"] = "forward",
    ) -> Iterator[list]:
        """Batched iteration (R7): yield lists of ≤ batch_size events,
        paginating by version cursor — the reference's ``next_batch(50)``
        (iter.rs:491-568, DEFAULT_BATCH_SIZE sierradb-cluster/src/lib.rs:43).

        Each page is an independent pruned+limited Spark job, so the
        driver holds one page of rows at a time — O(batch) memory for an
        arbitrarily long stream.
        """
        size = batch_size or self.config.default_batch_size
        lo = None if start == "-" else int(start)
        hi = None if end == "+" else int(end)
        while True:
            rows = self.scan(
                stream_id,
                "-" if lo is None else lo,
                "+" if hi is None else hi,
                count=size,
                direction=direction,
            ).collect()
            if not rows:
                return
            yield rows
            if len(rows) < size:
                return
            if direction == "forward":
                lo = rows[-1]["stream_version"] + 1
            else:
                hi = rows[-1]["stream_version"] - 1

    def compact(self, target_files_per_partition: int = 1) -> None:
        """Segment-rollover/OPTIMIZE analog (W8; writer_thread_pool.rs:697-790).

        Streaming ingest leaves one small file per partition per
        micro-batch; compaction rewrites each hive partition into
        ``target_files_per_partition`` files sorted by (stream_id,
        stream_version), restoring the row-group-skipping layout. On
        Delta this is OPTIMIZE + ZORDER; on plain Parquet we rewrite to
        a staging dir then swap atomically via rename.
        """
        import shutil

        ev = self.events()
        staged = self.events_path + ".compacting"
        (
            ev.repartition(target_files_per_partition * self.config.num_partitions,
                           "partition_id")
            .sortWithinPartitions("stream_id", "stream_version")
            .write.mode("overwrite")
            .partitionBy("partition_id")
            .parquet(staged)
        )
        old = self.events_path + ".old"
        os.rename(self.events_path, old)
        os.rename(staged, self.events_path)
        shutil.rmtree(old)

    def stream_version(
        self, stream_id: str, partition_key: str | None = None
    ) -> Optional[int]:
        """ESVER: latest version of a stream, None = empty
        (``ESVER stream [PARTITION_KEY u]``, request/esver.rs): streams
        appended under an explicit partition key live in that key's
        partition, so the lookup must accept the same key."""
        pkey = partition_key or str(ids.partition_key_for_stream(stream_id))
        pid = ids.partition_id_for_hash(
            ids.uuid_to_partition_hash(pkey), self.config.num_partitions
        )
        row = (
            self.events()
            .where(F.col("partition_id") == pid)
            .where(F.col("stream_id") == stream_id)
            .agg(F.max("stream_version").alias("v"))
            .collect()[0]
        )
        return row["v"]

    def partition_sequence(self, partition_id: int) -> Optional[int]:
        """EPSEQ: latest confirmed sequence of a partition (request/epseq.rs)."""
        return self._watermark_of(partition_id)
