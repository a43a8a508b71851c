"""Streaming HyperLogLog: incremental distinct-count registers.

The batch HLL (operators/sketches.py, hll_distinct_audit) proves the
register math against a DuckDB oracle; this is its production shape —
an unbounded keyed stream whose distinct-count registers are maintained
incrementally, so "distinct users per event type, ever" is answerable
at any moment without re-scanning history.

Design (mirrors StreamingCorpusDedup's per-batch layout):

- each micro-batch computes its OWN (key, j, m_j) register table
  (``hll_registers_for``) and writes it to a ``batch=<id>`` directory
  with overwrite semantics — a replayed batch rewrites byte-identical
  files, so no commit log is needed;
- reads fold all batch directories with groupBy(key, j).max(m_j).
  Because max-merge is idempotent AND commutative, duplicate or
  partially-compacted register rows can never corrupt an estimate —
  the crash story is strictly simpler than the corpus index's
  (membership joins tolerate duplicates; max tolerates anything);
- ``compact_registers`` folds the accumulated batch directories into
  one base directory (fold-before-delete through the DirOps seam,
  fresh negative batch id per fold), bounding listing cost for
  long-running streams.

Scale shape: per-batch state is O(keys x 256) integers regardless of
batch size; the fold shuffles register rows only (never raw ids); and
the same register layout merges across 1000 executors, N streams, or
historical backfills by the same max.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from sierradb_spark.eventstore.commit_backend import DirOps, LocalDirOps
from sierradb_spark.operators.sketches import (
    hll_estimate_from,
    hll_registers_for,
)

_REGS_READ_SCHEMA = "key string, j long, m_j int, batch long"


class StreamingHLL:
    """Maintain per-key HLL registers over a micro-batched stream."""

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        key: str,
        value: str,
        dir_ops: DirOps | None = None,
    ) -> None:
        if "://" in out_dir and dir_ops is None:
            raise ValueError(
                f"out_dir {out_dir!r} is not a local path; supply "
                "dir_ops implementing DirOps for its filesystem"
            )
        self.spark = spark
        self.regs_path = os.path.join(out_dir, "hll_registers")
        self.key = key
        self.value = value
        self.ops: DirOps = dir_ops or LocalDirOps()
        self._queries: list[StreamingQuery] = []

    # --- per-batch fold (also the replay unit) ---------------------------

    def process_batch(self, rows: DataFrame, batch_id: int) -> None:
        regs = hll_registers_for(rows, self.key, self.value)
        (
            regs.write.mode("overwrite").parquet(
                os.path.join(self.regs_path, f"batch={batch_id}")
            )
        )

    # --- reads -----------------------------------------------------------

    def registers(self) -> DataFrame:
        """The folded (key, j, m_j) register table across all batches."""
        if not self.ops.exists(self.regs_path):
            raise FileNotFoundError(
                f"no registers written yet under {self.regs_path}"
            )
        raw = (
            self.spark.read.schema(_REGS_READ_SCHEMA)
            .option("basePath", self.regs_path)
            .parquet(self.regs_path)
        )
        return raw.groupBy("key", "j").agg(F.max("m_j").alias("m_j"))

    def estimates(self) -> DataFrame:
        """(key, e) distinct estimates from the current registers."""
        return hll_estimate_from(self.registers())

    # --- streaming driver ------------------------------------------------

    def start(
        self,
        stream: DataFrame,
        checkpoint: str,
        available_now: bool = True,
        trigger_interval: str | None = None,
    ) -> StreamingQuery:
        writer = stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_interval:
            writer = writer.trigger(processingTime=trigger_interval)
        q = writer.start()
        self._queries = [x for x in self._queries if x.isActive]
        self._queries.append(q)
        return q

    def ingest_available(
        self, stream: DataFrame, checkpoint: str, timeout_s: float = 300.0
    ) -> None:
        q = self.start(stream, checkpoint, available_now=True)
        try:
            q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()

    # --- maintenance ------------------------------------------------------

    def compact_registers(self) -> None:
        """Fold per-batch register dirs into one pre-merged base dir.

        Ordering is fold-BEFORE-delete: the merged registers land under
        a fresh negative batch id, and superseded directories are only
        removed once it is live. A crash between the two leaves
        duplicate register rows, which the read-time max-merge absorbs
        by construction — so unlike the corpus index there is no replay
        hazard at all: a replayed batch's own registers being present
        in the folded base merely max-merges to the same values.
        Still refuses to run while a query started here is active, to
        keep the maintenance discipline uniform across streaming state
        (same contract as StreamingCorpusDedup.compact_index).
        """
        self._queries = [x for x in self._queries if x.isActive]
        if self._queries:
            raise RuntimeError(
                "compact_registers called while an ingestion query "
                f"started by this object is active ({len(self._queries)})"
            )
        if not self.ops.exists(self.regs_path):
            return
        batches = [
            d
            for d in self.ops.list_subdirs(self.regs_path)
            if d.startswith("batch=")
        ]
        if len(batches) <= 1:
            return
        fold_id = min(
            -1, min(int(d.split("=", 1)[1]) for d in batches) - 1
        )
        folded = self.registers()
        tmp = os.path.join(self.regs_path, f"_fold_tmp_{-fold_id}")
        folded.write.mode("overwrite").parquet(tmp)
        self.ops.promote(tmp, os.path.join(self.regs_path, f"batch={fold_id}"))
        for d in batches:
            self.ops.remove(os.path.join(self.regs_path, d))
