"""Streaming near-dup-free corpus ingestion.

The batch dedup operators (functions/dedup_wide.py) answer "which of
these N documents duplicate each other"; a production corpus is built
INCREMENTALLY — crawl batches arrive continuously and each new document
must be checked against everything already accepted. Re-running the
batch pass over the whole corpus per batch is O(corpus) per batch; this
operator is O(batch + collisions):

1. per micro-batch, compute production-width MinHash band digests
   (the same 64-hash/16-band machinery as the batch operator —
   ``wide_bands_for``);
2. drop documents whose bands collide with the PERSISTED band index of
   already-accepted documents (left-anti equi-join on
   (band_idx, band_digest) — never a scan of accepted text);
3. build the within-batch collision graph over ALL banded docs (index
   hits included) and resolve it with the shared connected-components
   fixpoint: a component containing any index hit is already
   represented in the corpus and drops WHOLE (a doc whose only
   collision is with a same-batch near-dup of the corpus is itself a
   transitive near-dup); a clean component keeps its lowest doc_id;
4. append survivors' text to the corpus and their bands to the index.

Earlier batches win ties across batches (their documents are already in
the index, and hit-components drop transitively); within a batch the
lowest doc_id wins — both deterministic.
A document too short to shingle (< SHINGLE_K tokens) produces no bands
and is always accepted; gate such docs out beforehand with
``min_tokens``.

Exactly-once without a commit log: every batch writes its docs and
bands to ``batch=<id>`` subdirectories with overwrite semantics, so a
replayed micro-batch (crash between the data write and the streaming
checkpoint commit) rewrites byte-identical files instead of appending
duplicates. The index read for batch N filters to ``batch < N``, which
both excludes a half-written own-batch directory on replay and makes
the survivor computation independent of replay timing.

Scale shape (100 TB): the index holds 16 x 32-byte digests per accepted
doc — ~0.5 KB/doc, 5 TB per 10 B docs — partitioned by band digest
prefix at cluster scale so the anti-join shuffles only the batch side;
accepted text is written once and never re-read by the dedup path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from sierradb_spark.eventstore.commit_backend import DirOps, LocalDirOps

DOCS_SCHEMA = "doc_id long, text string"
# Explicit read schemas (incl. the batch partition column): a batch in
# which nothing survived — or nothing shingled — writes an EMPTY
# batch=<id> directory, and schema inference over only-empty dirs fails;
# with the schema pinned such dirs read as zero rows, as they should.
_DOCS_READ_SCHEMA = DOCS_SCHEMA + ", batch long"
_BANDS_READ_SCHEMA = "doc_id long, band_idx int, band_digest string, batch long"


class StreamingCorpusDedup:
    """Incrementally build a near-dup-free corpus from a document stream."""

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        min_tokens: int = 0,
        dir_ops: DirOps | None = None,
    ) -> None:
        if "://" in out_dir and dir_ops is None:
            # The default maintenance ops are driver-local; on a URI
            # path they would silently see "no index" and accept every
            # duplicate. Refuse loudly instead (ADVICE r04): pass a
            # DirOps routed through the store's SDK / Hadoop FileSystem.
            raise ValueError(
                f"out_dir {out_dir!r} is not a local path; supply "
                "dir_ops implementing DirOps for its filesystem "
                "(the default LocalDirOps only understands local paths)"
            )
        self.spark = spark
        self.docs_path = os.path.join(out_dir, "docs")
        self.bands_path = os.path.join(out_dir, "bands")
        self.min_tokens = min_tokens
        self.ops: DirOps = dir_ops or LocalDirOps()
        self._queries: list[StreamingQuery] = []

    # --- the per-batch fold (also the replay unit) -----------------------

    def _index_before(self, batch_id: int) -> DataFrame | None:
        if not self.ops.exists(self.bands_path):
            return None
        idx = (
            self.spark.read.schema(_BANDS_READ_SCHEMA)
            .option("basePath", self.bands_path)
            .parquet(self.bands_path)
        )
        # batch < N: excludes a half-written own-batch dir on replay and
        # pins the survivor set to what earlier batches accepted.
        return idx.where(F.col("batch") < batch_id).select(
            "band_idx", "band_digest"
        )

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        from sierradb_spark.functions.dedup_wide import wide_bands_for
        from sierradb_spark.functions.pipeline import min_label_components

        docs = docs.select("doc_id", "text")
        if self.min_tokens > 0:
            docs = docs.where(
                F.size(F.split(F.trim("text"), r"\s+")) >= self.min_tokens
            )
        docs = docs.localCheckpoint(eager=True)  # read by bands + final write
        staging: list = []
        bands = wide_bands_for(docs, staging_out=staging).localCheckpoint(
            eager=True
        )
        # a long-running stream builds one staging generation per
        # micro-batch; release each deterministically so executor
        # storage stays flat at stream length, not GC-paced
        from sierradb_spark.functions.memo import release_checkpoint

        for s in staging:
            release_checkpoint(s)
        # 1. cross-batch: docs whose bands collide with the accepted index.
        idx = self._index_before(batch_id)
        if idx is not None:
            hit = (
                bands.join(idx, ["band_idx", "band_digest"], "left_semi")
                .select("doc_id")
                .distinct()
                .localCheckpoint(eager=True)  # read 2x below
            )
        else:
            hit = bands.select("doc_id").where(F.lit(False))
        # 2. within-batch collision graph over ALL banded docs — index
        # hits INCLUDED. Dropping hits before building the graph would
        # erase their edges, silently accepting a doc whose only
        # collision is with a same-batch doc that is itself a near-dup
        # of the corpus (A~B, B~accepted C: A must drop too). So the
        # rule is component-wise: a component containing any index hit
        # is already represented in the corpus — drop it whole (earlier
        # batches win, transitively); a clean component keeps its lowest
        # doc_id (the shared CC fixpoint).
        a, b = bands.alias("a"), bands.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_digest") == F.col("b.band_digest"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        banded_ids = bands.select("doc_id").distinct()
        # No emptiness pre-probe: the CC fixpoint converges on an empty
        # edge set in one round, and every downstream step degenerates
        # correctly — empty comp means keep_in_graph is empty and
        # isolated = banded - hit, exactly the no-collision survivor
        # set. Cost accounting (r05 review): a collision-bearing batch
        # runs one FEWER job than with the old pairs.limit(1).count()
        # probe; a collision-free batch trades the probe (a real
        # self-join shuffle of the band table) for one empty CC round —
        # two jobs over EMPTY inputs, which schedule in milliseconds —
        # so wall-clock improves in both regimes even though the
        # free-batch job COUNT rises by one. Both regimes are pinned by
        # test_per_batch_job_count_has_no_pair_probe.
        edges = pairs.unionByName(  # min_label_components wants symmetry
            pairs.select(
                F.col("doc_b").alias("doc_a"),
                F.col("doc_a").alias("doc_b"),
            )
        )
        comp = min_label_components(edges)  # (id, label=min id)
        hit_labels = (
            comp.join(hit, comp["id"] == hit["doc_id"])
            .select("label")
            .distinct()
        )
        keep_in_graph = (
            comp.join(F.broadcast(hit_labels), "label", "left_anti")
            .where(F.col("id") == F.col("label"))
            .select(F.col("id").alias("doc_id"))
        )
        isolated = banded_ids.join(
            comp.select(F.col("id").alias("doc_id")), "doc_id", "left_anti"
        ).join(hit, "doc_id", "left_anti")
        survivors = keep_in_graph.unionByName(isolated)
        # Shingle-less docs have no bands: always accepted.
        bandless = docs.select("doc_id").join(
            bands.select("doc_id").distinct(), "doc_id", "left_anti"
        )
        keep = survivors.unionByName(bandless)
        # 3. idempotent writes: batch=<id> subdirs, overwrite semantics.
        (
            docs.join(keep, "doc_id", "left_semi")
            .write.mode("overwrite")
            .parquet(os.path.join(self.docs_path, f"batch={batch_id}"))
        )
        (
            bands.join(survivors, "doc_id", "left_semi")
            .write.mode("overwrite")
            .parquet(os.path.join(self.bands_path, f"batch={batch_id}"))
        )

    # --- streaming drivers ----------------------------------------------

    def start(
        self,
        docs_stream: DataFrame,
        checkpoint: str,
        available_now: bool = True,
        trigger_interval: str | None = None,
    ) -> StreamingQuery:
        writer = docs_stream.writeStream.foreachBatch(
            self.process_batch
        ).option("checkpointLocation", checkpoint)
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_interval:
            writer = writer.trigger(processingTime=trigger_interval)
        q = writer.start()
        # Tracked so compact_index can refuse to run concurrently with
        # an active ingestion query (ADVICE r04) instead of relying on
        # caller discipline alone.
        self._queries = [x for x in self._queries if x.isActive]
        self._queries.append(q)
        return q

    def ingest_available(
        self, docs_stream: DataFrame, checkpoint: str, timeout_s: float = 300.0
    ) -> None:
        """Synchronous availableNow pass (the testable form): fold every
        pending micro-batch, then return."""
        q = self.start(docs_stream, checkpoint, available_now=True)
        try:
            q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()

    def compact_index(self) -> None:
        """Fold the per-batch band-index directories into one base dir.

        Long-running ingestion accumulates one ``batch=<id>`` directory
        per micro-batch; every batch's index read lists them all, so the
        listing cost grows with batch count. Folding rewrites all bands
        under a FRESH negative batch id (below every real batch id, so
        ``batch < N`` reads keep including it, and never the same id as
        the previous fold) and then removes every superseded directory —
        previous fold included — only after the new one is live.

        Crash safety needs no commit protocol here: the fold is written
        BEFORE the old dirs are removed, and duplicate band rows (fold
        written, crash before removal — or a partially promoted fold on
        an object store, where promote is per-object copy, not rename)
        are harmless — the index is only ever consumed by semi-joins,
        for which membership is idempotent. Run it only AFTER the
        ingestion query has committed its checkpoint (e.g. after
        ``ingest_available`` returns), never concurrently with one: a
        not-yet-checkpointed batch's bands, once folded into the base,
        would make that batch's replay self-collide and drop its
        documents (the per-batch layout exists precisely so replays
        exclude their own bands). Queries started through :meth:`start`
        are tracked and enforce this — compact_index raises while any
        is active.

        All directory maintenance goes through the :class:`DirOps`
        seam, so the index survives the same object-store swap as the
        event store's commit point (r04 brief item 2): LocalDirOps for
        POSIX trees, ObjectStoreDirOps-shaped implementations for flat
        namespaces.
        """
        active = [q for q in self._queries if q.isActive]
        if active:
            raise RuntimeError(
                "compact_index must not run while an ingestion query "
                f"started by this object is active ({len(active)} "
                "running): a not-yet-checkpointed batch's bands folded "
                "into the base would make its replay self-collide and "
                "drop its documents; stop the query (or let "
                "ingest_available return) first"
            )
        if not self.ops.exists(self.bands_path):
            return
        dirs = [
            d
            for d in self.ops.list_subdirs(self.bands_path)
            if d.startswith("batch=")
        ]
        ids = [int(d.split("=")[1]) for d in dirs]
        if len([i for i in ids if i >= 0]) == 0 and len(ids) <= 1:
            return  # nothing to fold
        idx = (
            self.spark.read.schema(_BANDS_READ_SCHEMA)
            .option("basePath", self.bands_path)
            .parquet(self.bands_path)
            .select("doc_id", "band_idx", "band_digest")
            .distinct()
        )
        tmp = os.path.join(self.bands_path, ".fold-tmp")
        idx.write.mode("overwrite").parquet(tmp)
        # Make the NEW fold visible first, under a FRESH negative id (so
        # it never collides with the previous fold), and only then
        # remove the superseded dirs: a crash between the two steps
        # leaves duplicate band rows, which the semi-join consumer
        # cannot observe — the old base is never deleted before its
        # replacement is live. promote may itself be non-atomic
        # (object-store copy+delete): a partial fold next to intact old
        # dirs is still just duplicates.
        new_id = min([i for i in ids if i < 0], default=0) - 1
        self.ops.promote(tmp, os.path.join(self.bands_path, f"batch={new_id}"))
        for d in dirs:
            self.ops.remove(os.path.join(self.bands_path, d))

    def corpus(self) -> DataFrame:
        """The accepted corpus so far (doc_id, text, batch)."""
        if not self.ops.exists(self.docs_path):
            return self.spark.createDataFrame([], _DOCS_READ_SCHEMA)
        return (
            self.spark.read.schema(_DOCS_READ_SCHEMA)
            .option("basePath", self.docs_path)
            .parquet(self.docs_path)
        )
