"""Model-based randomized parity test — the reference fuzzer, ported.

The reference's centerpiece test is a model-based fuzzer
(``fuzz/fuzz_targets/commands.rs``): a pure in-memory ``DatabaseModel``
oracle (:41-160) runs an arbitrary command sequence — AppendSingle,
AppendMultiple, ReadEvent, ReadStream, ReadPartition, ReopenDatabase —
against the real database and asserts equivalence. The semantics live in
the oracle, which transfers verbatim to Python; the Spark engine must
agree with it on every read after every command.

Beyond the reference's command set, the sequence also exercises this
engine's maintenance extensions against the same model: compaction,
time-travel snapshots, the change feed, tokened replay, stale-writer
CAS races, and stream deletion (hard + scrub) — hard delete must erase
versions (re-appends restart at 0) while partition sequences keep
their gaps.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field

import pytest
from pyspark.sql import functions as F

from sierradb_spark import ids
from sierradb_spark import versions as V
from sierradb_spark.config import EngineConfig
from sierradb_spark.eventstore import AppendRequest, EventStore

N_PARTITIONS = 32


@dataclass
class ModelEvent:
    stream_id: str
    stream_version: int
    partition_id: int
    partition_sequence: int
    event_name: str
    payload: bytes


@dataclass
class DatabaseModel:
    """Pure-Python oracle (commands.rs:41-160): dict partitions, stream
    versions, all-or-nothing transactional appends."""

    partitions: dict[int, list[ModelEvent]] = field(default_factory=dict)
    stream_versions: dict[str, int] = field(default_factory=dict)
    # Next partition sequence per partition. NOT len(partitions[pid]):
    # a hard delete removes events but carries the watermark, so new
    # appends continue AFTER the old max sequence (gaps stay gaps).
    partition_seqs: dict[int, int] = field(default_factory=dict)

    def partition_of(self, stream_id: str) -> int:
        pkey = str(ids.partition_key_for_stream(stream_id))
        return ids.partition_id_for_hash(
            ids.uuid_to_partition_hash(pkey), N_PARTITIONS
        )

    def append_txn(
        self, reqs: list[tuple[str, str, str, bytes]]
    ) -> tuple[bool, list[int]]:
        """[(stream_id, event_name, expected_version, payload)] →
        (accepted, stream_versions). Validates the whole txn against
        current + in-txn state before applying (database.rs:867-897)."""
        staged = dict()
        versions = []
        for stream_id, _name, expected, _p in reqs:
            cur = staged.get(stream_id, self.stream_versions.get(stream_id))
            if not V.is_satisfied_by(V.parse_expected_version(expected), cur):
                return False, []
            nv = V.next_version(cur)
            staged[stream_id] = nv
            versions.append(nv)
        for (stream_id, name, _e, payload), nv in zip(reqs, versions):
            pid = self.partition_of(stream_id)
            part = self.partitions.setdefault(pid, [])
            seq = self.partition_seqs.get(pid, 0)
            part.append(ModelEvent(stream_id, nv, pid, seq, name, payload))
            self.partition_seqs[pid] = seq + 1
            self.stream_versions[stream_id] = nv
        return True, versions

    def delete_streams(self, stream_ids: list[str], mode: str) -> int:
        """Model of EventStore.delete_streams (store.py:1637): hard mode
        erases the streams' events and head versions (a later append
        restarts at version 0); scrub blanks payloads in place. Either
        way remaining partition sequences keep their positions and the
        next-sequence counters are untouched."""
        sids = set(stream_ids)
        n = 0
        for pid, part in self.partitions.items():
            if mode == "hard":
                kept = [e for e in part if e.stream_id not in sids]
                n += len(part) - len(kept)
                self.partitions[pid] = kept
            else:
                for e in part:
                    if e.stream_id in sids:
                        e.payload = b""
                        n += 1
        if mode == "hard":
            for s in sids:
                self.stream_versions.pop(s, None)
        return n

    def read_stream(self, stream_id: str) -> list[ModelEvent]:
        pid = self.partition_of(stream_id)
        return [e for e in self.partitions.get(pid, []) if e.stream_id == stream_id]

    def read_partition(self, pid: int) -> list[ModelEvent]:
        return list(self.partitions.get(pid, []))


STREAMS = [f"stream-{i}" for i in range(8)]
NAMES = ["Created", "Updated", "Deleted"]

_REQ_COLS = [
    "arrival", "txn_id", "stream_id", "event_name", "expected_version",
    "event_id", "partition_key", "partition_id", "timestamp_ns",
    "payload", "metadata", "reject_reason",
]


def _tokened_apply(store: EventStore, spark, reqs, token: str, pre_commit=None):
    """Apply [(stream, name, expected)] through the streaming-batch path
    with an idempotence token; returns the pinned enriched df + results."""
    from sierradb_spark.streaming.ingest import enrich_requests

    df = spark.createDataFrame(
        reqs, "stream_id string, event_name string, expected_version string"
    )
    enriched = (
        enrich_requests(df, store.config)
        .select(*_REQ_COLS)
        .localCheckpoint(eager=True)  # pin generated ids across replays
    )
    return enriched, store._apply_batch(
        enriched, fast=False, batch_token=token, pre_commit=pre_commit
    )


def random_expected(rng: random.Random, model: DatabaseModel, stream: str) -> str:
    """Weighted expected-version generation (commands.rs:522-850): mostly
    valid, sometimes deliberately conflicting."""
    roll = rng.random()
    cur = model.stream_versions.get(stream)
    if roll < 0.4:
        return "any"
    if roll < 0.55:
        return "empty" if cur is None else str(cur)
    if roll < 0.7:
        return "exists"
    # adversarial: exact version that may or may not match
    return str(rng.randrange(0, 5))


# Default seeds keep the suite bounded; extend for a deeper fuzz
# session with e.g. SPARK_GRAFT_FUZZ_SEEDS="7,19,101,777". Seeds run
# green in round 5's extended sessions (delete branch included) and
# 40 distinct seeds re-ran green in round 7's (all-rejected
# empty-manifest commits + dead-letter orphan read/prune
# discrimination included): 7, 19, 101, 777, 2024, 3, 13, 37, 55,
# 123, 999, 31337, 424242, 86, 5150, 271828, 161803, 141421, 577215,
# 662607, 12345, 54321, 98765, 1000003, 2718, 314159, 112358, 132134,
# 555, 8675309, 20260815, 700, 1729, 4104, 63, 9999, 123456789,
# 42424242, 808, 2047. Round 8 added 12 more fresh seeds, green on
# the final r8 code (path-stable query key + graceful-empty
# read_dead_letters): 17, 29, 47, 61, 89, 211, 401, 613, 881, 1009,
# 65537, 7919 — and two more r8 batches of 12 each on the post-spread
# code: 23, 31, 53, 71, 97, 127, 251, 503, 733, 919, 104729, 6700417;
# 149, 173, 197, 223, 269, 331, 409, 521, 647, 787, 911, 1013.
# Round 9 added 12 more on the r9 code (width-aware spread + memo
# executor-loss listener landed): 167, 239, 293, 353, 431, 467, 587,
# 683, 769, 823, 947, 104003 — and a second r9 batch of 12 on the
# final r9 code (memo pass + targeted executor-loss invalidation):
# 181, 227, 281, 349, 419, 457, 569, 641, 743, 829, 953, 1000033 —
# cumulative distinct seeds green through r9: 100. Round 10 added the
# memo-lifecycle command to the mix (which re-shapes every seed's
# command stream — the oracle is sequence-agnostic, so old seeds remain
# valid inputs) and ran 12 fresh seeds green on the r10 code (memo
# race guard + deterministic block release + the new command): 191,
# 233, 307, 373, 443, 479, 601, 691, 797, 853, 967, 1000211 — and a
# second r10 batch of 12 on the final r10 code (staging release, the
# revenue prefix-sum and map-only k-means rewrites landed): 199, 257,
# 311, 383, 449, 491, 607, 709, 811, 857, 971, 1000253. Round 11 ran
# 12 fresh seeds green on the final r11 code (scoped insert guard +
# pending_guard + real listener deregistration landed): 263, 317, 389,
# 461, 499, 617, 719, 821, 859, 977, 983, 1000303 — and a third r11
# batch of 12 on the post-review-fix code (thread-scoped _pending,
# begin() on the BPE bypass path, contained success-path warn): 271,
# 337, 397, 463, 509, 619, 727, 827, 863, 991, 997, 1000313 —
# cumulative distinct seeds green: 148.
_SEEDS = [
    int(s)
    for s in os.environ.get("SPARK_GRAFT_FUZZ_SEEDS", "11,42").split(",")
    if s.strip()
]


@pytest.mark.slow  # r12 slow tier: seeded command-sequence fuzz (~75 s)
@pytest.mark.parametrize("seed", _SEEDS)
def test_randomized_command_sequence(spark, tmp_path, seed):
    rng = random.Random(seed)
    model = DatabaseModel()
    store = EventStore(
        spark, str(tmp_path / "store"), EngineConfig(shuffle_partitions=8)
    )

    def check_stream(stream_id: str) -> None:
        got = [
            (r["stream_id"], r["stream_version"], r["event_name"], bytes(r["payload"]))
            for r in store.scan(stream_id).collect()
        ]
        want = [
            (e.stream_id, e.stream_version, e.event_name, e.payload)
            for e in model.read_stream(stream_id)
        ]
        assert got == want, f"stream {stream_id} diverged (seed {seed})"

    def check_partition(pid: int) -> None:
        got = [
            (r["partition_sequence"], r["stream_id"], r["stream_version"])
            for r in store.pscan(pid).collect()
        ]
        want = [
            (e.partition_sequence, e.stream_id, e.stream_version)
            for e in model.read_partition(pid)
        ]
        assert got == want, f"partition {pid} diverged (seed {seed})"

    # Time-travel oracle: model state frozen at store commit numbers.
    # as_of reads must reproduce the frozen state exactly; compaction
    # (retain 0) expires every pre-base snapshot, which must raise.
    import copy

    from sierradb_spark.eventstore.store import SnapshotExpiredError

    snapshots: dict[int, DatabaseModel] = {}

    def maybe_snapshot() -> None:
        if rng.random() < 0.5:
            c = store._read_state().commit
            if c > 0:
                snapshots[c] = copy.deepcopy(model)

    # Change-feed oracle: the events each commit added, by commit number
    # (checked against store.changes at the end); bases contribute
    # nothing, swept incrementals must raise.
    commit_events: dict[int, list[tuple]] = {}
    swept: set[int] = set()
    bases: set[int] = set()

    def record_commit(prev_head: int, accepted: list[tuple]) -> None:
        head = store._read_state().commit
        if head > prev_head and accepted:
            commit_events[head] = sorted(accepted)

    # Memo-lifecycle oracle (r10, VERDICT r9 item 6): the session memos
    # (functions/memo.py) were covered only by dedicated tests, never
    # interleaved with other commands mid-sequence. The command below
    # randomly clears/invalidates them and asserts the consumer REBUILDS
    # to the identical relation (value hash frozen at first use), from a
    # fresh object — never a resurrected dropped plan.
    from sierradb_spark.functions import dedup_wide
    from sierradb_spark.functions.memo import (
        clear_session_memos,
        invalidate_sf_dir,
    )

    memo_sf = "/root/testdata/sf0.001"
    memo_baseline: dict[str, tuple] = {}

    def memo_consumer_fingerprint() -> tuple:
        df = dedup_wide._wide_bands(spark, memo_sf)
        row = df.select(
            F.xxhash64(*[F.col(c) for c in df.columns]).alias("rh")
        ).agg(
            F.count("*").alias("n"),
            # bit_xor, not sum: order-insensitive AND immune to the
            # ANSI-mode long-overflow a sum of int64 hashes trips.
            F.expr("bit_xor(rh)").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    n_appends = 0
    for step in range(30):
        roll = rng.random()
        if roll < 0.05:  # delete streams (hard or scrub) vs model
            sids = rng.sample(STREAMS, rng.randrange(1, 3))
            mode = rng.choice(["hard", "scrub"])
            base_before = store._read_state().commit
            res = store.delete_streams(sids, mode=mode)
            want_n = model.delete_streams(sids, mode)
            assert res["events_affected"] == want_n, (
                f"delete affected {res['events_affected']} != model "
                f"{want_n} at step {step} (seed {seed})"
            )
            if res["events_affected"] == 0:
                # nothing touched → no commit published, nothing swept
                assert res["commit"] == base_before
            else:
                # delete publishes a BASE manifest and (retain 0) sweeps
                # the pre-base chain — identical bookkeeping to compact
                for c in list(snapshots):
                    if c <= base_before and base_before > 0:
                        with pytest.raises(SnapshotExpiredError):
                            store.events(as_of=c)
                    del snapshots[c]
                bases.add(base_before + 1)
                swept.update(range(1, base_before + 1))
                for c in list(commit_events):
                    if c <= base_before:
                        del commit_events[c]
            for s in sids:  # deleted/scrubbed streams read back exactly
                check_stream(s)
                assert store.stream_version(s) == model.stream_versions.get(s)
        elif roll < 0.07:  # memo lifecycle: clear/invalidate mid-sequence
            key = (spark.sparkContext.applicationId, memo_sf)
            before = dedup_wide._wide_bands(spark, memo_sf)
            if "fp" not in memo_baseline:
                memo_baseline["fp"] = memo_consumer_fingerprint()
            if rng.random() < 0.5:
                assert invalidate_sf_dir(memo_sf) >= 1, f"step {step}"
            else:
                assert clear_session_memos(), f"step {step}"
            assert key not in dedup_wide._BANDS_MEMO
            rebuilt = dedup_wide._wide_bands(spark, memo_sf)
            assert rebuilt is not before, (
                f"dropped memo plan resurrected at step {step} (seed {seed})"
            )
            assert memo_consumer_fingerprint() == memo_baseline["fp"], (
                f"memo consumer rebuilt differently at step {step} (seed {seed})"
            )
        elif roll < 0.55:  # append batch (single-event txns)
            reqs = []
            for _ in range(rng.randrange(1, 6)):
                s = rng.choice(STREAMS)
                reqs.append(
                    (s, rng.choice(NAMES), random_expected(rng, model, s), b"p")
                )
            # model applies txns serially in arrival order — same order
            # the store serializes them within the batch
            expected_results = []
            for r in reqs:
                ok, vers = model.append_txn([r])
                expected_results.append((ok, vers[0] if ok else None))
            prev_head = store._read_state().commit
            res = store.append(
                [
                    AppendRequest(s, n, payload=p, expected_version=e)
                    for (s, n, e, p) in reqs
                ]
            )
            got = [(r.accepted, r.stream_version) for r in res]
            assert got == expected_results, f"append diverged at step {step} (seed {seed})"
            record_commit(
                prev_head,
                [
                    (r.stream_id, r.stream_version, r.partition_id)
                    for r in res
                    if r.accepted
                ],
            )
            n_appends += 1
            maybe_snapshot()
        elif roll < 0.7:  # multi-event atomic txn on one stream's partition
            s = rng.choice(STREAMS)
            pkey = str(ids.partition_key_for_stream(s))
            reqs = [
                (s, rng.choice(NAMES), random_expected(rng, model, s), b"t")
                for _ in range(rng.randrange(2, 4))
            ]
            ok, vers = model.append_txn(reqs)
            prev_head = store._read_state().commit
            res = store.append_transaction(
                [
                    AppendRequest(
                        s, n, payload=p, expected_version=e, partition_key=pkey
                    )
                    for (s, n, e, p) in reqs
                ]
            )
            record_commit(
                prev_head,
                [
                    (r.stream_id, r.stream_version, r.partition_id)
                    for r in res
                    if r.accepted
                ],
            )
            assert all(r.accepted for r in res) == ok, f"txn diverged step {step} (seed {seed})"
            if ok:
                assert [r.stream_version for r in res] == vers
        elif roll < 0.82:  # read checks
            check_stream(rng.choice(STREAMS))
        elif roll < 0.86:
            pid = model.partition_of(rng.choice(STREAMS))
            check_partition(pid)
        elif roll < 0.88:  # time-travel read vs frozen model snapshot
            if snapshots:
                c = rng.choice(sorted(snapshots))
                frozen = snapshots[c]
                s = rng.choice(STREAMS)
                got = [
                    (r["stream_id"], r["stream_version"], r["event_name"])
                    for r in store.scan(s, as_of=c).collect()
                ]
                want = [
                    (e.stream_id, e.stream_version, e.event_name)
                    for e in frozen.read_stream(s)
                ]
                assert got == want, f"as_of={c} stream {s} diverged (seed {seed})"
                assert (
                    store.stream_version(s, as_of=c)
                    == frozen.stream_versions.get(s)
                ), f"as_of={c} ESVER diverged (seed {seed})"
        elif roll < 0.90:  # ESVER vs model head
            s = rng.choice(STREAMS)
            assert store.stream_version(s) == model.stream_versions.get(s)
        elif roll < 0.93:  # compaction mid-sequence must not change state
            base_before = store._read_state().commit
            store.compact()
            # retain 0 sweeps the pre-base chain: every saved snapshot
            # below the new base must now raise, not return partial data
            for c in list(snapshots):
                if c <= base_before and base_before > 0:
                    with pytest.raises(SnapshotExpiredError):
                        store.events(as_of=c)
                del snapshots[c]
            if store._read_state().commit > base_before:
                bases.add(base_before + 1)
                # EVERY manifest at/below base_before is unlinked by the
                # retain-0 sweep — including a previous compaction's BASE
                # manifest, which recorded no events but whose absence
                # still makes changes() ranges crossing it unresolvable.
                swept.update(range(1, base_before + 1))
                for c in list(commit_events):
                    if c <= base_before:
                        del commit_events[c]
        elif roll < 0.96:
            # Tokened append + immediate replay (the crash-between-
            # manifest-and-checkpoint scenario): the replay must be a
            # whole-batch no-op, whatever the batch contents.
            reqs = []
            for _ in range(rng.randrange(1, 4)):
                s = rng.choice(STREAMS)
                reqs.append((s, rng.choice(NAMES), random_expected(rng, model, s)))
            expected_results = []
            for s, n, e in reqs:
                ok, vers = model.append_txn([(s, n, e, b"")])
                expected_results.append((ok, vers[0] if ok else None))
            token = f"fuzz-{seed}-{step}"
            prev_head = store._read_state().commit
            # Half the tokened appends also exercise the dead-letter
            # pre-commit hook (streaming/ingest.py's crash-window
            # guarantee): the hook must observe the token NOT yet in
            # the chain, the letters must exactly match the rejected
            # requests, and the replay (token fast path, hook never
            # invoked) must leave them in place.
            dlq = None
            hook_order: list[bool] = []
            if rng.random() < 0.5:
                dlq = str(tmp_path / f"dlq-{seed}-{step}")

                def dlq_hook(result, _token=token, _dlq=dlq, _ord=hook_order):
                    _ord.append(_token in store._read_state().batch_tokens)
                    rej = result.where(~F.col("accepted"))
                    if not rej.isEmpty():
                        # token-stamped like the production hook, so the
                        # read_dead_letters contract can be fuzzed below
                        rej.withColumn(
                            "batch_token", F.lit(_token)
                        ).write.mode("overwrite").parquet(
                            os.path.join(_dlq, "batch=0")
                        )
            enriched, res = _tokened_apply(
                store, spark, reqs, token,
                pre_commit=dlq_hook if dlq is not None else None,
            )
            record_commit(
                prev_head,
                [
                    (r["stream_id"], r["stream_version"], r["partition_id"])
                    for r in res.where("accepted").collect()
                ],
            )
            got = [
                (r["accepted"], r["stream_version"])
                for r in res.orderBy("arrival").collect()
            ]
            assert got == expected_results, f"tokened append diverged step {step}"
            if dlq is not None:
                # The hook ran exactly once per commit ATTEMPT, always
                # before the manifest landed; letters == the rejects.
                assert hook_order and not any(hook_order), (
                    f"hook ran after commit at step {step}"
                )
                want_dead = sorted(
                    s for (s, _n, _e), (ok, _v) in zip(reqs, expected_results)
                    if not ok
                )
                got_dead = (
                    sorted(
                        r["stream_id"]
                        for r in spark.read.parquet(dlq).collect()
                    )
                    if want_dead
                    else []
                )
                assert got_dead == want_dead, f"dead letters diverged step {step}"
            replay = store._apply_batch(
                enriched, fast=False, batch_token=token,
                pre_commit=dlq_hook if dlq is not None else None,
            )
            # EVERY tokened batch commits its token — an all-rejected
            # batch publishes an EMPTY manifest carrying it (store.py
            # _commit) — so the replay is always the fast-path skip.
            assert replay.count() == 0, f"replay not skipped at step {step}"
            assert token in store._read_state().batch_tokens, (
                f"token not committed at step {step}"
            )
            if not any(ok for ok, _ in expected_results):
                # the all-rejected empty commit advances the chain but
                # records no change-feed delta (record_commit above got
                # an empty accepted list — nothing to record)
                assert store._read_state().commit == prev_head + 1
            if dlq is not None:
                # fast-path replay: hook NOT re-invoked, letters intact
                assert len(hook_order) == 1, (
                    f"hook re-ran on fast-path replay at step {step}"
                )
                want_dead = sorted(
                    s
                    for (s, _n, _e), (ok2, _v) in zip(reqs, expected_results)
                    if not ok2
                )
                if want_dead:
                    assert sorted(
                        r["stream_id"]
                        for r in spark.read.parquet(dlq).collect()
                    ) == want_dead, f"letters lost on replay step {step}"
                    # Orphan discrimination (read contract): the real
                    # letters' token is committed, so read_dead_letters
                    # keeps them; a forged orphan dir (crash between the
                    # pre-commit write and the manifest rename, never
                    # replayed) is filtered out and physically pruned.
                    from sierradb_spark.streaming.ingest import (
                        prune_dead_letters,
                        read_dead_letters,
                    )

                    orphan_tok = f"fuzz-{seed}-{step}-orphan-999999"
                    spark.read.parquet(
                        os.path.join(dlq, "batch=0")
                    ).withColumn(
                        "batch_token", F.lit(orphan_tok)
                    ).write.mode("overwrite").parquet(
                        os.path.join(dlq, "batch=999999")
                    )
                    assert sorted(
                        r["stream_id"]
                        for r in read_dead_letters(store, dlq).collect()
                    ) == want_dead, f"orphan letters surfaced step {step}"
                    removed = prune_dead_letters(store, dlq)
                    assert removed["orphaned"] == 1, (
                        f"orphan dir not pruned step {step}"
                    )
                    assert sorted(
                        r["stream_id"]
                        for r in spark.read.parquet(dlq).collect()
                    ) == want_dead, f"prune touched real letters step {step}"
            n_appends += 1
        elif roll < 0.98:
            # Stale concurrent writer: a second handle holding old state
            # must lose the manifest CAS; committed data is untouched.
            from sierradb_spark.eventstore.store import ConcurrentWriteError

            s2 = EventStore(
                spark, str(tmp_path / "store"), EngineConfig(shuffle_partitions=8)
            )
            stale = s2._read_state()
            s = rng.choice(STREAMS)
            ok, vers = model.append_txn([(s, "RaceWinner", "any", b"")])
            assert ok
            prev_head = store._read_state().commit
            res = store.append([AppendRequest(s, "RaceWinner")])
            record_commit(
                prev_head,
                [
                    (r.stream_id, r.stream_version, r.partition_id)
                    for r in res
                    if r.accepted
                ],
            )
            if stale.commit > 0 or store._read_state().commit > stale.commit:
                with pytest.raises(ConcurrentWriteError):
                    s2._write_manifest(
                        {
                            "commit": stale.commit + 1,
                            "base": False,
                            "events_add": [],
                            "heads_add": [],
                            "watermarks": {},
                        }
                    )
        else:  # ReopenDatabase (commands.rs:332): fresh handle, same path
            store = EventStore(
                spark, str(tmp_path / "store"), EngineConfig(shuffle_partitions=8)
            )

    # final full sweep
    for s in STREAMS:
        check_stream(s)
    for pid in {model.partition_of(s) for s in STREAMS}:
        check_partition(pid)
    assert n_appends > 0

    # change-feed sweep: for a handful of since points, changes(since)
    # must equal exactly the recorded per-commit deltas above it —
    # or raise SnapshotExpiredError when a needed incremental was swept.
    head = store._read_state().commit
    for since in sorted(
        set([0, head] + [rng.randrange(0, head + 1) for _ in range(6)])
    ):
        needed = range(since + 1, head + 1)
        if any(c in swept for c in needed):
            with pytest.raises(SnapshotExpiredError):
                store.changes(since).collect()
            continue
        want = sorted(
            t for c in needed if c in commit_events for t in commit_events[c]
        )
        got = sorted(
            (r["stream_id"], r["stream_version"], r["partition_id"])
            for r in store.changes(since).collect()
        )
        assert got == want, f"changes({since}) diverged (seed {seed})"
