"""Session-scoped plan memos: central registry + lifecycle hooks.

Several exact-baseline audit passes (the 64-hash MinHash signature
pass, the O(n²) cosine pair scan, the shingle-set relation, their
downstream fixpoints) are shared by many registry queries over the
SAME immutable corpus. Each family pins its pass once per
``(applicationId, sf_dir)`` behind a ``localCheckpoint`` — the
engine-level analogue of the materialized signature index the
production path persists on disk (``streaming/corpus.py``).

The memos assume:

1. **Immutable inputs.** A memo key is ``(applicationId, sf_dir)``;
   nothing watches the files. If you regenerate or mutate the data
   under an ``sf_dir`` inside a live session, call
   :func:`invalidate_sf_dir` (or :func:`clear_session_memos`) first —
   otherwise consumers silently serve the pre-mutation pass.
2. **Stable executors.** ``localCheckpoint`` blocks are NOT
   fault-tolerant: on a multi-executor cluster, losing an executor
   permanently breaks every plan that references its blocks. Fine in
   local mode and for bounded bench/audit sessions. On a cluster the
   escape hatch is automatic: ``get_spark`` installs
   :class:`ExecutorLossListener` for non-local masters, which on
   ``onExecutorRemoved`` drops exactly the entries whose build-time
   executor stamp contains the removed id (entries built while that
   executor was absent cannot reference its blocks and stay warm —
   what keeps memos useful under dynamic allocation), so the next
   consumer rebuilds from the source tables instead of failing. The
   manual :func:`clear_session_memos` remains for sessions built
   outside the factory; persisting the pass to a real table is the
   production posture (see docs/SCALE.md).

Every memo dict in the package is created through :func:`register_memo`
so the lifecycle hooks cover new families automatically — a family
added with a bare module-level ``{}`` would escape the hooks, which is
why ``tests/test_dedup_wide.py`` asserts the registered-family names.
"""

from __future__ import annotations

import re
import threading

# One lock for every memo mutation: _MemoDict inserts run on the main
# thread while ExecutorLossListener.onExecutorRemoved runs on the py4j
# callback thread and iterates/deletes across families — without the
# lock a removal racing an insert could raise "dictionary changed size
# during iteration" inside the handler and silently lose the
# invalidation. RLock because invalidate_* holds it while __delitem__
# re-enters.
_LOCK = threading.RLock()

# Bumped (under _LOCK) by every invalidation path — executor removal,
# sf_dir invalidation, full clear. ``_MemoDict.get`` snapshots it on a
# miss (= build start) and ``__setitem__`` refuses to cache when it
# moved during the build: a removal whose listener event was processed
# BEFORE the insert would otherwise never be matched against the new
# entry's stamp, permanently caching a plan that references dead
# localCheckpoint blocks. (Same guard keeps a build that raced a manual
# ``invalidate_sf_dir`` from resurrecting a pre-mutation pass.)
_REMOVAL_EPOCH = 0

# "local" / "local[...]" only. "local-cluster[...]" runs REAL separate
# executor JVMs whose loss kills localCheckpoint blocks, so it must
# take the cluster path (real stamps + the loss listener), not the
# driver-only shortcut.
_LOCAL_MASTER = re.compile(r"local(\[|$)")


def _live_ids_from_sc(sc) -> frozenset[str] | None:
    if _LOCAL_MASTER.match(sc.master):
        # the sole executor IS the driver; getExecutorIds() would
        # return empty (and log a scheduler warning) here
        return frozenset({"driver"})
    seq = sc._jsc.sc().getExecutorIds()  # Scala Seq via py4j
    return frozenset(str(seq.apply(i)) for i in range(seq.size()))


def _live_executor_ids(df) -> frozenset[str] | None:
    """Executor ids currently alive in ``df``'s SparkContext, or None
    if introspection fails (e.g. a mocked session). Used to stamp memo
    entries at build time: a localCheckpoint's blocks can only live on
    executors that existed when it materialized, so a LATER-joining
    executor's removal (routine under dynamic allocation) cannot have
    killed them."""
    try:
        return _live_ids_from_sc(df.sparkSession.sparkContext)
    except Exception:
        return None


def _active_live_ids() -> frozenset[str] | None:
    """Live executor ids via the thread's active session — the
    pre-build half of an entry's stamp, taken at ``get``-miss time
    (``_MemoDict.get`` has no DataFrame to introspect yet)."""
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            return None
        return _live_ids_from_sc(spark.sparkContext)
    except Exception:
        return None


def _release_blocks(value) -> None:
    """Best-effort: free a dropped entry's localCheckpoint blocks NOW
    instead of waiting for Python GC + the ContextCleaner (in a
    long-lived session cycling many (app, sf_dir) keys, dead blocks
    otherwise linger in executor storage indefinitely). A plain
    ``df.unpersist()`` is a no-op here — the blocks belong to the
    internal RDD behind the checkpointed plan's LogicalRDD, not to a
    CacheManager entry — so go through the analyzed plan (verified to
    empty ``getRDDStorageInfo`` for both eager and lazy
    localCheckpoints). Non-DataFrame values and non-checkpoint plans
    fall through harmlessly. After this, the dropped DataFrame is
    unrecoverable (truncated lineage) — which is the point: consumers
    must rebuild from source, never resurrect the dropped pass."""
    try:
        value._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def release_checkpoint(df) -> None:
    """Public form of :func:`_release_blocks` for TRANSIENT staging
    checkpoints — builder-internal barriers (e.g. the materialized
    shingle/digest arrays behind the banded-LSH passes) whose blocks
    are dead as soon as the derived memoized relation has materialized.
    Releasing them deterministically keeps rebuild churn and streaming
    micro-batch loops storage-flat instead of GC-paced. Only call once
    every consumer of the staging plan has materialized; the DataFrame
    is unrecoverable afterwards."""
    _release_blocks(df)


class _MemoDict(dict):
    """A memo family: ``(applicationId, sf_dir) -> DataFrame`` with the
    live-executor set stamped per entry at insertion time (kept in a
    side table so consumers keep the plain-dict interface). The stamp
    lets :func:`invalidate_executor` drop exactly the entries whose
    blocks the removed executor could hold, instead of nuking every
    memo on every routine dynamic-allocation removal."""

    def __init__(self) -> None:
        super().__init__()
        self.built_on: dict = {}
        # key -> (epoch at get-miss, live executor ids at get-miss):
        # the build-start snapshot backing the two race guards in
        # __setitem__. Every builder follows get-miss -> build ->
        # insert, so the miss IS build start.
        self._pending: dict = {}

    def get(self, key, default=None):
        with _LOCK:
            if super().__contains__(key):
                return super().__getitem__(key)
            self._pending[key] = (_REMOVAL_EPOCH, _active_live_ids())
            return default

    def __setitem__(self, key, value) -> None:
        with _LOCK:
            pend = self._pending.pop(key, None)
            if pend is not None and pend[0] != _REMOVAL_EPOCH:
                # An invalidation (executor removal, sf_dir mutation,
                # full clear) overlapped the build window. The new
                # value may reference blocks that died mid-build — or
                # be a pass over pre-mutation data — and the
                # invalidation that would have dropped it already ran.
                # Refuse to cache; the caller still gets its DataFrame
                # (one-shot), the next consumer rebuilds.
                import warnings

                warnings.warn(
                    f"memo insert for {key} skipped: an invalidation "
                    "overlapped the build (entry would dodge it)",
                    stacklevel=2,
                )
                return
            old = super().get(key)
            super().__setitem__(key, value)
            self.built_on[key] = self._stamp(value, pend)
            if old is not None and old is not value:
                _release_blocks(old)

    @staticmethod
    def _stamp(value, pend) -> frozenset[str] | None:
        """Union of pre-build (get-miss snapshot) and post-build live
        executor sets: blocks can only live on executors alive during
        materialization, but an executor removed right after
        materialization is already absent from the post-build snapshot
        while its removal event is still in flight on the async bus —
        only the pre-build half keeps the later invalidate_executor
        call matching. Driver-side values (no sparkSession — e.g. the
        learned BPE merge list) hold no executor blocks at all and get
        an empty stamp: they survive every removal, and sf_dir/clear
        invalidation still covers them. None (introspection failed) =
        conservatively invalidated on every removal."""
        if not hasattr(value, "sparkSession"):
            return frozenset()
        post = _live_executor_ids(value)
        pre = pend[1] if pend is not None else None
        if post is None or pre is None:
            return None
        return pre | post

    def __delitem__(self, key) -> None:
        with _LOCK:
            value = super().get(key)
            super().__delitem__(key)
            self.built_on.pop(key, None)
            _release_blocks(value)

    def clear(self) -> None:
        with _LOCK:
            values = list(super().values())
            super().clear()
            self.built_on.clear()
            # _pending is NOT cleared: in-flight builds must still hit
            # the epoch guard at insert time, not sneak in stampless.
            for v in values:
                _release_blocks(v)


_FAMILIES: dict[str, _MemoDict] = {}


def register_memo(name: str) -> dict:
    """Create and register one memo family (a ``(applicationId,
    sf_dir) -> DataFrame`` dict). Called at module import time; the
    returned dict is the module's memo store."""
    if name in _FAMILIES:
        raise ValueError(f"duplicate memo family {name}")
    _FAMILIES[name] = _MemoDict()
    return _FAMILIES[name]


def memo_families() -> dict[str, int]:
    """Registered family name -> number of live (session, sf_dir)
    entries. Introspection for tests and capacity audits."""
    with _LOCK:
        return {name: len(d) for name, d in _FAMILIES.items()}


def clear_session_memos() -> dict[str, int]:
    """Drop EVERY memoized pass in the session. Returns the number of
    entries cleared per family.

    Use after mutating data under a memoized ``sf_dir``, after a
    recovered executor loss (localCheckpoint blocks died with it), or
    to release the pinned blocks in a long-lived session. The next
    consumer of each family rebuilds from the source tables — correct,
    just cold."""
    global _REMOVAL_EPOCH
    with _LOCK:
        _REMOVAL_EPOCH += 1
        cleared = {name: len(d) for name, d in _FAMILIES.items() if d}
        for d in _FAMILIES.values():
            d.clear()
        return cleared


def invalidate_sf_dir(sf_dir: str) -> int:
    """Drop memo entries for one ``sf_dir`` across all families (every
    session key), keeping other corpora warm. Returns entries dropped."""
    global _REMOVAL_EPOCH
    with _LOCK:
        _REMOVAL_EPOCH += 1
        dropped = 0
        for d in _FAMILIES.values():
            stale = [k for k in d if k[1] == sf_dir]
            for k in stale:
                del d[k]
            dropped += len(stale)
        return dropped


def invalidate_executor(executor_id: str) -> dict[str, int]:
    """Drop the memo entries whose localCheckpoint blocks MAY have
    lived on ``executor_id``: those whose build-time executor stamp
    contains the id, plus any entry without a stamp (introspection
    failed at build — conservatively assume affected). An entry built
    while the executor was NOT alive cannot reference its blocks and
    stays warm — which is what keeps memos useful under dynamic
    allocation, where idle executors are removed routinely. Returns
    entries dropped per family."""
    global _REMOVAL_EPOCH
    with _LOCK:
        _REMOVAL_EPOCH += 1
        dropped: dict[str, int] = {}
        ex = str(executor_id)
        for name, d in _FAMILIES.items():
            stale = [
                k
                for k in d
                if (s := d.built_on.get(k)) is None or ex in s
            ]
            for k in stale:
                del d[k]
            if stale:
                dropped[name] = len(stale)
        return dropped


class ExecutorLossListener:
    """Driver-side SparkListener proxy that invalidates session memos
    when an executor is removed — the assumption-2 escape hatch above
    made automatic. A ``localCheckpoint`` block dies with its executor,
    so a memoized plan built while that executor was alive may now
    reference dead blocks; the listener drops exactly those entries
    (build-time executor stamp, see :class:`_MemoDict`) so routine
    dynamic-allocation removals of later-joined executors leave
    unaffected memos warm. The next consumer of a dropped entry
    rebuilds from the source tables.

    py4j proxies can only *implement* interfaces, not extend classes,
    so this implements the full ``SparkListenerInterface`` with a
    ``__getattr__`` no-op catch-all for every callback other than
    ``onExecutorRemoved``. Each event on the (async) listener bus costs
    one py4j round-trip — why :func:`install_executor_loss_listener`
    is wired up only where executor loss is possible (non-local
    masters; in ``local[*]`` the sole executor IS the session)."""

    def __init__(self) -> None:
        self.removals: list[str] = []
        self.cleared_total = 0
        # Set by uninstall_executor_loss_listener: py4j gives Spark's
        # ListenerBus a fresh Java proxy per crossing, so
        # removeSparkListener's reference-equality match can silently
        # no-op — the flag deactivates the Python side regardless.
        self.detached = False

    def onExecutorRemoved(self, event) -> None:
        # Runs on the py4j callback thread; an escaping exception would
        # silently lose the invalidation (and spam the Java-side
        # logs), so the whole body is guarded.
        try:
            if self.detached:
                return
            try:
                exec_id = event.executorId()
            except Exception:
                exec_id = "?"
            self.removals.append(exec_id)
            # Targeted: only entries whose build-time executor stamp
            # contains the removed id (or that have no stamp) can
            # reference its blocks; memos built after a
            # dynamic-allocation executor idled out stay warm. An
            # unknown id ("?") degrades to the stampless-entry rule
            # plus everything stamped — i.e. full clear — via
            # invalidate_executor's conservative matching.
            if exec_id == "?":
                cleared = clear_session_memos()
            else:
                cleared = invalidate_executor(exec_id)
            self.cleared_total += sum(cleared.values())
            if cleared:
                import warnings

                warnings.warn(
                    f"executor {exec_id} removed; cleared session memos "
                    f"{cleared} (localCheckpoint blocks may have died "
                    "with it — consumers rebuild cold)",
                    stacklevel=1,
                )
        except Exception:
            pass

    def __getattr__(self, name: str):
        if name.startswith("on"):
            return lambda *a, **k: None
        raise AttributeError(name)

    class Java:
        implements = ["org.apache.spark.scheduler.SparkListenerInterface"]


# applicationId -> installed listener (idempotence + test introspection)
_LISTENERS: dict[str, ExecutorLossListener] = {}


def install_executor_loss_listener(spark) -> ExecutorLossListener | None:
    """Register an :class:`ExecutorLossListener` on ``spark``'s
    listener bus (idempotent per application). Returns the live
    listener, or ``None`` if the py4j callback server could not be
    started (the manual :func:`clear_session_memos` posture remains).

    Called automatically by :func:`sierradb_spark.session.get_spark`
    for non-local masters; local sessions can opt in explicitly (tests
    do, via a simulated ``SparkListenerExecutorRemoved`` post)."""
    app_id = spark.sparkContext.applicationId
    if app_id in _LISTENERS:
        return _LISTENERS[app_id]
    try:
        from pyspark.java_gateway import ensure_callback_server_started

        sc = spark.sparkContext
        ensure_callback_server_started(sc._gateway)
        listener = ExecutorLossListener()
        sc._jsc.sc().addSparkListener(listener)
    except Exception:
        return None
    _LISTENERS[app_id] = listener
    return listener


def uninstall_executor_loss_listener(spark) -> bool:
    """Deactivate and (best-effort) deregister the application's
    listener. True if one was installed.

    The Python side is deactivated unconditionally via the listener's
    ``detached`` flag — the guarantee tests rely on. The JVM-side
    ``removeSparkListener`` is best-effort only: py4j materializes a
    NEW Java proxy each time the Python object crosses the gateway, and
    the ListenerBus removes by reference equality, so the call can
    silently no-op and leave a proxy that costs one py4j round-trip per
    bus event (each now an immediate ``detached`` return) until the
    session ends. Semantics are covered either way:
    ``tests/test_dedup_wide.py`` re-posts a removal after uninstall and
    asserts memos survive."""
    app_id = spark.sparkContext.applicationId
    listener = _LISTENERS.pop(app_id, None)
    if listener is None:
        return False
    listener.detached = True
    try:
        spark.sparkContext._jsc.sc().removeSparkListener(listener)
    except Exception:
        pass
    return True
