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


def _live_executor_ids(df) -> frozenset[str] | None:
    """Executor ids currently alive in ``df``'s SparkContext, or None
    if introspection fails (e.g. a mocked session). Used to stamp memo
    entries at build time: a localCheckpoint's blocks can only live on
    executors that existed when it materialized, so a LATER-joining
    executor's removal (routine under dynamic allocation) cannot have
    killed them."""
    try:
        sc = df.sparkSession.sparkContext
        if sc.master.startswith("local"):
            # the sole executor IS the driver; getExecutorIds() would
            # return empty (and log a scheduler warning) here
            return frozenset({"driver"})
        seq = sc._jsc.sc().getExecutorIds()  # Scala Seq via py4j
        return frozenset(str(seq.apply(i)) for i in range(seq.size()))
    except Exception:
        return None


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

    def __setitem__(self, key, df) -> None:
        super().__setitem__(key, df)
        self.built_on[key] = _live_executor_ids(df)

    def __delitem__(self, key) -> None:
        super().__delitem__(key)
        self.built_on.pop(key, None)

    def clear(self) -> None:
        super().clear()
        self.built_on.clear()


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
    return {name: len(d) for name, d in _FAMILIES.items()}


def clear_session_memos() -> dict[str, int]:
    """Drop EVERY memoized pass in the session. Returns the number of
    entries cleared per family.

    Use after mutating data under a memoized ``sf_dir``, after a
    recovered executor loss (localCheckpoint blocks died with it), or
    to release the pinned blocks in a long-lived session. The next
    consumer of each family rebuilds from the source tables — correct,
    just cold."""
    cleared = {name: len(d) for name, d in _FAMILIES.items() if d}
    for d in _FAMILIES.values():
        d.clear()
    return cleared


def invalidate_sf_dir(sf_dir: str) -> int:
    """Drop memo entries for one ``sf_dir`` across all families (every
    session key), keeping other corpora warm. Returns entries dropped."""
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

    def onExecutorRemoved(self, event) -> None:
        try:
            exec_id = event.executorId()
        except Exception:
            exec_id = "?"
        self.removals.append(exec_id)
        # Targeted: only entries whose build-time executor stamp
        # contains the removed id (or that have no stamp) can reference
        # its blocks; memos built after a dynamic-allocation executor
        # idled out stay warm. An unknown id ("?") degrades to the
        # stampless-entry rule plus everything stamped — i.e. full
        # clear — via invalidate_executor's conservative matching.
        if exec_id == "?":
            cleared = clear_session_memos()
        else:
            cleared = invalidate_executor(exec_id)
        self.cleared_total += sum(cleared.values())
        if cleared:
            import warnings

            warnings.warn(
                f"executor {exec_id} removed; cleared session memos "
                f"{cleared} (localCheckpoint blocks may have died with "
                "it — consumers rebuild cold)",
                stacklevel=1,
            )

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
    """Deregister the application's listener (test hygiene). True if
    one was installed."""
    app_id = spark.sparkContext.applicationId
    listener = _LISTENERS.pop(app_id, None)
    if listener is None:
        return False
    try:
        spark.sparkContext._jsc.sc().removeSparkListener(listener)
    except Exception:
        pass
    return True
