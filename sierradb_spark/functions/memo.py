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
   local mode and for bounded bench/audit sessions; for a long-lived
   cluster session either call :func:`clear_session_memos` after a
   recovered executor loss or persist the pass to a real table (the
   production posture — see docs/SCALE.md).

Every memo dict in the package is created through :func:`register_memo`
so the lifecycle hooks cover new families automatically — a family
added with a bare module-level ``{}`` would escape the hooks, which is
why ``tests/test_dedup_wide.py`` asserts the registered-family names.
"""

from __future__ import annotations

_FAMILIES: dict[str, dict] = {}


def register_memo(name: str) -> dict:
    """Create and register one memo family (a ``(applicationId,
    sf_dir) -> DataFrame`` dict). Called at module import time; the
    returned dict is the module's memo store."""
    if name in _FAMILIES:
        raise ValueError(f"duplicate memo family {name}")
    _FAMILIES[name] = {}
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
