"""Tracked persist handles (ADVICE r4 / VERDICT r4 item 4).

Eight operators persist a reduced intermediate table because multiple
consumers in ONE returned plan would otherwise re-derive the corpus
explode per consumer (the tfidf recompute lesson, NOTES.md). The
persisted table must outlive the operator call — the caller's action
is what fills and reads it — so the operator cannot unpersist it
itself. Previously the only release path was a session-wide
``spark.catalog.clearCache()`` convention recorded in NOTES.md; a
long-lived session running many corpora accumulated cached tables
until storage eviction.

This module makes the contract explicit: operators route persists
through :func:`persisted`, which tracks the handle; callers release
everything after their action with :func:`release_persisted` (or scope
a block with :func:`persist_scope`). ``bench.py`` and the job entry
points call it between queries; tests pin that no persisted RDDs
survive a release.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator, List

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

# Registry is process-global and release_persisted() frees EVERY
# tracked handle: the contract assumes one driver thread interleaves
# build → action → release per query (bench.py, the job entry points).
# Concurrent query runners must each wrap their runs in
# persist_scope(), which releases only the handles created inside the
# scope — calling bare release_persisted() from one thread while
# another thread's query is mid-action would unpersist tables that
# query is actively reading (Spark silently recomputes: correct but
# exactly the recompute the persist exists to prevent). The lock below
# protects the registry structure itself, not that usage contract.
_LOCK = threading.Lock()
_PERSISTED: List[DataFrame] = []


def persisted(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist *df* and track the handle so a later
    :func:`release_persisted` can free it. Returns the persisted
    DataFrame (same object semantics as ``df.persist()``)."""
    out = df.persist(level) if level is not None else df.persist()
    with _LOCK:
        _PERSISTED.append(out)
    return out


def release_persisted(blocking: bool = False) -> int:
    """Unpersist every tracked handle (LIFO); returns how many were
    released. Safe to call with queries still holding the plan — Spark
    recomputes instead of failing — and idempotent. See the module
    note: in multi-threaded drivers use :func:`persist_scope` instead,
    this releases handles owned by EVERY thread."""
    with _LOCK:
        tail, _PERSISTED[:] = list(_PERSISTED), []
    n = 0
    for df in reversed(tail):
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass  # a stopped session has nothing left to free
    return n


@contextmanager
def persist_scope(blocking: bool = False) -> Iterator[None]:
    """Scope a block of query runs: every :func:`persisted` handle
    created inside is released on exit, including on error. Handles
    created BEFORE entry are left alone."""
    with _LOCK:
        mark = len(_PERSISTED)
    try:
        yield
    finally:
        with _LOCK:
            tail, _PERSISTED[mark:] = _PERSISTED[mark:], []
        for df in reversed(tail):
            try:
                df.unpersist(blocking)
            except Exception:
                pass
