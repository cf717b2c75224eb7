"""Scoped cache registry for pipeline-internal persists.

Multi-stage pipeline operators (LSH dedup, exact Jaccard, simhash,
quantile offsets) must persist intermediate frames that BOTH feed the
lazily-returned result and would otherwise be recomputed per consumer.
Those persists cannot be released inside the operator — the result has
not run yet — so left alone they accumulate pinned executor storage for
the life of the session.

This registry makes the leak releasable without giving up laziness:
operators pin intermediates through :func:`pin`, and callers release
ALL pipeline pins with one :func:`release_pinned` call after consuming
their results (bench.py does this between queries; long-lived 100 TB
sessions should do it between corpora). ``spark.catalog.clearCache()``
also works but is a sledgehammer — it drops user caches too.

Threading: the registry is process-global and guarded by a lock, so
concurrent ``pin``/``release_pinned`` calls never corrupt the list.
The GLOBAL registry's scope stays global, though — in a driver
submitting pipelines from multiple threads, one thread's
``release_pinned()`` releases every thread's globally-registered pins
(forcing recomputation, never wrong results). Concurrent pipelines
that must not interfere (e.g. a streaming ``foreachBatch`` running
beside an interactive session) should wrap their work in
:func:`pin_scope`, which captures the pins created on that thread and
releases ONLY those on exit — ``release_pinned()`` never touches
scoped pins.
"""

from __future__ import annotations

import contextlib
import threading

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []
_LOCK = threading.Lock()
_SCOPES = threading.local()  # per-thread stack of active pin scopes


def pin(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() a pipeline intermediate and register it for scoped
    release. Returns the persisted frame. If a :func:`pin_scope` is
    active on this thread, the pin belongs to that scope (released at
    scope exit, invisible to ``release_pinned``); otherwise it joins
    the process-global registry."""
    df = df.persist() if storage_level is None else df.persist(storage_level)
    stack = getattr(_SCOPES, "stack", None)
    if stack:
        stack[-1].append(df)
    else:
        with _LOCK:
            _PINNED.append(df)
    return df


@contextlib.contextmanager
def pin_scope():
    """Capture every :func:`pin` made on this thread inside the block
    and unpersist exactly those on exit (also on failure). The tool
    for concurrent pipelines: a streaming ``foreachBatch`` body that
    releases its per-batch pins through a scope cannot evict the
    intermediates of another stream or an interactive pipeline running
    in the same driver — the failure mode of a bare ``release_pinned()``
    in the batch hook (recomputation, never wrong results). Scopes
    nest; frames already persisted when pinned elsewhere are untouched.
    Yields the scope's pin list (test hook)."""
    stack = getattr(_SCOPES, "stack", None)
    if stack is None:
        stack = _SCOPES.stack = []
    scope: list[DataFrame] = []
    stack.append(scope)
    try:
        yield scope
    finally:
        stack.pop()
        for df in scope:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing left to release


def release_pinned() -> int:
    """Unpersist every frame pinned by pipeline operators since the last
    release. Safe to call at any time: results already materialized are
    unaffected (they recompute if re-run), and double-release is a
    no-op. Returns the number of frames released."""
    with _LOCK:
        drained, _PINNED[:] = _PINNED[:], []
    n = 0
    for df in drained:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing left to release
    return n


def pinned_count() -> int:
    """Number of currently-registered pipeline pins (test hook)."""
    with _LOCK:
        return len(_PINNED)
