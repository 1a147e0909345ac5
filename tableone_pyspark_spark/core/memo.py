"""Session-scope memoization of per-corpus derived artifacts.

Several extension operators build an expensive corpus-level artifact
(an IVF coarse quantizer, a verified near-dup pair graph, component
labels) that downstream queries in the same session reuse — the FAISS
"build once, query many" model. Rebuilding the artifact per query is
pure waste: same input plan, same parameters, same result.

The cache key is Catalyst's *semantic hash* of the (analyzed) input
plan plus the build parameters, so two queries that construct the same
logical plan independently (e.g. both re-reading the same parquet and
re-deriving pairs with identical settings) hit the same entry, while
any change to the input or a parameter misses. Where ``semanticHash``
is unavailable (e.g. Spark Connect) the key is ``None`` and callers
build uncached — memoization is an optimization, never a semantic.

Staleness: the semantic hash covers the PLAN, not the data, so a
mutable source (the incremental-ingest scenario) could serve a stale
artifact. Two defenses: (1) the key also includes the plan's resolved
input-file listing (``DataFrame.inputFiles``) — appending/compacting
part files under a memoized path therefore misses and rebuilds; and
(2) :func:`memo_clear` lets a pipeline invalidate explicitly. The one
remaining hole is a byte-level overwrite of an existing file with the
SAME name (no parquet writer does this in place); callers owning such
a path must ``memo_clear()`` after writes.

Scope is the Python session (driver process), mirroring the lifetime
of ``localCheckpoint``/``persist`` data it may reference. DataFrames
are persisted at the default MEMORY_AND_DISK level — artifacts are
id/label/pair tables, orders of magnitude smaller than the corpus.
Entries live until :func:`memo_clear`; long-running drivers that churn
through many corpora should clear between corpora to release executor
storage.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame

_MEMO: dict = {}


def memo_key(*items: Any):
    """Tuple key from DataFrames (semantic plan hash + input-file
    snapshot) and plain parameters; ``None`` (= do not cache) if any
    plan can't be hashed.

    The owning SparkSession's application id is part of every
    DataFrame's key: a persisted artifact dies with its session, so a
    stop/recreate cycle in the same Python process (pytest teardown,
    notebook restart) must miss rather than hand back a dead handle.
    The input-file listing makes an append/compact under the same path
    a cache MISS instead of a stale hit (see module docstring).
    """
    key: list = []
    for x in items:
        if isinstance(x, DataFrame):
            try:
                app = x.sparkSession.sparkContext.applicationId
                files = hash(tuple(sorted(x.inputFiles())))
                key.append(("df", app, x.semanticHash(), files))
            except Exception:
                return None
        else:
            key.append(x)
    return tuple(key)


def memo(tag: str, key, build: Callable[[], Any]) -> Any:
    """Return the cached artifact for (tag, key), building it once.
    ``key=None`` bypasses the cache entirely."""
    if key is None:
        return build()
    k = (tag, key)
    if k not in _MEMO:
        _MEMO[k] = build()
    return _MEMO[k]


def memo_df(tag: str, key, build: Callable[[], DataFrame]) -> DataFrame:
    """:func:`memo` for DataFrame artifacts — persists on first build
    so every later reuse reads the materialized artifact instead of
    recomputing its lineage.

    On the ``key=None`` (uncacheable) path the frame is returned
    UNpersisted: nothing would ever reuse or release it, and a
    persist-per-call leaks executor storage for the session.
    """
    if key is None:
        return build()
    return memo(tag, key, lambda: build().persist())


def memo_clear(tag: str | None = None) -> int:
    """Invalidate cached artifacts — all of them, or one ``tag``
    family — unpersisting every cached DataFrame. Returns the number
    of entries dropped.

    This is the public staleness hatch: call it after mutating data
    under a path a memoized artifact was built from, or between
    corpora in a long-running driver to release executor storage.
    """
    dropped = 0
    for k in list(_MEMO):
        if tag is not None and k[0] != tag:
            continue
        v = _MEMO.pop(k)
        dropped += 1
        if isinstance(v, DataFrame):
            try:
                v.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
    return dropped
