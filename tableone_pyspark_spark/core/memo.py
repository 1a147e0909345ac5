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

Scope is the Python session (driver process), mirroring the lifetime
of ``localCheckpoint``/``persist`` data it may reference. DataFrames
are persisted at the default MEMORY_AND_DISK level — artifacts are
id/label/pair tables, orders of magnitude smaller than the corpus.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame

_MEMO: dict = {}


def memo_key(*items: Any):
    """Tuple key from DataFrames (semantic plan hash) and plain
    parameters; ``None`` (= do not cache) if any plan can't be hashed.

    The owning SparkSession's application id is part of every
    DataFrame's key: a persisted artifact dies with its session, so a
    stop/recreate cycle in the same Python process (pytest teardown,
    notebook restart) must miss rather than hand back a dead handle.
    """
    key: list = []
    for x in items:
        if isinstance(x, DataFrame):
            try:
                app = x.sparkSession.sparkContext.applicationId
                key.append(("df", app, x.semanticHash()))
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
    recomputing its lineage."""

    def build_persisted():
        return build().persist()

    return memo(tag, key, build_persisted)
