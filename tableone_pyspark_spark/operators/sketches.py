"""Persistable distinct-count sketch artifacts — the incremental
pipeline's answer to "how many unique users/urls/documents so far?"
without ever rescanning history.

Built on Spark 4's Apache DataSketches HLL functions
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate`` —
JVM-side, mergeable, binary-serializable). The shapes:

  build_distinct_sketches : one partial-aggregated pass per batch →
      ≤ |groups| rows of (group, sketch bytes) — KB-scale artifacts a
      crawl writes next to each day's parquet.
  merge_distinct_sketches : union saved artifacts across batches —
      cost is |groups × batches| sketch rows, INDEPENDENT of the row
      counts they summarize. Merging yesterday's sketch with today's
      equals re-sketching the union (associativity pinned in tests).
  distinct_estimates      : decode (group, estimate) for reporting.

This is the 100 TB idiom: the corpus is scanned once on arrival, the
per-batch sketch persists as data, and every later "distinct so far"
question is a metadata-sized union. The sketch value bytes are
engine-specific (DataSketches HLL_4), so the operator is pytest-
differential class (exact-twin comparisons on bounded corpora), not
SQL-oracle class — documented like xxhash64.

No counterpart in the reference repo; extends the profiling family
(`operators/stats.data_profile`'s ``approx_distinct`` one-shot HLL)
with the PERSISTED/mergeable form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: DataSketches lgConfigK default — 12 gives ~1.6% relative error
DEFAULT_LG_K = 12


def build_distinct_sketches(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """(group..., sketch binary): one HLL_4 sketch per group over
    ``key_col`` (or a single global row when ``group_cols`` is None).
    One partial-aggregated shuffle; the output is artifact-sized."""
    if not 4 <= lg_k <= 21:
        raise ValueError(f"lg_k must be in 4..21, got {lg_k}")
    agg = F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("sketch")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def merge_distinct_sketches(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union sketch artifacts (e.g. the concatenation of every daily
    build) back down to one sketch per group. ``hll_union_agg`` with
    ``allowDifferentLgConfigK`` — artifacts built at different
    precisions still merge (result takes the coarser precision)."""
    agg = F.hll_union_agg(F.col(sketch_col), F.lit(True)).alias("sketch")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)


def distinct_estimates(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """(group..., n_distinct): decode estimates for reporting."""
    est = F.hll_sketch_estimate(F.col(sketch_col)).alias("n_distinct")
    cols = [*(group_cols or []), est]
    return sketches.select(*cols)
