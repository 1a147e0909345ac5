"""t-digest quantile sketch artifacts (Dunning & Ertl 2019,
"Computing extremely accurate quantiles using t-digests") — the
QUANTILE member of the persisted-sketch family (X90 Bloom membership,
X97 HLL distinct, X99 Count-Min frequency): per-group (group,
centroids, total) rows written next to each day's parquet, later
"p99 so far" questions answered by a metadata-sized merge instead of
re-scanning the data. Spark's ``percentile_approx`` answers the
one-shot query; what it cannot do is PERSIST the sketch for
incremental/federated composition — that is this operator.

The merging-digest form: a sorted run of (mean, weight) centroids
where a centroid may span at most one unit of the k1 scale function
``δ/2π·asin(2q−1)`` — O(δ) centroids total, and the scale's steep
derivative at q→0/1 keeps tail centroids singleton, so extreme
quantiles are interpolated near-exactly while the middle compresses.
Build is the canonical two-level aggregation: a ``mapInPandas``
partial digest per (partition × group) — so the ONLY exchange carries
digests (≤ partitions × groups × O(δ) centroids), never data rows —
then an ``applyInPandas`` merge per group. ``merge_tdigests`` reruns
just the second level over persisted sketch rows from any number of
earlier builds.

Determinism class: like the HLL rows (X97), sketch BYTES are
engine/partitioning-specific (centroid boundaries depend on merge
order), but the ε rank-error CONTRACT is not — tests pin rank error
against exact sorted data under multiple partitionings and
merge-vs-rebuild, plus byte-exactness in the small-data regime where
the bound keeps every point a singleton centroid (the digest IS the
sorted data there, so any engine agrees exactly).

No counterpart in the reference repo (its quartiles are the engine's
own exact/sketch hybrid); extends the sketch-artifact family.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _k1(q: float, delta: int) -> float:
    """The k1 scale function (Dunning & Ertl §2.2): δ/2π · asin(2q−1).
    A centroid may span at most ONE k-unit, which caps the digest at
    O(δ) centroids (the q(1−q) weight-bound variant grows O(δ·log n))
    while its steep derivative at q→0/1 keeps tail centroids
    singleton — the near-exact extreme quantiles the format is for."""
    import math

    return delta / (2.0 * math.pi) * math.asin(2.0 * q - 1.0)


def _td_merge(
    means: np.ndarray, weights: np.ndarray, delta: int
) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted (means, weights) into a valid t-digest: one left-
    to-right pass; a centroid absorbs the next while the merged span
    stays within one k1 unit. The python reference every kernel runs
    — O(δ) output regardless of input length."""
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = [float(means[0])]
    out_w: list[float] = [float(weights[0])]
    acc = 0.0  # weight strictly left of the growing centroid
    k_left = _k1(0.0, delta)
    for m, w in zip(means[1:], weights[1:]):
        cand = out_w[-1] + w
        # clamp: with fractional weights the sequential acc+cand can
        # exceed the pairwise-summed total by ulps, and asin(>1)
        # raises math-domain (self-review r10)
        q_right = min((acc + cand) / total, 1.0)  # right edge if merged
        if _k1(q_right, delta) - k_left <= 1.0:
            out_m[-1] += (m - out_m[-1]) * (w / cand)
            out_w[-1] = cand
        else:
            acc += out_w[-1]
            k_left = _k1(acc / total, delta)
            out_m.append(float(m))
            out_w.append(float(w))
    return np.asarray(out_m), np.asarray(out_w)


def _td_quantile(
    means: np.ndarray, weights: np.ndarray, q: float
) -> float:
    """Standard t-digest interpolation: each centroid sits at the
    midpoint of its weight span; linear between midpoints, clamped to
    the extreme means at the tails."""
    if len(means) == 0:
        raise ValueError("t-digest: empty centroid array (malformed sketch row)")
    total = float(weights.sum())
    target = q * total
    left = 0.0
    prev_mid = None
    prev_mean = None
    for m, w in zip(means, weights):
        mid = left + w / 2.0
        if target < mid:
            if prev_mid is None:
                return float(means[0])
            frac = (target - prev_mid) / (mid - prev_mid)
            return float(prev_mean + (m - prev_mean) * frac)
        prev_mid, prev_mean = mid, m
        left += w
    return float(means[-1])


_SKETCH_FIELDS = [
    T.StructField("means", T.ArrayType(T.DoubleType()), False),
    T.StructField("weights", T.ArrayType(T.DoubleType()), False),
    T.StructField("total", T.DoubleType(), False),
    # the compression parameter RIDES IN the artifact: merging
    # persisted sketches with a silently different default would
    # recompress below the budget they were built for (self-review r10)
    T.StructField("delta", T.IntegerType(), False),
]
_RESERVED = {"__v", "means", "weights", "total", "delta", "q", "value"}


def _group_fields(df: DataFrame, group_cols: list[str]) -> list:
    return [df.schema[c] for c in group_cols]


def build_tdigest(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    delta: int = 100,
) -> DataFrame:
    """(group..., means, weights, total) — one t-digest row per group.
    NULL values are skipped (a group of only NULLs yields no row —
    quantiles of nothing are undefined, matching percentile_approx).
    Two-level: per-(partition × group) partial digests, then a
    digest-only exchange and per-group merge."""
    if delta < 10:
        raise ValueError(f"delta must be >= 10, got {delta}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if _RESERVED & set(group_cols):
        # the value column is aliased away, but a group column keeps
        # its name and would duplicate a sketch field (self-review r10)
        raise ValueError(
            f"group column names {sorted(_RESERVED & set(group_cols))} "
            "collide with the sketch output schema"
        )
    src = df.select(*group_cols, F.col(value_col).alias("__v"))
    partial_schema = T.StructType(
        _group_fields(src, group_cols) + _SKETCH_FIELDS
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # accumulate across ALL the partition's Arrow batches and emit
        # ONE digest per group at iterator end — per-batch emission
        # would inflate the exchange by the batch-count factor
        # (self-review r10); the running buffer is recompressed
        # whenever it exceeds 8δ centroids, bounding memory at O(δ)
        # per live group
        buf: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}
        for pdf in batches:
            pdf = pdf[pdf["__v"].notna()]
            if pdf.empty:
                continue
            for key, g in pdf.groupby(group_cols, dropna=False, sort=False):
                v = g["__v"].to_numpy(dtype=np.float64)
                k = key if isinstance(key, tuple) else (key,)
                if k in buf:
                    om, ow = buf[k]
                    m = np.concatenate([om, v])
                    w = np.concatenate([ow, np.ones_like(v)])
                else:
                    m, w = v, np.ones_like(v)
                if len(m) > 8 * delta:
                    m, w = _td_merge(m, w, delta)
                buf[k] = (m, w)
        if buf:
            rows = [
                (*k, list(m2), list(w2), float(w2.sum()), delta)
                for k, (m, w) in buf.items()
                for m2, w2 in [_td_merge(m, w, delta)]
            ]
            yield pd.DataFrame(
                rows,
                columns=group_cols + ["means", "weights", "total", "delta"],
            )

    return merge_tdigests(
        src.mapInPandas(partials, partial_schema), group_cols
    )


def merge_tdigests(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge (group..., means, weights, total, delta) sketch rows —
    from a build's partials or from persisted artifacts of many
    earlier builds — into one digest per group. The compression
    parameter comes from the rows themselves (a silently different
    default would recompress below the budget the artifacts were built
    for); mixed deltas within a group raise."""
    out_schema = T.StructType(
        _group_fields(sketches, group_cols) + _SKETCH_FIELDS
    )

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        deltas = set(int(d) for d in pdf["delta"])
        if len(deltas) != 1:
            raise ValueError(
                f"t-digest merge: mixed deltas {sorted(deltas)} in group "
                f"{key} — rebuild or split by compression parameter"
            )
        delta = deltas.pop()
        means = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["means"]])
        weights = np.concatenate(
            [np.asarray(x, dtype=np.float64) for x in pdf["weights"]]
        )
        m, w = _td_merge(means, weights, delta)
        return pd.DataFrame(
            [(*key, list(m), list(w), float(w.sum()), delta)],
            columns=list(group_cols) + ["means", "weights", "total", "delta"],
        )

    return sketches.groupBy(*group_cols).applyInPandas(merge, out_schema)


def tdigest_quantiles(
    sketches: DataFrame, qs: list[float], group_cols: list[str]
) -> DataFrame:
    """(group..., q, value) — interpolated quantile estimates from
    sketch rows; row-local, no shuffle."""
    if not qs or any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"qs must be fractions in [0, 1], got {qs}")
    schema = T.StructType(
        _group_fields(sketches, group_cols)
        + [
            T.StructField("q", T.DoubleType(), False),
            T.StructField("value", T.DoubleType(), False),
        ]
    )
    qs = list(qs)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # iterrows (not itertuples): group column names need not be
            # python identifiers, and sketch rows are few by design
            for _, rec in pdf.iterrows():
                m = np.asarray(rec["means"], dtype=np.float64)
                w = np.asarray(rec["weights"], dtype=np.float64)
                for q in qs:
                    rows.append(
                        tuple(rec[c] for c in group_cols)
                        + (q, _td_quantile(m, w, q))
                    )
            if rows:
                yield pd.DataFrame(rows, columns=list(group_cols) + ["q", "value"])

    return sketches.mapInPandas(kernel, schema)
