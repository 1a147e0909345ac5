"""Declarative data-quality constraint suite — the validation GATE a
pipeline runs between stages (the pattern of Amazon Deequ, Schelter et
al. 2018 VLDB "Automating Large-Scale Data Quality Verification", and
Great Expectations), complementing the REPORTING side of
``stats.data_profile``: the caller declares expectations
(completeness, uniqueness, ranges, patterns, set membership,
arbitrary SQL predicates, row counts) and gets one (constraint,
metric, threshold, passed) row per expectation.

Spark shape, 100 TB story: every constraint compiles into plain
aggregate expressions over the SAME single ``df.agg(...)`` pass — one
job and one scan regardless of how many constraints are declared
(the Deequ design point; N sequential ``SELECT count(*) WHERE ...``
probes would be N scans). The only shuffle is the one-row aggregate
collapse; ``primary_key``/``distinctness`` add the count_distinct
Expand, which ``approx=True`` swaps for HyperLogLog++ sketches
(fixed size, no distinct-value shuffle — the ``data_profile``
precedent and the right default for monitoring at scale). Driver-side
work is O(constraints) scalars — the engine's sufficient-statistics
assembly pattern.

Metric semantics (each constraint's ``metric`` is a fraction unless
noted): ``completeness`` = non-null/rows over ALL rows; value
constraints (``in_range``/``matches``/``isin``) measure compliance
over NON-NULL values only (nulls are completeness's job — the Deequ
split); ``satisfies`` measures over ALL rows (a NULL predicate is a
violation — declare the null-tolerance in the predicate itself);
``distinctness`` = distinct/non-null; ``primary_key`` =
distinct-tuples/rows (1.0 iff fully non-null AND unique);
``row_count`` reports the absolute count. An EMPTY table passes every
ratio constraint vacuously (metric 1.0) but fails ``row_count``'s
default ``min_rows=1`` — the canary that the upstream stage produced
nothing.

No counterpart in the reference repo; extends the
profiling/monitoring family (data_profile / profile_drift /
key_skew_profile) with the enforcement half.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tableone_pyspark_spark.operators.stats import _q


def _c(name: str) -> Column:
    """Backtick-quoted column ref (the repo's ``_q`` convention): a
    literal top-level column named ``user.id`` must not parse as
    struct-field access."""
    return F.col(_q(name))


@dataclass(frozen=True)
class Constraint:
    """One declared expectation: ``aggs`` contributes expressions to
    the shared single-pass aggregate (aliased ``m{idx}_{k}``);
    ``result`` folds that row's scalars into (metric, passed)."""

    name: str
    column: str
    threshold: float
    aggs: Callable[[int], list[Column]]
    result: Callable[[dict, int], tuple[float, bool]]


def _ratio(num: float | None, den: float | None) -> float:
    """num/den with the vacuous-pass convention: no denominator (an
    empty table / all-null column) yields 1.0 — nothing violated."""
    if not den:
        return 1.0
    return float(num or 0) / float(den)


def completeness(col: str, min_ratio: float = 1.0) -> Constraint:
    """Fraction of rows with ``col`` non-null ≥ ``min_ratio``."""
    return Constraint(
        name=f"completeness({col})",
        column=col,
        threshold=min_ratio,
        aggs=lambda i: [F.count(_c(col)).alias(f"m{i}_nn")],
        result=lambda r, i: (
            (m := _ratio(r[f"m{i}_nn"], r["__rows"])),
            m >= min_ratio,
        ),
    )


def _compliance(
    name: str, col: str, cond: Column, min_ratio: float
) -> Constraint:
    """Shared shape of the value constraints: fraction of NON-NULL
    values satisfying ``cond`` ≥ ``min_ratio``. The null split falls
    out of three-valued logic: every caller's ``cond`` is
    null-propagating (>=, rlike, isin all yield NULL on NULL input),
    and ``when(NULL, 1).otherwise(0)`` counts 0 — no explicit
    isNotNull guard needed."""
    return Constraint(
        name=name,
        column=col,
        threshold=min_ratio,
        aggs=lambda i: [
            F.count(_c(col)).alias(f"m{i}_nn"),
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"m{i}_ok"),
        ],
        result=lambda r, i: (
            (m := _ratio(r[f"m{i}_ok"], r[f"m{i}_nn"])),
            m >= min_ratio,
        ),
    )


def in_range(
    col: str,
    lo: float | None = None,
    hi: float | None = None,
    min_ratio: float = 1.0,
) -> Constraint:
    """Non-null values within [lo, hi] (either bound optional)."""
    if lo is None and hi is None:
        raise ValueError("in_range needs at least one bound")
    conds = []
    if lo is not None:
        conds.append(_c(col) >= lo)
    if hi is not None:
        conds.append(_c(col) <= hi)
    return _compliance(
        f"in_range({col})", col, reduce(lambda a, b: a & b, conds), min_ratio
    )


def matches(col: str, pattern: str, min_ratio: float = 1.0) -> Constraint:
    """Non-null values matching the (RE2-safe) regex ``pattern``."""
    return _compliance(
        f"matches({col})", col, _c(col).rlike(pattern), min_ratio
    )


def isin(col: str, values: list, min_ratio: float = 1.0) -> Constraint:
    """Non-null values contained in the literal ``values`` set."""
    if not values:
        raise ValueError("isin needs a non-empty value set")
    return _compliance(
        f"isin({col})", col, _c(col).isin(values), min_ratio
    )


def satisfies(
    predicate: str, name: str, min_ratio: float = 1.0
) -> Constraint:
    """Fraction of ALL rows on which the SQL ``predicate`` evaluates
    TRUE ≥ ``min_ratio`` (NULL counts as a violation — express null
    tolerance in the predicate)."""
    return Constraint(
        name=f"satisfies({name})",
        column="",
        threshold=min_ratio,
        aggs=lambda i: [
            F.sum(
                F.when(F.expr(predicate), 1).otherwise(0)
            ).alias(f"m{i}_ok")
        ],
        result=lambda r, i: (
            (m := _ratio(r[f"m{i}_ok"], r["__rows"])),
            m >= min_ratio,
        ),
    )


def _distinct_tuple(cols: tuple[str, ...], approx: bool) -> Column:
    """The distinct-count expression with SQL count-distinct's
    any-null-skip semantics in BOTH modes: exact = count_distinct
    (skips any-null tuples natively); approx = HLL++ over a struct
    that is made NULL when any member is (approx_count_distinct takes
    ONE column — its second positional is rsd, so multi-column keys
    must be tuple-encoded; self-review r10)."""
    if not approx:
        return F.count_distinct(*[_c(c) for c in cols])
    nn = reduce(lambda a, b: a & b, [_c(c).isNotNull() for c in cols])
    return F.approx_count_distinct(F.when(nn, F.struct(*[_c(c) for c in cols])))


def _check_approx_ratio(approx: bool, min_ratio: float, what: str) -> None:
    if approx and min_ratio >= 1.0:
        raise ValueError(
            f"approx {what} needs min_ratio < 1.0: the HLL++ estimate "
            "(default rsd ~5%) makes an exact-1.0 gate spuriously "
            "pass or fail"
        )


def distinctness(
    col: str, min_ratio: float = 1.0, approx: bool = False
) -> Constraint:
    """distinct(col)/non-null(col) ≥ ``min_ratio`` (1.0 = no duplicate
    values). ``approx=True`` uses HyperLogLog++ — no distinct-value
    shuffle — and REQUIRES a tolerance below 1.0 (rsd ~5%); the
    reported metric is clamped to ≤ 1.0 (an HLL overestimate must not
    leave the fraction domain)."""
    _check_approx_ratio(approx, min_ratio, "distinctness")
    return Constraint(
        name=f"distinctness({col})",
        column=col,
        threshold=min_ratio,
        aggs=lambda i: [
            F.count(_c(col)).alias(f"m{i}_nn"),
            _distinct_tuple((col,), approx).alias(f"m{i}_nd"),
        ],
        result=lambda r, i: (
            (m := min(_ratio(r[f"m{i}_nd"], r[f"m{i}_nn"]), 1.0)),
            m >= min_ratio,
        ),
    )


def primary_key(
    *cols: str, min_ratio: float = 1.0, approx: bool = False
) -> Constraint:
    """distinct (cols...) tuples / rows ≥ ``min_ratio`` — 1.0 iff the
    tuple is fully non-null AND unique (count-distinct skips any-null
    tuples, so nulls and duplicates both pull the metric below 1).
    ``approx=True`` REQUIRES ``min_ratio`` < 1.0 (HLL++ rsd ~5% makes
    an exact gate meaningless); metric clamped to ≤ 1.0."""
    if not cols:
        raise ValueError("primary_key needs at least one column")
    _check_approx_ratio(approx, min_ratio, "primary_key")
    return Constraint(
        name=f"primary_key({', '.join(cols)})",
        column=", ".join(cols),
        threshold=min_ratio,
        aggs=lambda i: [_distinct_tuple(cols, approx).alias(f"m{i}_nd")],
        result=lambda r, i: (
            (m := min(_ratio(r[f"m{i}_nd"], r["__rows"]), 1.0)),
            m >= min_ratio,
        ),
    )


def row_count(
    min_rows: int = 1, max_rows: int | None = None
) -> Constraint:
    """Absolute row-count bounds (metric = the count itself; the full
    interval rides in the ``column`` field so a max-bound failure is
    explainable from the report row — ``threshold`` alone only carries
    the min)."""
    return Constraint(
        name="row_count",
        column=f"[{min_rows}, {'inf' if max_rows is None else max_rows}]",
        threshold=float(min_rows),
        aggs=lambda i: [],
        result=lambda r, i: (
            (n := float(r["__rows"])),
            n >= min_rows and (max_rows is None or n <= max_rows),
        ),
    )


def _agg_frame(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """The ONE-row shared aggregate every constraint reads from —
    exposed for plan assertions (single scan, no joins)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(constraints):
        aggs += c.aggs(i)
    return df.agg(*aggs)


def validate(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """(constraint, column, metric, threshold, passed) — one row per
    declared expectation, all measured in ONE aggregation pass over
    ``df``. Row order follows the declaration order."""
    if not constraints:
        raise ValueError("validate needs at least one constraint")
    row = _agg_frame(df, constraints).collect()[0].asDict()
    out = []
    for i, c in enumerate(constraints):
        metric, passed = c.result(row, i)
        out.append((c.name, c.column, float(metric), c.threshold, passed))
    spark = SparkSession.getActiveSession() or df.sparkSession
    return spark.createDataFrame(
        out,
        "constraint string, column string, metric double, "
        "threshold double, passed boolean",
    )


def referential(
    df: DataFrame,
    col: str,
    dim: DataFrame,
    dim_col: str,
    min_ratio: float = 1.0,
) -> DataFrame:
    """X150 — referential-integrity expectation (the FK check every
    pipeline needs before a training join: an orphaned key silently
    becomes a dropped row at inner-join time, or a NULL-enriched row
    at left-join time). Returns the same one-row report frame
    :func:`validate` emits — ``metric`` = non-null ``col`` values of
    ``df`` that exist in ``dim.dim_col``, as a fraction — so callers
    union it under a suite's report.

    The one deliberately JOIN-shaped expectation: an FK check needs
    two tables by nature, so it cannot ride :func:`validate`'s
    single-pass shared aggregate (X111) and is a separate call
    instead of a :class:`Constraint`. Plan: the dim side is reduced
    to ``distinct`` keys BEFORE the left join (a duplicate-keyed dim
    must not multiply fact rows into a fake ratio), one join + one
    aggregation; AQE broadcasts the key set when it fits. SQL FK
    semantics: NULL foreign keys PASS (they reference nothing — add
    :func:`completeness` for NOT-NULL intent); an all-null or empty
    fact side is vacuously 1.0."""
    if not 0.0 <= min_ratio <= 1.0:
        raise ValueError(f"min_ratio must be in [0, 1], got {min_ratio}")
    if col not in df.columns:
        raise ValueError(f"no column {col!r} in the fact frame")
    if dim_col not in dim.columns:
        raise ValueError(f"no column {dim_col!r} in the dim frame")
    keys = dim.select(F.col(f"`{dim_col}`").alias("__fk")).where(
        F.col("__fk").isNotNull()
    ).distinct()
    hit = (
        df.select(F.col(f"`{col}`").alias("__fk"))
        .where(F.col("__fk").isNotNull())
        .join(keys.withColumn("__hit", F.lit(1)), "__fk", "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("ok"),
        )
        .collect()[0]
    )
    metric = 1.0 if not hit["n"] else float(hit["ok"]) / float(hit["n"])
    spark = SparkSession.getActiveSession() or df.sparkSession
    return spark.createDataFrame(
        [(
            f"referential({col} -> {dim_col})",
            col,
            float(metric),
            float(min_ratio),
            metric >= min_ratio,
        )],
        "constraint string, column string, metric double, "
        "threshold double, passed boolean",
    )
