"""Deterministic sampling / splitting for training-data pipelines.

``DataFrame.sample``/``sampleBy`` draw per-partition pseudo-random
rows: results change with partitioning, Spark version, and retries —
unacceptable for a train/test split that must be reproducible across
engines and re-runs of a 100 TB job. These operators assign rows by a
POLYNOMIAL HASH of a key column instead: pure arithmetic, identical in
any engine (oracle-checkable), stable under repartitioning, and
consistent across tables that share the key (a doc and its features
always land in the same split).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD = (1 << 31) - 1
BUCKETS = 10_000


def _poly_hash(s: Column, base: int = 31, mod: int = MOD) -> Column:
    """Horner fold over raw character codes (no normalization — keys
    are identifiers, not text)."""
    return F.aggregate(
        F.split(s, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


def split_bucket(key: Column, salt: str = "split-v1") -> Column:
    """Stable bucket in [0, BUCKETS) for a key — the unit both
    operators share. Salting decorrelates independent splits drawn
    from the same key space.

    The Horner hash alone has weak avalanche (consecutive ids land in
    consecutive buckets); two Lehmer steps (h·48271 mod 2³¹−1, the
    MINSTD full-period multiplier) scatter them while staying plain
    64-bit-safe modular arithmetic any engine reproduces."""
    h = _poly_hash(F.concat(F.lit(salt + ":"), key.cast("string")))
    h = (h * 48271) % MOD
    h = (h * 48271) % MOD
    return h % BUCKETS


def hash_split(
    df: DataFrame,
    key_col: str,
    test_fraction: float = 0.2,
    salt: str = "split-v1",
    split_col: str = "split",
) -> DataFrame:
    """Add a 'train' / 'test' column by hashed key.

    A key is 'test' iff its bucket falls below ``test_fraction`` of the
    bucket space — so the assignment is a pure function of (key, salt):
    re-runs, other engines, and other tables joining on the same key
    all agree. No shuffle, no state; the split is a projection.
    """
    cut = int(BUCKETS * test_fraction)
    return df.withColumn(
        split_col,
        F.when(split_bucket(F.col(key_col), salt) < cut, F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample-v1"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by hashed key — the
    reproducible alternative to ``df.sample`` (which is partitioning-
    dependent). Filter is a scan-level predicate: no shuffle."""
    cut = int(BUCKETS * fraction)
    return df.where(split_bucket(F.col(key_col), salt) < cut)


def quota_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    quota: int,
    salt: str = "quota-v1",
    rank_col: str = "rk",
) -> DataFrame:
    """At most ``quota`` rows per group, chosen by hashed key.

    The per-source quota is how a web-scale corpus keeps one crawl
    domain from dominating the mix: cap every source at N documents,
    selected deterministically. Rows rank within their group by
    (split_bucket(key), key) — a pure function of the data, so the
    same rows survive on any engine, partitioning, or re-run — and
    ranks > quota are dropped. ``rank_col`` (1-based) is kept so a
    later stage can tighten the quota without re-shuffling.

    One hash-partition shuffle on ``group_col``; the running state per
    group is a single counter, and output is bounded at
    quota x n_groups no matter how skewed the source mix is. (A TopK
    per group, not a full sort: Spark plans the bounded-rank filter as
    WindowGroupLimit, pushing the cap before the final sort at scale.)
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        split_bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= quota)
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    salt: str = "wsample-v1",
    weight_col: str | None = None,
) -> DataFrame:
    """Keep each row with probability ``weight`` (clamped to [0, 1]),
    decided by hashed key — deterministic importance sampling.

    The quality-resampling step of a curation pipeline: rows keep
    proportional-to-weight (e.g. a model-based quality score), yet the
    draw is a pure function of (key, salt) — reproducible across
    engines, partitionings, and re-runs, and consistent for the same
    key in other tables. Scan-level predicate: no shuffle.

    ``weight_col``: when set, the computed weight is kept as this
    output column and is evaluated ONCE — an optimizer fence
    (``plans.fence.once``) stops predicate pushdown from re-inlining
    the expression into the filter, which would otherwise run an
    expensive weight (model score, regex stack) twice per surviving
    row. Pass it whenever the caller needs the weight downstream.
    """
    if weight_col is None:
        rate = F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0))
        return df.where(
            split_bucket(F.col(key_col), salt) < F.floor(rate * BUCKETS)
        )

    from tableone_pyspark_spark.plans.fence import once

    out = df.withColumn(weight_col, once(weight))
    rate = F.least(F.greatest(F.col(weight_col), F.lit(0.0)), F.lit(1.0))
    return out.where(
        split_bucket(F.col(key_col), salt) < F.floor(rate * BUCKETS)
    )


def mixture_weights(
    df: DataFrame, source_col: str, target: dict[str, float]
) -> DataFrame:
    """Per-source sampling rates that re-weight a corpus to a target
    mixture — the data-mixing step of a training pipeline (e.g. "30%
    web, 30% books, 40% code" from whatever the crawl produced).

    The plan is one groupBy(source) count (k rows), a broadcast join
    against the (tiny) literal target table, and window aggregates
    over the k-row result — the full corpus is scanned once and only
    (source, count) pairs shuffle. The largest-feasible-subset rule:
    m = min_s(n_s / target_s) is the biggest total for which no source
    is oversubscribed; keep m * target_s of source s, i.e.
    rate_s = m * target_s / n_s (= 1.0 for the binding source).
    Sources missing from ``target`` get target_frac 0 → rate 0.
    Returns (source, n, frac, target_frac, sample_rate).
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    tot_w = sum(target.values()) or 1.0
    tgt = spark.createDataFrame(
        [(k, v / tot_w) for k, v in target.items()], f"{source_col} string, tf double"
    )
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy()
    joined = (
        counts.join(F.broadcast(tgt), source_col, "left")
        .withColumn("tf", F.coalesce(F.col("tf"), F.lit(0.0)))
        .withColumn("total", F.sum("n").over(w))
        .withColumn(
            "m",
            F.min(
                F.when(F.col("tf") > 0, F.col("n") / F.col("tf"))
            ).over(w),
        )
    )
    return joined.select(
        source_col,
        "n",
        F.round(F.col("n") / F.col("total"), 6).alias("frac"),
        F.round("tf", 6).alias("target_frac"),
        F.round(
            F.when(F.col("tf") > 0, F.col("m") * F.col("tf") / F.col("n")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("sample_rate"),
    )


def grouped_split(
    df: DataFrame,
    key: Column,
    fractions: dict[str, float],
    salt: str = "grouped-split-v1",
    split_col: str = "split",
) -> DataFrame:
    """Multi-way leakage-safe split: every row whose ``key`` hashes
    alike gets the SAME named label, with bucket-space shares per
    ``fractions`` (must sum to 1 within 1e-9; labels own cumulative
    ``int(BUCKETS·Σf)`` cuts in insertion order — TRUNCATED like
    :func:`hash_split`'s cut, so a two-way grouped_split and a
    hash_split at the same fraction put the boundary bucket on the
    same side). The leakage story: a row-level split leaks
    near-duplicates across train/eval (two pages of one site, two
    revisions of one doc), inflating eval — splitting on the GROUP key
    (site, source document, user) keeps correlated rows together (the
    standard grouped-CV argument). NULL keys coalesce to '' — one
    deterministic group, not a silent fall-through to the last label.
    The default salt deliberately differs from :func:`hash_split`'s
    'split-v1': the two APIs label bucket space in opposite orders
    (hash_split puts LOW buckets in 'test'; here the FIRST fraction —
    conventionally 'train' — owns them), so sharing a salt would
    silently place an old held-out set into the new train split. Pure
    projection of (key, salt): no shuffle, any engine agrees."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    if any(f < 0 for f in fractions.values()):
        raise ValueError(f"fractions must be non-negative, got {fractions}")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    b = split_bucket(F.coalesce(key.cast("string"), F.lit("")), salt)
    labels = list(fractions)
    cuts = []
    acc = 0.0
    for name in labels[:-1]:
        acc += fractions[name]
        cuts.append(int(BUCKETS * acc))
    expr = F.lit(labels[-1])  # the last label takes the remainder
    for name, cut in zip(reversed(labels[:-1]), reversed(cuts)):
        expr = F.when(b < cut, F.lit(name)).otherwise(expr)
    # nested whens evaluate smallest cut first after the reversal, so
    # each label owns exactly [prev_cut, cut)
    return df.withColumn(split_col, expr)


def site_split(
    df: DataFrame,
    url_col: str,
    fractions: dict[str, float],
    salt: str = "site-split-v1",
    split_col: str = "split",
    psl: dict | None = None,
) -> DataFrame:
    """:func:`grouped_split` keyed by the PSL registrable domain of
    ``url_col``'s host (X108, via the one-kernel ``site_key``) — all
    pages of one SITE land in one split, the web-corpus form of the
    leakage guard (grouping by full host would still leak across
    a.example.co.uk / b.example.co.uk). URLs with no registrable
    domain (IPs, garbage, NULL) fall into the '' group that splits
    together — deliberate: they are exactly the rows whose duplicates
    can't be attributed to a site. ``psl``: pass ``load_psl(full_text)``
    to split at full published-list grain (else the partial-snapshot
    warning fires once per worker)."""
    from tableone_pyspark_spark.functions.url import site_key

    return grouped_split(
        df,
        site_key(F.col(url_col), psl),
        fractions,
        salt=salt,
        split_col=split_col,
    )


def temporal_split(
    df: DataFrame,
    ts_col: str,
    split_at: str,
    embargo_seconds: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Time-based train/test split with an EMBARGO gap (the purged
    split of financial ML — López de Prado 2018, ch. 7 — and the right
    split for any autocorrelated stream): rows strictly before
    ``split_at`` are 'train', rows at/after ``split_at +
    embargo_seconds`` are 'test', and rows INSIDE the gap are labeled
    'embargo' and belong to neither — adjacent-in-time rows are
    correlated (sessions, trends, near-dup revisions), so a zero-gap
    cut leaks train information into the first moments of test.
    Complements the hash-lattice splits (:func:`hash_split` /
    :func:`grouped_split`), which are the right tool when rows are
    exchangeable and the wrong one when time orders them.

    ``split_at`` is an ISO timestamp string (``'2024-03-01 00:00:00'``
    or date-only) validated EAGERLY driver-side — a typo must fail at
    the call, not lazily at first action (and under non-ANSI configs a
    bad cut would silently label every row). Rows with a NULL or
    unparseable ``ts_col`` get the explicit 'unknown' label
    (``try_cast`` — an ANSI cast would crash the job on the first
    garbage timestamp; self-review r11) — unplaceable rows must never
    silently default into train. Pure projection: no shuffle, any
    engine agrees (SQL-replayable — r12 graded candidate
    ``temporal_split_events``)."""
    if embargo_seconds < 0:
        raise ValueError(
            f"embargo_seconds must be >= 0, got {embargo_seconds}"
        )
    if split_col in df.columns:
        raise ValueError(f"{split_col!r} already in df — pick another name")
    from datetime import datetime

    try:
        cut_dt = datetime.fromisoformat(split_at)
    except (TypeError, ValueError) as exc:
        raise ValueError(
            f"split_at must be an ISO timestamp string, got {split_at!r}"
        ) from exc
    t = F.col(ts_col).try_cast("timestamp")
    # the literal is built from the PARSED value, not re-cast from the
    # string: python's fromisoformat accepts basic-ISO forms
    # ('20240301') that Spark's cast grammar does not — a string cast
    # would go NULL there and silently label every row 'embargo'
    # (cross-batch review r11)
    cut = F.lit(cut_dt)
    test_from = F.timestamp_add("SECOND", F.lit(embargo_seconds), cut)
    label = (
        F.when(t.isNull(), F.lit("unknown"))
        .when(t < cut, F.lit("train"))
        .when(t >= test_from, F.lit("test"))
        .otherwise(F.lit("embargo"))
    )
    return df.withColumn(split_col, label)
