"""Skew mitigation: salting for hot keys.

AQE (`spark.sql.adaptive.skewJoin`) already splits oversized partitions
of sort-merge joins at runtime — prefer it, it needs no code. These
helpers cover the cases AQE does not re-plan:

  * a hash AGGREGATION whose hot key funnels into one reducer and
    whose partial state is too big for map-side combine to save
    (collect_list/collect_set, exact percentile buffers);
  * a shuffled hash/sort-merge JOIN against a side too large to
    broadcast, where one left key dominates.

Both transforms are deterministic (salt = xxhash64 of payload columns,
never rand()), so repeated runs and retried tasks produce identical
results — a correctness requirement under speculative execution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__t1_salt__"


def _salt_of(cols: list[str], n: int) -> Column:
    """Deterministic salt in [0, n) from the non-key payload columns —
    spreads a hot key's rows while keeping task retries stable."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n)).cast("int")


def salted_collect_set(
    df: DataFrame, keys: list[str], value_col: str, n_salt: int = 16
) -> DataFrame:
    """``groupBy(keys).agg(collect_set(value))`` resistant to hot keys.

    Stage 1 aggregates on (keys, salt) — a key with 10^9 rows becomes
    ``n_salt`` partial sets built on ``n_salt`` different reducers —
    stage 2 unions the ≤ n_salt partials per key. The second shuffle
    moves only distinct values, so the hot reducer's input shrinks from
    |rows| to |distinct|. Returns (keys..., values array).
    """
    stage1 = (
        df.select(*keys, F.col(value_col).alias("v"), _salt_of([value_col], n_salt).alias(SALT))
        .groupBy(*keys, SALT)
        .agg(F.collect_set("v").alias("vs"))
    )
    return (
        stage1.groupBy(*keys)
        .agg(F.array_distinct(F.flatten(F.collect_list("vs"))).alias("values"))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` is skewed on ``keys`` and ``right`` is
    too large to broadcast: left rows get a deterministic salt, right
    rows are replicated once per salt value (explode of a constant
    sequence — n_salt× the right side, which is why right must be the
    smaller input), and the join key becomes (keys, salt). Every hot
    left key now spreads over ``n_salt`` reducers.

    Column set of the result == left ∪ right (join keys once), like a
    plain ``left.join(right, keys, how)``.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    payload = [c for c in left.columns if c not in keys] or keys
    l = left.withColumn(SALT, _salt_of(payload, n_salt))
    r = right.withColumn(SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    return l.join(r, [*keys, SALT], how).drop(SALT)
