"""Incrementally-maintained aggregate tables over the commit log — the
canonical 100 TB pipeline shape: an upstream versioned table changes,
and a downstream grouped aggregate is REFRESHED from the change feed
instead of recomputed from the full snapshot (Delta's CDF-driven
MERGE-into-a-summary-table pattern; materialized-view maintenance in
the Gupta & Mumick sense, restricted to the self-maintainable
count/sum family so no base re-read is ever needed).

    refresh_aggregate(spark, src, dst, group_cols, sum_cols, keys)

maintains ``dst`` = SELECT group_cols, count(*) AS n, sum(c) AS
sum_<c>, count(c) AS nn_<c>... FROM ``src`` GROUP BY group_cols (the
non-null counts are part of the maintained state: they are what makes
sum retraction NULL-exact when a group's last non-null value leaves):

  - first refresh: one full-snapshot aggregation, committed to ``dst``
  - later refreshes: ``table_changes(src, last, include_preimage=True)``
    only — inserts add, deletes retract, updates retract the
    ``U_pre`` row and add the ``U_post`` row (so a row MOVING between
    groups debits one group and credits the other), then ONE keyed
    full-outer merge against the current aggregate. Work scales with
    the CHANGE volume, never the table.

Exactly-once bookkeeping rides the tablelog watermark machinery: each
refresh commits to ``dst`` with ``stream_id = "mv:" + src`` and
``batch_id = the src version materialized``, so the high-water mark is
readable via ``last_committed_batch`` and a crashed/re-run refresh of
an already-materialized version is a no-op. Concurrent refreshes are
serialized by ``expected_base`` pinning — the loser gets
:class:`~tableone_pyspark_spark.sources.tablelog.CommitConflict` and
retries against the new state.

Honest boundary: float sums accumulate refresh-to-refresh roundoff
exactly as any incremental maintenance does (retraction is exact only
in exact arithmetic) — use integer/decimal columns where bit-parity
with a full recompute matters, or re-run a full refresh periodically
(``full_refresh=True``) to re-baseline. Groups whose count reaches 0
are dropped (never emitted as zombie zero rows). avg/min/max are NOT
offered: avg = sum/n downstream; min/max are not self-maintainable
under deletes without keeping per-group value multisets.

No counterpart in the reference repo; composes X120/X123 (CDC),
X125 (tablelog), X130 (change feed).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tableone_pyspark_spark.sources import tablelog as tl


def _mv_id(src_table: str) -> str:
    return f"mv:{src_table}"


def _full_aggregate(
    src_df: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in sum_cols:
        aggs += [
            F.sum(f"`{c}`").alias(f"sum_{c}"),
            # the non-null count makes sum retraction NULL-exact: a
            # group whose last non-null value is deleted must return
            # to sum NULL, not 0 (self-review r12)
            F.count(f"`{c}`").alias(f"nn_{c}"),
        ]
    return src_df.groupBy(*[f"`{c}`" for c in group_cols]).agg(*aggs)


def refresh_aggregate(
    spark: SparkSession,
    src_table: str,
    dst_table: str,
    group_cols: list[str],
    sum_cols: list[str],
    keys: list[str] | None = None,
    full_refresh: bool = False,
) -> dict:
    """Bring ``dst_table`` up to ``src_table``'s current version.
    ``keys`` is required when the unrefreshed range contains overwrite
    commits (the change feed needs row identity to diff them — the
    :func:`~tableone_pyspark_spark.sources.tablelog.table_changes`
    contract). Returns ``{src_version, mode, rows}`` where mode is
    one of ``noop`` / ``full`` / ``incremental``."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if not sum_cols:
        raise ValueError(
            "sum_cols must be non-empty — a count-only aggregate still "
            "needs the schema pinned; pass a constant column upstream"
        )
    overlap = set(group_cols) & set(sum_cols)
    if overlap:
        raise ValueError(f"columns {sorted(overlap)} in both roles")
    out_names = {"n"} | {f"sum_{c}" for c in sum_cols} | {
        f"nn_{c}" for c in sum_cols
    }
    clash = out_names & set(group_cols)
    if clash or "n" in sum_cols:
        raise ValueError(
            f"column names {sorted(clash or {'n'})} collide with the "
            "aggregate output columns (n, sum_<c>) — rename upstream"
        )
    src_cur = tl.current_version(spark, src_table)
    if src_cur is None:
        raise ValueError(f"no such versioned table: {src_table}")
    mv = _mv_id(src_table)
    # dst_base BEFORE the watermark (self-review r12): read the other
    # way round, a concurrent refresh landing between the two reads
    # gives a stale watermark with a fresh base — expected_base would
    # pass and the same change range be applied TWICE. With base
    # first, a commit after it trips expected_base; one before it is
    # already reflected in the watermark we then read.
    dst_base = tl.current_version(spark, dst_table)
    last = tl.last_committed_batch(spark, dst_table, mv)
    if last is not None and last >= src_cur and not full_refresh:
        return {"src_version": last, "mode": "noop", "rows": 0}

    if last is None or full_refresh:
        agg = _full_aggregate(
            tl.read_version(spark, src_table, src_cur),
            group_cols,
            sum_cols,
        )
        doc = tl.commit(
            spark, agg, dst_table, mode="overwrite",
            expected_base=dst_base, batch_id=src_cur, stream_id=mv,
        )
        tl._write_stream_sidecar(spark, dst_table, mv, src_cur,
                                 doc["version"])
        return {
            "src_version": src_cur,
            "mode": "full",
            "rows": _n_rows(spark, dst_table, doc["version"]),
        }

    ch = tl.table_changes(
        spark, src_table, last, src_cur, keys=keys,
        include_preimage=True,
    )
    sign = (
        F.when(F.col("op").isin("I", "U_post"), F.lit(1))
        .when(F.col("op").isin("D", "U_pre"), F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat_ws(
                    "", F.lit("refresh_aggregate: unexpected op "),
                    F.col("op"),
                )
            )
        )
    )
    d_aggs = [F.sum(sign).alias("__dn")]
    for c in sum_cols:
        d_aggs += [
            F.sum(sign * F.col(f"`{c}`")).alias(f"__ds_{c}"),
            F.sum(
                sign * F.col(f"`{c}`").isNotNull().cast("long")
            ).alias(f"__dnn_{c}"),
        ]
    deltas = ch.groupBy(*[f"`{c}`" for c in group_cols]).agg(*d_aggs)
    cur_mv = tl.read_version(spark, dst_table, dst_base)
    dd = deltas.select(
        *[F.col(f"`{c}`").alias(f"__g_{c}") for c in group_cols],
        "__dn",
        *[f"__ds_{c}" for c in sum_cols],
        *[f"__dnn_{c}" for c in sum_cols],
    )
    cond = reduce(
        lambda a, b: a & b,
        [cur_mv[c].eqNullSafe(dd[f"__g_{c}"]) for c in group_cols],
    )
    merged = cur_mv.join(dd, cond, "full_outer").select(
        *[
            F.coalesce(cur_mv[c], dd[f"__g_{c}"]).alias(c)
            for c in group_cols
        ],
        (
            F.coalesce(cur_mv["n"], F.lit(0))
            + F.coalesce(dd["__dn"], F.lit(0))
        ).alias("n"),
        *[
            col
            for c in sum_cols
            for col in (
                # sum is NULL exactly when the group holds ZERO
                # non-null values — tracked by the nn_<c> counter, so
                # deleting a group's last non-null value retracts the
                # sum back to NULL, matching a full recompute
                # (self-review r12; coalesce-only arithmetic returned
                # 0 there)
                F.when(
                    (
                        F.coalesce(cur_mv[f"nn_{c}"], F.lit(0))
                        + F.coalesce(dd[f"__dnn_{c}"], F.lit(0))
                    )
                    == 0,
                    F.lit(None),
                )
                .otherwise(
                    F.coalesce(cur_mv[f"sum_{c}"], F.lit(0))
                    + F.coalesce(dd[f"__ds_{c}"], F.lit(0))
                )
                .alias(f"sum_{c}"),
                (
                    F.coalesce(cur_mv[f"nn_{c}"], F.lit(0))
                    + F.coalesce(dd[f"__dnn_{c}"], F.lit(0))
                ).alias(f"nn_{c}"),
            )
        ],
    ).where(F.col("n") > 0)
    doc = tl.commit(
        spark, merged, dst_table, mode="overwrite",
        expected_base=dst_base, batch_id=src_cur, stream_id=mv,
    )
    # the same best-effort scan-floor sidecar streaming_commit writes
    tl._write_stream_sidecar(spark, dst_table, mv, src_cur,
                             doc["version"])
    return {
        "src_version": src_cur,
        "mode": "incremental",
        "rows": _n_rows(spark, dst_table, doc["version"]),
    }


def _n_rows(spark: SparkSession, table: str, version: int) -> int:
    return tl.read_version(spark, table, version).count()
