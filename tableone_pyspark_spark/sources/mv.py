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

``streaming_refresh`` (X142) is the same merge driven by the X140
change-feed STREAM — the continuously-maintained aggregate: each
micro-batch's insert/delete rows become signed deltas, exactly-once
per micro-batch id, no caller-side refresh loop.

No counterpart in the reference repo; composes X120/X123 (CDC),
X125 (tablelog), X130 (change feed), X138/X140 (the source).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tableone_pyspark_spark.sources import tablelog as tl


def _mv_id(src_table: str) -> str:
    return f"mv:{src_table}"


def _validate_cols(group_cols: list[str], sum_cols: list[str]) -> None:
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
    ``keys`` upgrades overwrite versions in the unrefreshed range to
    row-identity diffs (U_pre/U_post — change-sized when few rows
    actually moved); without keys an overwrite arrives as
    retract-all + insert-all (X146's batch half — correct, but the
    delta pass scans the two adjacent live views). Returns
    ``{src_version, mode, rows}`` where mode is one of ``noop`` /
    ``full`` / ``incremental``."""
    _validate_cols(group_cols, sum_cols)
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
    deltas = _signed_deltas(
        ch, group_cols, sum_cols, ("I", "U_post"), ("D", "U_pre"), "op"
    )
    cur_mv = tl.read_version(spark, dst_table, dst_base)
    merged = _merge_into(cur_mv, deltas, group_cols, sum_cols)
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


def _signed_deltas(
    ch: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    plus_ops: tuple,
    minus_ops: tuple,
    op_col: str,
) -> DataFrame:
    """Per-group signed (count, sum, non-null-count) deltas of a
    change frame — additions count +1, retractions -1; an unexpected
    op raises mid-plan rather than silently corrupting the state."""
    sign = (
        F.when(F.col(op_col).isin(*plus_ops), F.lit(1))
        .when(F.col(op_col).isin(*minus_ops), F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat_ws(
                    "", F.lit("aggregate refresh: unexpected op "),
                    F.col(op_col),
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
    return ch.groupBy(*[f"`{c}`" for c in group_cols]).agg(*d_aggs)


def _merge_into(
    cur_mv: DataFrame,
    deltas: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """ONE keyed full-outer merge of signed deltas into the maintained
    state (NULL-group-safe; a group's sum returns to NULL exactly when
    its non-null count reaches zero; emptied groups are dropped)."""
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
    return merged


def _n_rows(spark: SparkSession, table: str, version: int) -> int:
    return tl.read_version(spark, table, version).count()


def streaming_refresh(
    spark: SparkSession,
    src_table: str,
    dst_table: str,
    group_cols: list[str],
    sum_cols: list[str],
    checkpoint: str,
):
    """X142 — the CONTINUOUSLY-maintained aggregate: drive the same
    merge :func:`refresh_aggregate` runs in batch from the X140
    change-feed STREAM (``read_changes``), so the summary table
    follows the source trigger-by-trigger without anyone calling
    refresh. Each micro-batch's insert/delete rows become signed
    per-group deltas (+1 / −1) applied through the one keyed
    full-outer merge; exactly-once rides the tablelog watermark
    (``stream_id = "mvstream:" + checkpoint``, batch_id = the
    micro-batch id — the streaming_commit convention: a replayed
    batch whose commit succeeded is a no-op), and concurrent writers
    trip ``expected_base``.

    Returns the CONFIGURED ``DataStreamWriter`` — the caller picks
    the trigger (``.trigger(availableNow=True).start()`` to drain,
    plain ``.start()`` for continuous maintenance).

    Mid-stream source changes: keyed upserts (merge_rows) and keyless
    overwrites both stream through the feed (X144/X146 — the
    overwrite arrives as retract-previous-live + insert-new, so the
    MV lands on the post-overwrite aggregate without keys); only a
    schema-changing overwrite still fails the stream. Honest
    boundary: a ``dst_table`` must be maintained by ONE mechanism —
    this stream's watermark (mvstream:…) and the batch refresher's
    (mv:src) are independent, so mixing them double-applies
    changes."""
    _validate_cols(group_cols, sum_cols)
    from tableone_pyspark_spark.sources.stream_source import (
        TablelogDataSource,
    )

    spark.dataSource.register(TablelogDataSource)
    stream = (
        spark.readStream.format("tablelog")
        .option("read_changes", "true")
        .load(src_table)
    )
    sid = f"mvstream:{checkpoint}"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        last = tl.last_committed_batch(s, dst_table, sid)
        if last is not None and batch_id <= last:
            return  # replayed batch whose commit already landed
        data = batch_df.drop("_commit_version")
        if data.isEmpty():
            return  # no changes this trigger — don't mint a version
        # dst base BEFORE the merge read, the refresh_aggregate
        # ordering (a concurrent commit trips expected_base below)
        dst_base = tl.current_version(s, dst_table)
        deltas = _signed_deltas(
            data, group_cols, sum_cols, ("insert",), ("delete",),
            "_change_type",
        )
        if dst_base is None:
            # first batch of a fresh MV: merge into the empty state —
            # an empty aggregate of the batch frame IS the MV schema
            cur_mv = _full_aggregate(
                data.drop("_change_type").limit(0), group_cols, sum_cols
            )
        else:
            cur_mv = tl.read_version(s, dst_table, dst_base)
        merged = _merge_into(cur_mv, deltas, group_cols, sum_cols)
        doc = tl.commit(
            s, merged, dst_table, mode="overwrite",
            expected_base=dst_base, batch_id=batch_id, stream_id=sid,
        )
        tl._write_stream_sidecar(s, dst_table, sid, batch_id,
                                 doc["version"])

    return stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
