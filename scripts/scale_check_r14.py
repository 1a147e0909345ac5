#!/usr/bin/env python
"""r14 scale probes.

(1) Checkpoint doc growth (ADVICE r13 closure): a 300-version table
    with a WIDE schema (40 columns). Measured: checkpoint doc BYTES
    with the r14 shape dedup vs the pre-r14 per-row-inline cost
    (reconstructed arithmetically from the same doc — rows x shape
    bytes), and doc bytes under CHECKPOINT_HISTORY=50 — the quadratic
    cumulative-metadata fix made measurable. Metadata-only publishes
    (synthetic file lists over one real parquet file).

(2) tablelog lifecycle ops at 1x vs 10x rows: clone and restore must
    be FLAT (metadata-only one-doc ops whatever the table size);
    optimize(zorder) and the pruned read scale with data (one rewrite
    + a skipping read), probed for sub-linearity.

(3) streaming MV drain (X140 feed -> X142 merge) at 1x vs 10x source
    rows with a FIXED number of versions: the drain reads every new
    file once, so it scales with change volume (the appended data),
    and the merge state stays bounded by group count.

Run: python scripts/scale_check_r14.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def t(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("scale_check_r14")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tableone_pyspark_spark.sources import mv
    from tableone_pyspark_spark.sources import tablelog as tl

    report: dict = {}

    # ---- (1) checkpoint doc size: wide schema, 300 versions ----------
    root = tempfile.mkdtemp(prefix="cksize_probe_")
    tbl = f"{root}/t"
    try:
        wide = spark.range(2).select(
            *[(F.col("id") + i).alias(f"col_{i:02d}_name") for i in range(40)]
        )
        tl.commit(spark, wide.coalesce(1), tbl)  # v0, real files
        doc0 = tl._version_doc(spark, tbl, 0)
        f0, sch = doc0["files"], doc0["schema"]

        def publish(n):
            for v in range(1, n + 1):
                tl._publish(
                    spark, tbl, v,
                    f0 + [f"{tbl}/data/synth{v}/part-0.parquet"],
                    "overwrite", sch,
                )

        el, _ = t(lambda: publish(300))
        report["publish_300_wide_versions_s"] = round(el, 2)
        ckp = tl._checkpoint_path(tbl, 300)
        ck = tl._read_json(spark, ckp)
        deduped_bytes = len(json.dumps(ck))
        shape_bytes = len(json.dumps(ck["shapes"][0]))
        # pre-r14 cost: every history row inlined its shape
        inline_bytes = deduped_bytes + (len(ck["history"]) - 1) * shape_bytes
        report["ck_doc_bytes_deduped"] = deduped_bytes
        report["ck_doc_bytes_pre_r14_inline"] = inline_bytes
        report["ck_shape_dedup_saving_x"] = round(
            inline_bytes / deduped_bytes, 2
        )
        # bounded history depth: rewrite the checkpoint under a cap
        old_bound = tl.CHECKPOINT_HISTORY
        try:
            tl.CHECKPOINT_HISTORY = 50
            import os

            os.remove(ckp)
            crc = f"{tbl}/_log/._checkpoint_v300.json.crc"
            if os.path.exists(crc):  # LocalFS checksum sidecar blocks
                os.remove(crc)       # the re-create rename

            ck50 = tl.write_checkpoint(spark, tbl, 300)
            report["ck_doc_bytes_bounded_50"] = len(json.dumps(ck50))
        finally:
            tl.CHECKPOINT_HISTORY = old_bound
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # ---- (2) lifecycle ops 1x vs 10x ----------------------------------
    def lifecycle_probe(mult: int) -> dict:
        n = 60_000 * mult
        root = tempfile.mkdtemp(prefix=f"lc_probe_{mult}_")
        tbl, cl = f"{root}/t", f"{root}/c"
        out: dict = {}
        try:
            df = spark.range(n).select(
                F.col("id").alias("k"),
                (F.col("id") % 97).cast("string").alias("s"),
                (F.col("id") * 1.5).alias("x"),
            )
            tl.commit(spark, df.where(F.col("k") % 2 == 0).coalesce(8),
                      tbl, stats_cols=["k"])
            tl.commit(spark, df.where(F.col("k") % 2 == 1).coalesce(8),
                      tbl, stats_cols=["k"])
            tl.delete_rows(spark, tbl, F.col("k") % 7 == 0)
            out["clone_s"], _ = t(lambda: tl.clone(spark, tbl, cl))
            out["restore_s"], _ = t(lambda: tl.restore(spark, tbl, 1))
            el, rep = t(lambda: tl.optimize(
                spark, tbl, target_bytes=256 * 1024,
                zorder_by=["k"],
            ))
            out["optimize_zorder_s"] = el
            cut = n // 2
            el, got = t(lambda: tl.read_version(
                spark, tbl, rep["version"], prune=[("k", "<=", cut)]
            ).where(F.col("k") <= cut).count())
            out["pruned_read_s"] = el
            out["pruned_rows"] = got
        finally:
            shutil.rmtree(root, ignore_errors=True)
        return {k: (round(v, 2) if isinstance(v, float) else v)
                for k, v in out.items()}

    report["lifecycle_1x"] = lifecycle_probe(1)
    report["lifecycle_10x"] = lifecycle_probe(10)

    # ---- (3) streaming MV drain 1x vs 10x -----------------------------
    def mv_stream_probe(mult: int) -> float:
        n = 40_000 * mult
        root = tempfile.mkdtemp(prefix=f"mvs_probe_{mult}_")
        src, dst, ckp = f"{root}/s", f"{root}/m", f"{root}/ck"
        try:
            df = spark.range(n).select(
                F.col("id").alias("k"),
                (F.col("id") % 53).cast("string").alias("g"),
                (F.col("id") % 11).cast("long").alias("v"),
            )
            tl.commit(spark, df.where(F.col("k") % 3 == 0).coalesce(8), src)
            tl.commit(spark, df.where(F.col("k") % 3 == 1).coalesce(8), src)
            tl.delete_rows(spark, src, F.col("k") % 13 == 0)

            def drain():
                q = (
                    mv.streaming_refresh(spark, src, dst, ["g"], ["v"], ckp)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                return tl.read_version(spark, dst).count()

            el, rows = t(drain)
            assert rows == 53, rows
            return round(el, 2)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    report["mv_stream_drain_1x_s"] = mv_stream_probe(1)
    report["mv_stream_drain_10x_s"] = mv_stream_probe(10)

    # ---- (4) merge_rows at 1x vs 10x table, FIXED source size --------
    # the match is one scan of the live view (like delete_rows) and
    # the writes are change-sized — expect scan-bounded sublinearity,
    # never a rewrite of the table
    def merge_probe(mult: int) -> float:
        n = 60_000 * mult
        root = tempfile.mkdtemp(prefix=f"mg_probe_{mult}_")
        tbl = f"{root}/t"
        try:
            df = spark.range(n).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )
            tl.commit(spark, df.coalesce(16), tbl)
            src = spark.range(500).select(
                (F.col("id") * 7).alias("k"),
                F.lit(-1).cast("long").alias("v"),
            )
            el, rep = t(lambda: tl.merge_rows(spark, tbl, src, ["k"]))
            assert rep["n_deleted"] > 0 and rep["n_inserted"] == 500, rep
            return round(el, 2)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    report["merge_fixed_source_1x_s"] = merge_probe(1)
    report["merge_fixed_source_10x_s"] = merge_probe(10)

    # (4) resample_interpolate window pass at 1x vs 10x rows per key:
    # the r14 fix replaced the [current, unboundedFollowing] forward-
    # fill frame (Spark recomputes it per row — O(rows^2) per key;
    # 110 s at sf0.1 pre-fix) with a running frame over the reversed
    # ordering — expect near-LINEAR now, the quadratic would show as
    # ~100x at 10x
    from tableone_pyspark_spark.functions.events import (
        resample_interpolate,
    )

    def resample_probe(mult: int) -> float:
        n = 20_000 * mult
        df = spark.range(n).select(
            (F.col("id") % 4).cast("string").alias("key"),
            F.timestamp_seconds(
                F.lit(1_700_000_000)
                + F.col("id") * 37 % (86_400 * 30)
            ).alias("ts"),
            (F.col("id") % 997).cast("double").alias("v"),
        )
        el, _ = t(
            lambda: resample_interpolate(
                df, "key", "ts", "v", interval_seconds=1800
            ).count()
        )
        return round(el, 2)

    report["resample_window_1x_s"] = resample_probe(1)
    report["resample_window_10x_s"] = resample_probe(10)

    # (5) X146 overwrite change-feed drain at 1x vs 10x table rows
    # (fixed version count): delivery = prev live view retracted + new
    # files inserted, so drain time must track CHANGE VOLUME (the
    # table size an overwrite rewrites — linear by semantics, same as
    # Delta); the planning side is one extra metadata doc read per
    # overwrite version regardless of size
    from tableone_pyspark_spark.sources.stream_source import (
        TablelogDataSource,
    )

    spark.dataSource.register(TablelogDataSource)

    def overwrite_feed_probe(mult: int) -> float:
        n = 30_000 * mult
        root = tempfile.mkdtemp(prefix=f"owfeed_{mult}_")
        tbl, out, ck = f"{root}/t", f"{root}/out", f"{root}/ck"
        try:
            df = spark.range(n).select(
                F.col("id").alias("k"), (F.col("id") * 3).alias("v")
            )
            tl.commit(spark, df.coalesce(8), tbl)                  # v0
            tl.delete_rows(spark, tbl, F.col("k") % 5 == 0)        # v1
            tl.commit(
                spark,
                df.select("k", (F.col("v") + 1).alias("v")).coalesce(8),
                tbl,
                mode="overwrite",
            )                                                      # v2
            def drain():
                q = (
                    spark.readStream.format("tablelog")
                    .option("read_changes", "true").load(tbl)
                    .writeStream.format("parquet").option("path", out)
                    .option("checkpointLocation", ck)
                    .trigger(availableNow=True).start()
                )
                q.awaitTermination()
                return spark.read.parquet(out).count()

            el, rows = t(drain)
            assert rows == n + n // 5 + n + n - n // 5, rows
            return round(el, 2)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    report["overwrite_feed_1x_s"] = overwrite_feed_probe(1)
    report["overwrite_feed_10x_s"] = overwrite_feed_probe(10)

    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
