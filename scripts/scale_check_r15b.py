#!/usr/bin/env python
"""r15 second-batch scale probes.

(1) Distributed vacuum: reclaim N small files with the driver-serial
    loop vs the executor-parallel job (threshold forced each way).
    The driver loop pays one FS round-trip per file; the Spark job
    amortizes scheduling over the batch — the crossover justifies
    VACUUM_DISTRIBUTED_DELETES' default.

(2) Generated-column fill overhead: committing a batch that OMITS a
    generated column vs one that supplies it — the fill is one
    Catalyst expression, so the delta must be noise, flat at 10x.

Run: python scripts/scale_check_r15b.py
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
        .appName("scale_check_r15b")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tableone_pyspark_spark.sources import tablelog as tl

    report: dict = {}
    root = tempfile.mkdtemp(prefix="scale_r15b_")
    try:
        # (1) vacuum: stage a table whose v0 has N files, overwritten
        # so they all become reclaimable
        n_files = 1500

        def stage_vac(name: str) -> str:
            tbl = f"{root}/{name}"
            tl.commit(
                spark,
                spark.range(n_files * 10).select(F.col("id").alias("k"))
                .repartition(n_files),
                tbl,
            )
            tl.commit(
                spark,
                spark.range(5).select(F.col("id").alias("k")),
                tbl,
                mode="overwrite",
            )
            return tbl

        orig = tl.VACUUM_DISTRIBUTED_DELETES
        try:
            tbl = stage_vac("vac_driver")
            tl.VACUUM_DISTRIBUTED_DELETES = 10**9  # force driver loop
            s_drv, rep_d = t(
                lambda: tl.vacuum(spark, tbl, keep_last=1,
                                  min_age_seconds=0)
            )
            tbl2 = stage_vac("vac_dist")
            tl.VACUUM_DISTRIBUTED_DELETES = 1  # force the Spark job
            s_dist, rep_x = t(
                lambda: tl.vacuum(spark, tbl2, keep_last=1,
                                  min_age_seconds=0)
            )
        finally:
            tl.VACUUM_DISTRIBUTED_DELETES = orig
        assert rep_d["n_deleted"] == rep_x["n_deleted"] >= n_files
        report["vacuum"] = {
            "files_reclaimed": rep_d["n_deleted"],
            "driver_serial_s": round(s_drv, 2),
            "executor_parallel_s": round(s_dist, 2),
        }

        # (2) generated fill overhead at 1x / 10x
        for mult, label in ((1, "1x"), (10, "10x")):
            n = 300_000 * mult
            tbl = f"{root}/gen_{label}"
            tl.commit(
                spark,
                spark.range(10).select(
                    F.col("id").alias("k"),
                    (F.col("id") * 2.0).alias("k2"),
                ),
                tbl,
            )
            tl.set_generated(spark, tbl, "k2", "k * 2.0")
            supplied = spark.range(n).select(
                F.col("id").alias("k"), (F.col("id") * 2.0).alias("k2")
            )
            omitted = spark.range(n, 2 * n).select(F.col("id").alias("k"))
            s_sup, _ = t(lambda: tl.commit(spark, supplied, tbl))
            s_omit, _ = t(lambda: tl.commit(spark, omitted, tbl))
            report[f"generated_fill_{label}"] = {
                "rows": n,
                "supplied_commit_s": round(s_sup, 2),
                "omitted_fill_commit_s": round(s_omit, 2),
            }
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()


def hilbert_probe() -> None:
    """Hilbert vs Morton at 1x/10x: wall time (the projection chain
    must codegen to near-Morton cost) and layout quality (mean
    per-file span fraction in each clustered dimension — lower is
    tighter skipping)."""
    import json as _json
    import shutil
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tableone_pyspark_spark.sources.io import (
        parquet_column_ranges,
        write_hilbert_clustered,
        write_zordered,
    )

    root = tempfile.mkdtemp(prefix="scale_hilbert_")
    report: dict = {}
    try:
        for mult, label in ((1, "1x"), (10, "10x")):
            n = 500_000 * mult
            df = spark.range(n).select(
                (F.col("id") * 2654435761 % 1000003).alias("a"),
                (F.col("id") * 40503 % 999983).alias("b"),
            )
            out_z = f"{root}/z_{label}"
            out_h = f"{root}/h_{label}"
            tz, _ = t(lambda: write_zordered(df, out_z, ["a", "b"],
                                             n_files=16))
            th, _ = t(lambda: write_hilbert_clustered(
                df, out_h, ["a", "b"], n_files=16))

            def mean_span(path):
                rng = parquet_column_ranges(path, ["a", "b"])
                out = {}
                for col, width in (("a", 1000003), ("b", 999983)):
                    spans = [
                        (r[col][1] - r[col][0]) / width
                        for r in rng
                        if r[col][0] is not None
                    ]
                    out[col] = round(sum(spans) / len(spans), 3)
                return out

            report[label] = {
                "rows": n,
                "zorder_write_s": round(tz, 2),
                "hilbert_write_s": round(th, 2),
                "zorder_mean_span": mean_span(out_z),
                "hilbert_mean_span": mean_span(out_h),
            }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(_json.dumps({"hilbert_vs_morton": report}, indent=1))


if __name__ == "__main__":
    hilbert_probe()
