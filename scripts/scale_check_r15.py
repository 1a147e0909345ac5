#!/usr/bin/env python
"""r15 scale probes — the X152 additive-evolution read paths.

(1) Declared-schema read vs footer-inferred read on a UNIFORM table
    at 1x vs 10x rows: the r15 rewiring of read_version through
    ``spark.read.schema(doc_schema)`` must be cost-neutral for
    ordinary tables (it skips footer inference, so if anything it
    saves driver time on wide file lists).

(2) NULL-filled evolved read at 1x vs 10x: a table whose live set is
    half pre-evolution files (missing the new column) and half
    evolved files. The per-row cost of by-name NULL-fill must be
    flat — parquet's missing-column resolution materializes a null
    vector per batch, no row-at-a-time work.

(3) Evolved DataSource batch read (the Arrow ``_column_or_nulls``
    executor path) 1x vs 10x — same flatness requirement for the
    Python reader.

(4) Prune-after-evolution: per-file stats recorded before the
    evolution must still skip files in a pruned read of the evolved
    table (skipping quality survives the schema change), while a
    prune on the NEW column keeps stat-less old files (never loses
    rows).

Run: python scripts/scale_check_r15.py
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
        .appName("scale_check_r15")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tableone_pyspark_spark.sources import tablelog as tl
    from tableone_pyspark_spark.sources.stream_source import (
        TablelogDataSource,
    )

    spark.dataSource.register(TablelogDataSource)
    report: dict = {}
    root = tempfile.mkdtemp(prefix="scale_r15_")

    def stage(n_rows: int, name: str) -> str:
        """v0 = old-schema files (k, v) with stats; v1 = evolved
        append (k, v, w) of the same row count."""
        tbl = f"{root}/{name}"
        old = spark.range(n_rows).select(
            F.col("id").alias("k"),
            F.concat(F.lit("r"), F.col("id")).alias("v"),
        )
        tl.commit(spark, old.repartition(8, "k"), tbl, stats_cols=["k"])
        new = spark.range(n_rows, 2 * n_rows).select(
            F.col("id").alias("k"),
            F.concat(F.lit("r"), F.col("id")).alias("v"),
            (F.col("id") * 0.5).alias("w"),
        )
        tl.commit(spark, new.repartition(8, "k"), tbl,
                  merge_schema=True, stats_cols=["k", "w"])
        return tbl

    try:
        for mult, label in ((1, "1x"), (10, "10x")):
            n = 400_000 * mult
            tbl = stage(n, f"evo_{label}")

            # (1) declared-schema read on the UNIFORM v0 slice
            s1, c1 = t(lambda: tl.read_version(spark, tbl, 0).count())
            # (2) NULL-filled evolved read (half the files lack w)
            s2, agg = t(
                lambda: tl.read_version(spark, tbl)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.count("w").alias("n_w"),
                )
                .first()
            )
            assert agg["n"] == 2 * n and agg["n_w"] == n, agg
            # (3) evolved DataSource batch read (Arrow NULL-fill)
            s3, agg3 = t(
                lambda: spark.read.format("tablelog")
                .load(tbl)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.count("w").alias("n_w"),
                )
                .first()
            )
            assert agg3["n"] == 2 * n and agg3["n_w"] == n, agg3
            report[label] = {
                "rows_per_version": n,
                "uniform_declared_read_s": round(s1, 2),
                "evolved_nullfill_read_s": round(s2, 2),
                "evolved_datasource_read_s": round(s3, 2),
            }

            # (4) prune survival — on the big staging only once
            if mult == 1:
                pruned = tl.read_version(
                    spark, tbl, prune=[("k", "<", n // 8)]
                )
                n_read = (
                    pruned.select(F.input_file_name()).distinct().count()
                )
                total = len(tl._version_doc(spark, tbl, 1)["files"])
                assert n_read < total, (n_read, total)
                keep_old = tl.read_version(
                    spark, tbl, prune=[("w", ">=", 0.0)]
                ).count()
                assert keep_old == 2 * n, keep_old  # never loses rows
                report["prune_after_evolution"] = {
                    "files_read": n_read,
                    "files_total": total,
                }
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
