#!/usr/bin/env python
"""r16 scale probes — the X157 column-mapping read/write paths.

(1) Mapped read vs identity read at 1x and 10x rows: a renamed
    table's reads add ONE projection (physical→logical aliases) above
    the scan — Catalyst collapses it into the scan's output, so the
    per-row cost must be flat and ~zero.

(2) rename_column / drop_column wall time at 1x vs 10x rows: both are
    METADATA-ONLY (one doc read + one doc write + the expression
    guard's empty-frame binds) — wall time must not scale with data.

(3) Mapped DataSource batch read (the Arrow `_column_or_nulls`
    physical-name path) at 1x vs 10x — flat like (1).

(4) Prune-through-rename: stats re-keyed by the rename must skip the
    same files a pre-rename prune did (skipping quality survives the
    rename at any size).

Run: python scripts/scale_check_r16.py
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
        .appName("scale_check_r16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tableone_pyspark_spark.sources import tablelog as tl
    from tableone_pyspark_spark.sources.stream_source import (
        TablelogDataSource,
    )

    spark.dataSource.register(TablelogDataSource)
    report: dict = {}
    root = tempfile.mkdtemp(prefix="scale_r16_")

    def stage(n_rows: int, name: str, renamed: bool) -> str:
        tbl = f"{root}/{name}"
        df = spark.range(n_rows).select(
            F.col("id").alias("k"),
            (F.col("id") % 997).cast("double").alias("price"),
            F.concat(F.lit("r"), F.col("id") % 1000).alias("v"),
        )
        # range-partition on price so its per-file [min, max] ranges
        # are disjoint — the prune-through-rename probe needs files a
        # price band can actually skip
        tl.commit(
            spark,
            df.repartitionByRange(16, "price"),
            tbl,
            stats_cols=["k", "price"],
        )
        if renamed:
            tl.rename_column(spark, tbl, "price", "cost")
        return tbl

    for scale, n in (("1x", 400_000), ("10x", 4_000_000)):
        ident = stage(n, f"ident_{scale}", renamed=False)
        mapped = stage(n, f"mapped_{scale}", renamed=True)

        # (1) full-scan agg through read_version, identity vs mapped
        def scan(tbl, col):
            return lambda: tl.read_version(spark, tbl).agg(
                F.sum(F.col(col)), F.count(F.lit(1))
            ).collect()

        for _ in range(2):  # warm both paths once, record second
            ti, _o = t(scan(ident, "price"))
            tm, _o = t(scan(mapped, "cost"))
        report[f"rv_identity_{scale}_s"] = round(ti, 3)
        report[f"rv_mapped_{scale}_s"] = round(tm, 3)

        # (2) metadata-only op cost at this size
        tr, _o = t(lambda: tl.rename_column(spark, mapped, "cost", "amt"))
        report[f"rename_{scale}_s"] = round(tr, 3)
        td, _o = t(lambda: tl.drop_column(spark, mapped, "v"))
        report[f"drop_{scale}_s"] = round(td, 3)

        # (3) DataSource batch read through the mapping
        def ds_scan(tbl, col):
            return lambda: (
                spark.read.format("tablelog").load(tbl)
                .agg(F.sum(F.col(col)), F.count(F.lit(1))).collect()
            )

        for _ in range(2):
            di, _o = t(ds_scan(ident, "price"))
            dm, _o = t(ds_scan(mapped, "amt"))
        report[f"ds_identity_{scale}_s"] = round(di, 3)
        report[f"ds_mapped_{scale}_s"] = round(dm, 3)

        # (4) prune through the rename: files skipped and no row loss
        mx = n - 1
        pr = tl.read_version(spark, mapped, prune=[("amt", "<=", 100.0)])
        n_read = pr.select(F.input_file_name()).distinct().count()
        doc = tl._version_doc(spark, mapped, tl.current_version(spark, mapped))
        kept = pr.where(F.col("amt") <= 100.0).count()
        want = spark.range(n).where((F.col("id") % 997) <= 100).count()
        assert kept == want, (kept, want)
        report[f"prune_files_read_{scale}"] = n_read
        report[f"prune_files_total_{scale}"] = len(doc["files"])
        del mx

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
