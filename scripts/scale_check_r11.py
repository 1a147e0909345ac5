#!/usr/bin/env python
"""10x scaling spot-checks for the round-11 asks: the maintenance
surface (compact_parquet + write_target_sized — VERDICT r10 ask #8,
many-small-files regime) and the two newly-graded one-pass operators
(expect.validate, apply_cdc). Protocol identical to earlier rounds:
sf0.1 input, local[32], 1x vs 10x (files or re-keyed rows), wall-clock
single runs after a session warm-up — knee probes, not medians.

Expected shapes:
  - compact_parquet: listing + FFD planning are driver-side and
    METADATA-sized (file names + lengths); execution is one tiny
    coalesce(1) job per bin + byte copies -> time ~linear in input
    BYTES/bins, never quadratic in file count;
  - write_target_sized: one limit(2048) driver sample + one write with
    maxRecordsPerFile -> linear in rows, sample cost FIXED;
  - expect.validate: every constraint compiles into ONE shared agg ->
    linear scan, exchange = one row;
  - apply_cdc: one window over the CHANGE batch + one keyed
    full-outer join -> linear in base+changes.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def x10(df: DataFrame, id_col: str) -> DataFrame:
    parts = [
        df.withColumn(id_col, F.col(id_col) + F.lit(k * 1_000_000_000))
        for k in range(10)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def timed(label: str, fn) -> None:
    t0 = time.time()
    n = fn()
    print(f"{label}: {time.time() - t0:.2f}s ({n})", flush=True)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("scale_check_r11")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{SF}/events.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    ev.count(), orders.count()  # session warm-up

    root = tempfile.mkdtemp(prefix="scale_r11_")

    # ---- compact_parquet: many-small-files regime --------------------
    from tableone_pyspark_spark.sources.compact import (
        compact_parquet,
        write_target_sized,
    )

    src1 = f"{root}/frag1"   # ~200 tiny files
    src10 = f"{root}/frag10"  # ~2000 tiny files, 10x rows
    ev.repartition(200).write.parquet(src1)
    x10(ev, "event_id").repartition(2000).write.parquet(src10)

    timed(
        "compact 1x (200 files)",
        lambda: compact_parquet(
            spark, src1, f"{root}/c1", target_bytes=32 * 1024 * 1024
        )["n_output_files"],
    )
    timed(
        "compact 10x (2000 files)",
        lambda: compact_parquet(
            spark, src10, f"{root}/c10", target_bytes=32 * 1024 * 1024
        )["n_output_files"],
    )

    # ---- write_target_sized ------------------------------------------
    timed(
        "write_target_sized 1x",
        lambda: write_target_sized(
            ev, f"{root}/w1", target_bytes=32 * 1024 * 1024
        )["rows_per_file"],
    )
    timed(
        "write_target_sized 10x",
        lambda: write_target_sized(
            x10(ev, "event_id"), f"{root}/w10",
            target_bytes=32 * 1024 * 1024,
        )["rows_per_file"],
    )

    # ---- expect.validate (one-pass constraint suite) ------------------
    from tableone_pyspark_spark.operators import expect as ex

    def checks(df):
        return ex.validate(df, [
            ex.completeness("o_custkey"),
            ex.in_range("o_totalprice", lo=0.0, hi=450000.0,
                        min_ratio=0.99),
            ex.matches("o_orderpriority", "^[1-5]-"),
            ex.primary_key("o_orderkey"),
            ex.row_count(min_rows=1),
        ]).count()

    timed("expect.validate 1x", lambda: checks(orders))
    timed("expect.validate 10x", lambda: checks(x10(orders, "o_orderkey")))

    # ---- apply_cdc -----------------------------------------------------
    from tableone_pyspark_spark.operators.cdc import apply_cdc

    def cdc(base):
        k = F.col("o_orderkey")
        ch = (
            base.where(k % 7 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
            .withColumn("op", F.lit("U"))
            .withColumn("ts", F.lit(1))
        )
        return apply_cdc(base, ch, ["o_orderkey"],
                         ts_col="ts", op_col="op").count()

    timed("apply_cdc 1x", lambda: cdc(orders))
    timed("apply_cdc 10x", lambda: cdc(x10(orders, "o_orderkey")))

    # ---- snapshot_diff (keyed full-outer + NULL-safe compare) ----------
    from tableone_pyspark_spark.operators.cdc import snapshot_diff

    def diff(base):
        newer = base.where(F.col("o_orderkey") % 5 != 0)
        return snapshot_diff(base, newer, ["o_orderkey"], ts=1).count()

    timed("snapshot_diff 1x", lambda: diff(orders))
    timed("snapshot_diff 10x", lambda: diff(x10(orders, "o_orderkey")))

    # ---- PCA: exact full-corpus fit + map-side projection --------------
    # embeddings are 500 rows at every SF — scale via re-keyed union
    # (100x = 50k vectors x 64 dims; the exchange must stay
    # partitions x (d^2+d+1) scalars)
    from tableone_pyspark_spark.operators.pca import fit_pca, pca_project

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    def x_n(df, n):
        parts = [
            df.withColumn("vec_id", F.col("vec_id") + F.lit(k * 1_000_000))
            for k in range(n)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    e10 = x_n(emb, 10)
    e100 = x_n(emb, 100)

    def pca_run(src):
        m = fit_pca(src, k=16, exact=True)
        return pca_project(src, m, whiten=True).count()

    timed("pca exact fit+project 10x (5k vecs)", lambda: pca_run(e10))
    timed("pca exact fit+project 100x (50k vecs)", lambda: pca_run(e100))

    # ---- cluster representatives (join + shared-key windows) -----------
    from tableone_pyspark_spark.operators.dedup import (
        select_representatives,
    )

    def reps(base):
        # synthetic clusters: every 10 consecutive ids are one cluster
        ids = base.select(F.col("o_orderkey").alias("id"))
        cl = ids.select(
            "id", (F.col("id") - F.col("id") % 10).alias("cluster_id")
        )
        return select_representatives(
            base.withColumnRenamed("o_orderkey", "id"), cl, "id",
            score_col="o_totalprice",
        ).count()

    timed("select_representatives 1x", lambda: reps(orders))
    timed(
        "select_representatives 10x",
        lambda: reps(x10(orders, "o_orderkey")),
    )

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
