#!/usr/bin/env python
"""Round-12 scaling + seam spot-checks for the newly-graded operator
families: pca (fit exact/sample + per-batch GEMM project), the exact
batch heavy_hitters, snapshot_diff, the tablelog commit/time-travel
path, and the NFC kernel. Protocol identical to earlier rounds: sf0.1
input, local[32], 1x vs 10x (re-keyed rows), wall-clock single runs
after a session warm-up — knee probes, not medians.

Also REPRODUCES the pca_project oracle seam measurement cited in
__spark_entry__.py: fold-replay vs per-batch GEMM max |delta| and the
nearest ROUND(6) boundary distance at both grading SFs (sf0.001,
sf0.01) — the margin that proves zero round flips are possible short
of new data.

Expected shapes:
  - pca_project: scan -> mapInPandas GEMM, no exchange -> linear in
    rows; fit(sample) cost FIXED (bounded ordered collect);
    fit(exact=True) one partial-sums pass, exchange = partitions x
    (d^2+d+1) scalars -> linear scan;
  - heavy_hitters: two partial-aggregated passes + broadcast totals,
    exchange bounded by distinct (group, key) -> linear;
  - snapshot_diff: two window gates + one keyed full-outer join (2
    exchanges, the r11 plan pin) -> linear in rows;
  - tablelog commit+read: data moves through ordinary parquet jobs,
    bookkeeping driver-side and metadata-sized -> linear in bytes;
  - nfc: one Arrow projection, zero shuffle -> linear.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

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


def seam_probe() -> None:
    """The pca_project oracle seam, reproduced: sequential fold vs
    per-batch GEMM (batch sizes 1/3/17/100/500) on the grading SFs."""
    import duckdb

    from tableone_pyspark_spark.operators.pca import _eig_model

    for sf in ("0.001", "0.01"):
        con = duckdb.connect()
        X = np.array(
            [
                r[0]
                for r in con.sql(
                    "SELECT CAST(embedding AS DOUBLE[]) FROM read_parquet("
                    f"'/root/testdata/sf{sf}/embeddings.parquet') "
                    "ORDER BY vec_id LIMIT 16384"
                ).fetchall()
            ],
            dtype=np.float64,
        )
        mu = X.mean(axis=0)
        Xc = X - mu
        model = _eig_model(mu, (Xc.T @ Xc) / len(X), 8)
        V = model.components
        fold = np.zeros((len(X), 8))
        for j in range(8):
            w = V[:, j]
            for r in range(len(X)):
                acc = 0.0
                for i in range(X.shape[1]):
                    acc = acc + (X[r, i] - mu[i]) * w[i]
                fold[r, j] = acc
        worst = 0.0
        flips = 0
        for b in (1, 3, 17, 100, 500):
            G = np.vstack(
                [(X[s : s + b] - mu) @ V for s in range(0, len(X), b)]
            )
            worst = max(worst, float(np.abs(G - fold).max()))
            flips += int((np.round(G, 6) != np.round(fold, 6)).sum())
        frac = np.abs(fold * 1e6 - np.round(fold * 1e6))
        margin = float(np.abs(frac - 0.5).min()) * 1e-6
        print(
            f"pca seam sf{sf}: max|fold-GEMM|={worst:.3e} "
            f"round6-flips={flips} boundary-margin={margin:.3e}",
            flush=True,
        )


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("scale_check_r12")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    seam_probe()

    from tableone_pyspark_spark.operators.cdc import snapshot_diff
    from tableone_pyspark_spark.operators.pca import fit_pca, pca_project
    from tableone_pyspark_spark.operators.sketches import heavy_hitters
    from tableone_pyspark_spark.sources import tablelog as tl

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # warm-up: footers + Arrow workers
    emb.count(), orders.count(), docs.count()

    emb10 = x10(emb, "vec_id")
    model = fit_pca(emb, k=8)

    timed("pca_project 1x", lambda: pca_project(emb, model).count())
    timed("pca_project 10x", lambda: pca_project(emb10, model).count())
    timed(
        "fit_pca exact 1x",
        lambda: fit_pca(emb, k=8, exact=True).components.shape,
    )
    timed(
        "fit_pca exact 10x",
        lambda: fit_pca(emb10, k=8, exact=True).components.shape,
    )

    o10 = x10(orders, "o_orderkey")
    timed(
        "heavy_hitters 1x",
        lambda: heavy_hitters(
            orders, "o_custkey", phi=0.002, group_cols=["o_orderpriority"]
        ).count(),
    )
    timed(
        "heavy_hitters 10x",
        lambda: heavy_hitters(
            o10, "o_custkey", phi=0.002, group_cols=["o_orderpriority"]
        ).count(),
    )

    def diff(df: DataFrame) -> int:
        k = F.col("o_orderkey")
        base = df.select(
            "o_orderkey", "o_custkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
        return snapshot_diff(
            base.where(k % 4 != 0),
            base.where(k % 4 != 3).withColumn(
                "o_totalprice",
                F.when(k % 5 == 0, F.col("o_totalprice") + 1.5).otherwise(
                    F.col("o_totalprice")
                ),
            ),
            ["o_orderkey"],
            ts=1,
        ).count()

    timed("snapshot_diff 1x", lambda: diff(orders))
    timed("snapshot_diff 10x", lambda: diff(o10))

    def travel(df: DataFrame) -> int:
        root = tempfile.mkdtemp(prefix="r12_tlog_")
        t = f"{root}/t"
        try:
            k = F.col("o_orderkey")
            tl.commit(spark, df.where(k % 3 == 0), t)
            tl.commit(spark, df.where(k % 3 == 1), t)
            tl.commit(spark, df.where(k % 3 == 2), t, mode="overwrite")
            return tl.read_version(spark, t, 1).count()
        finally:
            shutil.rmtree(root, ignore_errors=True)

    timed("tablelog commit+travel 1x", lambda: travel(orders))
    timed("tablelog commit+travel 10x", lambda: travel(o10))

    def stats_prune(df: DataFrame) -> tuple:
        root = tempfile.mkdtemp(prefix="r12_stats_")
        t = f"{root}/t"
        try:
            tl.commit(
                spark, df.repartition(16), t,
                stats_cols=["o_custkey", "o_totalprice"],
            )
            full = len(tl.read_version(spark, t).inputFiles())
            kept = len(
                tl.read_version(
                    spark, t, prune=[("o_custkey", "<", 100)]
                ).inputFiles()
            )
            return full, kept
        finally:
            shutil.rmtree(root, ignore_errors=True)

    timed("commit+stats 1x", lambda: stats_prune(orders))
    timed("commit+stats 10x", lambda: stats_prune(o10))

    def optimize_probe(df: DataFrame) -> tuple:
        root = tempfile.mkdtemp(prefix="r12_opt_")
        t = f"{root}/t"
        try:
            for i in range(8):
                tl.commit(spark, df.where(F.col("o_orderkey") % 8 == i), t)
            rep = tl.optimize(spark, t, target_bytes=8 * 1024 * 1024)
            return (rep["n_input_files"], rep["n_output_files"])
        finally:
            shutil.rmtree(root, ignore_errors=True)

    timed("optimize 1x", lambda: optimize_probe(orders))
    timed("optimize 10x", lambda: optimize_probe(o10))

    def mv_probe(df: DataFrame) -> tuple:
        from tableone_pyspark_spark.sources import mv

        root = tempfile.mkdtemp(prefix="r12_mv_")
        src, dst = f"{root}/s", f"{root}/d"
        try:
            k = F.col("o_orderkey")
            tl.commit(spark, df.where(k % 17 != 0), src)
            mv.refresh_aggregate(
                spark, src, dst, ["o_orderpriority"], ["o_totalprice"],
                keys=["o_orderkey"],
            )
            # a SMALL change batch: incremental work must track the
            # delta, not the table
            tl.commit(spark, df.where(k % 1709 == 0), src)
            t0 = time.time()
            rep = mv.refresh_aggregate(
                spark, src, dst, ["o_orderpriority"], ["o_totalprice"],
                keys=["o_orderkey"],
            )
            return (rep["mode"], round(time.time() - t0, 2))
        finally:
            shutil.rmtree(root, ignore_errors=True)

    timed("mv full+incr 1x", lambda: mv_probe(orders))
    timed("mv full+incr 10x", lambda: mv_probe(o10))

    def dv_probe(df: DataFrame) -> tuple:
        root = tempfile.mkdtemp(prefix="r12_dv_")
        t = f"{root}/t"
        try:
            tl.commit(spark, df.repartition(16), t)
            n = tl.read_version(spark, t).count()
            t0 = time.time()
            rep = tl.delete_rows(
                spark, t, F.col("o_orderkey") % 100 == 0
            )
            t_del = time.time() - t0
            t0 = time.time()
            n_after = tl.read_version(spark, t).count()
            t_read = time.time() - t0
            return (
                rep["n_deleted"],
                n - n_after,
                round(t_del, 2),
                round(t_read, 2),
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)

    timed("dv delete+read 1x", lambda: dv_probe(orders))
    timed("dv delete+read 10x", lambda: dv_probe(o10))

    from tableone_pyspark_spark.functions.unicode import nfc

    d10 = x10(docs, "doc_id")
    timed(
        "nfc 1x",
        lambda: docs.select(nfc(F.col("text")).alias("k"))
        .where(F.col("k").isNotNull())
        .count(),
    )
    timed(
        "nfc 10x",
        lambda: d10.select(nfc(F.col("text")).alias("k"))
        .where(F.col("k").isNotNull())
        .count(),
    )

    spark.stop()


if __name__ == "__main__":
    main()
