#!/usr/bin/env python
"""r17 scale probes — X161 incremental OPTIMIZE, X162 rebase cost,
X163 widened-read overhead.

(1) X161: incremental clustered optimize cost must scale with the
    APPENDED data, not the table size. Build a clustered base at 1x
    and 10x rows, append a FIXED-size slice to each, and time the
    bare optimize: the two times must be comparable (the 10x table
    must NOT pay ~10x), and the carried file set must be untouched.
    Also: the no-op repeat call must be metadata-priced (<1s).

(2) X162: the delete/merge rebase is METADATA-ONLY — doc reads +
    one doc write; timing the rebase path vs the no-race path at 10x
    rows shows no data-proportional overhead (the vector was already
    written before the race).

(3) X163: reading a widened table (narrow files promoted) vs an
    identical natively-wide table — per-row promotion cost must be
    ~zero (Spark's parquet reader widens inside the scan).

Run: python scripts/scale_check_r17.py
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

    from pyspark.sql import SparkSession, functions as F

    from tableone_pyspark_spark.sources import tablelog as tl

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="scale_r17_")
    report: dict = {}
    try:
        # ---- (1) X161 incremental optimize ∝ new data --------------
        def build(n_rows: int, tag: str) -> str:
            tbl = f"{root}/inc_{tag}"
            base = spark.range(n_rows).select(
                F.col("id").alias("k"),
                (F.col("id") % 997).cast("double").alias("v"),
            )
            tl.commit(spark, base.repartition(16), tbl,
                      stats_cols=["k", "v"])
            tl.set_property(spark, tbl, "cluster.by", "k,v")
            tl.optimize(spark, tbl, target_bytes=4 << 20)  # full
            return tbl

        append = spark.range(50_000).select(
            (F.col("id") + 10_000_000).alias("k"),
            (F.col("id") % 997).cast("double").alias("v"),
        )
        out = {}
        for tag, n in (("1x", 400_000), ("10x", 4_000_000)):
            tbl = build(n, tag)
            tl.commit(spark, append.coalesce(2), tbl,
                      stats_cols=["k", "v"])
            dt, rep = t(lambda tb=tbl: tl.optimize(
                spark, tb, target_bytes=4 << 20))
            dt_noop, rep2 = t(lambda tb=tbl: tl.optimize(
                spark, tb, target_bytes=4 << 20))
            out[tag] = {
                "inc_opt_s": round(dt, 3),
                "rewrote": rep["n_input_files"],
                "carried": rep["n_clustered_carried"],
                "noop_s": round(dt_noop, 3),
                "noop_outputs": rep2["n_output_files"],
            }
            assert rep["n_clustered_carried"] >= 1, rep
            assert rep2["n_output_files"] == 0, rep2
        report["x161_incremental_optimize"] = out
        ratio = out["10x"]["inc_opt_s"] / max(out["1x"]["inc_opt_s"], 1e-9)
        report["x161_10x_time_ratio"] = round(ratio, 2)

        # ---- (2) X162 rebase cost is metadata-sized ----------------
        tbl = f"{root}/rebase"
        tl.commit(
            spark,
            spark.range(4_000_000).select(F.col("id").alias("k")),
            tbl,
        )
        dt_plain, _ = t(lambda: tl.delete_rows(
            spark, tbl, F.col("k") % 1000 == 0))
        # force a lost slot race: publish a blind append between the
        # vector write and the doc publish via the doc-writer seam
        orig = tl._write_log_doc_exclusive
        state = {"raced": False}

        def racy(s, table_, name, doc):
            if not state["raced"] and table_ == tbl and name.startswith("v"):
                state["raced"] = True
                tl._write_log_doc_exclusive = orig
                tl.commit(spark, spark.range(3).select(
                    (F.col("id") + 99_000_000).alias("k")), tbl)
                tl._write_log_doc_exclusive = racy
            return orig(s, table_, name, doc)

        tl._write_log_doc_exclusive = racy
        dt_raced, _ = t(lambda: tl.delete_rows(
            spark, tbl, F.col("k") % 997 == 0))
        tl._write_log_doc_exclusive = orig
        report["x162_delete_s"] = {
            "no_race": round(dt_plain, 3),
            "raced_rebase": round(dt_raced, 3),
            "rebase_overhead_s": round(dt_raced - dt_plain, 3),
        }

        # ---- (3) X163 widened-read overhead ------------------------
        wt = f"{root}/wide"
        nt = f"{root}/native"
        rows = spark.range(4_000_000).select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") % 997).cast("float").alias("v"),
        )
        tl.commit(spark, rows.repartition(16), wt)
        tl.commit(spark, spark.createDataFrame(
            [], "k bigint, v double"), wt, merge_schema=True)
        wide_rows = spark.range(4_000_000).select(
            F.col("id").alias("k"),
            (F.col("id") % 997).cast("double").alias("v"),
        )
        tl.commit(spark, wide_rows.repartition(16), nt)

        def agg(tb):
            return tl.read_version(spark, tb).agg(
                F.sum("k"), F.sum("v")).collect()

        agg(wt); agg(nt)  # warm
        dt_promoted, _ = t(lambda: agg(wt))
        dt_native, _ = t(lambda: agg(nt))
        report["x163_read_s"] = {
            "promoted_narrow_files": round(dt_promoted, 3),
            "native_wide_files": round(dt_native, 3),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
