#!/usr/bin/env python
"""r13 scale probes.

(1) X139 checkpoint docs at 1,000 versions: history(), a cold
    (sidecar-less) last_committed_batch, and a fresh stream's
    first-batch planning must be O(versions since checkpoint) with
    checkpoints and O(versions) without — measured by running each
    path twice, with the checkpoint lookup live and monkeypatched
    away. Version docs are published through the real _publish path
    (auto-checkpoint every CHECKPOINT_EVERY versions) with synthetic
    file lists pointing at one real parquet file — these are METADATA
    paths; no data file is ever opened.

(2) k_anonymity and select_representatives at 1x vs 10x rows
    (re-keyed ids so groups/clusters scale instead of collapsing).

Run: python scripts/scale_check_r13.py
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

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("scale_check_r13")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tableone_pyspark_spark.sources import tablelog as tl
    import tableone_pyspark_spark.sources.stream_source as ss

    # ---- (1) checkpoint probe at 1,000 versions -----------------------
    root = tempfile.mkdtemp(prefix="ck_probe_")
    tbl = f"{root}/t"
    try:
        seed = spark.range(3).select(F.col("id").alias("k"))
        tl.commit(spark, seed.coalesce(1), tbl)  # v0, real files
        f0 = tl._version_doc(spark, tbl, 0)["files"]
        schema_json = tl._version_doc(spark, tbl, 0)["schema"]
        n_versions = 1000
        t0 = time.time()
        for v in range(1, n_versions):
            sid = {}
            if v % 3 == 0:
                sid = {"stream_id": "probe-stream", "batch_id": v}
            tl._publish(spark, tbl, v, f0, "append", schema_json, **sid)
        publish_s = time.time() - t0
        cur = tl.current_version(spark, tbl)
        assert cur == n_versions - 1
        ck = tl.latest_checkpoint_version(spark, tbl)
        assert ck == 990, ck

        def no_ck():
            # hide checkpoints from BOTH modules' shared listings
            orig_tl, orig_ss = tl._log_maxima, ss._log_listing
            tl._log_maxima = lambda s, tb: (orig_tl(s, tb)[0], [])
            ss._log_listing = lambda tb: (orig_ss(tb)[0], [])
            return lambda: (
                setattr(tl, "_log_maxima", orig_tl),
                setattr(ss, "_log_listing", orig_ss),
            )

        results = {"n_versions": n_versions, "publish_s": round(publish_s, 2)}

        # history()
        fast_s, fast = t(lambda: tl.history(spark, tbl))
        restore = no_ck()
        slow_s, slow = t(lambda: tl.history(spark, tbl))
        restore()
        assert fast == slow and len(fast) == n_versions
        results["history_ck_s"] = round(fast_s, 3)
        results["history_nock_s"] = round(slow_s, 3)

        # cold last_committed_batch (no sidecar was ever written)
        fast_s, got1 = t(
            lambda: tl.last_committed_batch(spark, tbl, "probe-stream")
        )
        restore = no_ck()
        slow_s, got2 = t(
            lambda: tl.last_committed_batch(spark, tbl, "probe-stream")
        )
        restore()
        assert got1 == got2 == max(
            v for v in range(1, n_versions) if v % 3 == 0
        )
        results["watermark_ck_s"] = round(fast_s, 3)
        results["watermark_nock_s"] = round(slow_s, 3)

        # fresh stream first-batch planning (pyarrow-side doc walk)
        def plan():
            r = ss._TablelogStreamReader(tbl, False, False, None)
            return len(r.partitions({"version": -1}, {"version": cur}))

        fast_s, n1 = t(plan)
        restore = no_ck()
        slow_s, n2 = t(plan)
        restore()
        assert n1 == n2
        results["stream_plan_ck_s"] = round(fast_s, 3)
        results["stream_plan_nock_s"] = round(slow_s, 3)
        print("CHECKPOINT_PROBE " + json.dumps(results))
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # ---- (2) k_anonymity / select_representatives 1x vs 10x -----------
    from tableone_pyspark_spark.operators.dedup import select_representatives
    from tableone_pyspark_spark.operators.privacy import k_anonymity

    sf = "/root/testdata/sf0.1"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    o1 = orders.select(
        "o_orderkey", "o_orderstatus", "o_orderpriority",
        F.floor(F.col("o_totalprice") / 50000.0).alias("band"),
        "o_custkey",
    )
    # 10x with RE-KEYED ids so quasi groups scale, not collapse
    o10 = o1
    for i in range(1, 10):
        o10 = o10.unionByName(
            o1.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * 10_000_000)
            ).withColumn("band", F.col("band") + F.lit(i * 100))
        )
    for label, df in (("1x", o1), ("10x", o10)):
        el, out = t(
            lambda d=df: k_anonymity(
                d, ["o_orderstatus", "o_orderpriority", "band"],
                k=5, sensitive_col="o_custkey", l=3,
            ).count()
        )
        print(f"K_ANON {label}: {el:.2f}s groups={out}")

    # ---- (3) X140 change feed at 1x vs 10x: drain cost tracks the
    # CHANGE volume (files + vector positions of the range), never the
    # table size — delete 1%, drain only the delta ----------------------
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        F.monotonically_increasing_id().alias("rid"),
        "l_orderkey",
    )
    li10 = li
    for i in range(1, 10):
        li10 = li10.unionByName(
            li.withColumn("rid", F.col("rid") + F.lit(i * 10_000_000_000))
        )
    from tableone_pyspark_spark.sources.stream_source import (
        TablelogDataSource,
    )

    spark.dataSource.register(TablelogDataSource)
    for label, df in (("1x", li), ("10x", li10)):
        root2 = tempfile.mkdtemp(prefix=f"cdf_probe_{label}_")
        try:
            t2 = f"{root2}/t"
            tl.commit(spark, df, t2)
            sink = f"{root2}/sink"

            def drain(ckdir):
                q = (
                    spark.readStream.format("tablelog")
                    .option("read_changes", "true").load(t2)
                    .writeStream.format("parquet").option("path", sink)
                    .option("checkpointLocation", f"{root2}/{ckdir}")
                    .trigger(availableNow=True).start()
                )
                q.awaitTermination()

            drain("ck")  # initial snapshot drained; offsets at v0
            el, _ = t(
                lambda: tl.delete_rows(
                    spark, t2, F.col("rid") % 100 == 7
                )
            )
            el2, _ = t(lambda: drain("ck"))  # ONLY the delta drains
            print(
                f"CDF_FEED {label}: delete {el:.2f}s, "
                f"delta-drain {el2:.2f}s"
            )
        finally:
            shutil.rmtree(root2, ignore_errors=True)

    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    d10 = docs
    for i in range(1, 10):
        d10 = d10.unionByName(
            docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * 1_000_000)
            )
        )
    for label, df in (("1x", docs), ("10x", d10)):
        members = df.where(F.col("doc_id") % 7 < 3)
        clusters = members.select(
            F.col("doc_id").alias("id"),
            F.min("doc_id")
            .over(Window.partitionBy(F.col("doc_id") % 4000))
            .alias("cluster_id"),
        )
        el, out = t(
            lambda d=df, c=clusters: select_representatives(
                d, c, "doc_id", score_col="n_chars"
            ).count()
        )
        print(f"CLUSTER_REPS {label}: {el:.2f}s reps={out}")

    spark.stop()


if __name__ == "__main__":
    main()
