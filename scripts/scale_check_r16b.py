#!/usr/bin/env python
"""r16b scale probe — X158 identity allocation.

The two-pass partition-offset zipWithIndex must scale linearly with
the CHANGE size (one localCheckpoint + one per-partition count + one
arrow mapInPandas), with no single-task funnel: wall at 10x rows must
be well under 10x (task parallelism holds), and the allocation must
be exactly the dense range at both sizes.

Run: python scripts/scale_check_r16b.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


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
        .appName("scale_check_r16b")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tableone_pyspark_spark.sources import tablelog as tl

    report: dict = {}
    root = tempfile.mkdtemp(prefix="scale_r16b_")
    for scale, n in (("1x", 400_000), ("10x", 4_000_000)):
        t = f"{root}/t_{scale}"
        tl.commit(
            spark, spark.createDataFrame([], "id bigint, v string"), t
        )
        tl.set_identity(spark, t, "id")
        df = spark.range(n).select(
            F.concat(F.lit("v"), F.col("id") % 1000).alias("v")
        ).repartition(32)
        t0 = time.time()
        tl.commit(spark, df, t)
        report[f"identity_commit_{scale}_s"] = round(time.time() - t0, 3)
        chk = tl.read_version(spark, t).agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("id").alias("nd"),
            F.min("id").alias("mn"),
            F.max("id").alias("mx"),
        ).first()
        assert (chk["n"], chk["nd"], chk["mn"], chk["mx"]) == (n, n, 1, n), chk
        # baseline: the same commit WITHOUT identity (write cost only)
        t2 = f"{root}/b_{scale}"
        t0 = time.time()
        tl.commit(spark, df, t2)
        report[f"plain_commit_{scale}_s"] = round(time.time() - t0, 3)
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
