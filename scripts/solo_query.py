#!/usr/bin/env python
"""Solo-attribution timer (BASELINE.md protocol): ONE driver-contract
query in a fresh session at sf0.1 / local[32], bench.py's exact warm-up
(table footers + Arrow worker spin-up), then N timed runs. Prints the
run list and the median of the runs AFTER the first (the first run
additionally pays any first-build artifacts suite ordering amortizes).

Usage: python scripts/solo_query.py QUERY [--runs N] [--sf DIR]
"""
from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    name = sys.argv[1]
    runs = 4
    sf_dir = "/root/testdata/sf0.1"
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]

    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName(f"solo-{name}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from tableone_pyspark_spark.sources.testdata import load_table

    for tbl in ("lineitem", "orders", "customer", "nation", "region",
                "part", "supplier", "events", "documents", "embeddings"):
        if (Path(sf_dir) / f"{tbl}.parquet").exists():
            load_table(spark, sf_dir, tbl).limit(1).collect()
    _warm = F.pandas_udf(lambda s: s * 2, "double")
    spark.range(32).select(_warm(F.col("id").cast("double"))).collect()

    q = e.queries()[name]
    reps = []
    for _ in range(runs):
        t0 = time.perf_counter()
        q(spark, sf_dir).collect()
        reps.append(round(time.perf_counter() - t0, 2))
    med = statistics.median(reps[1:]) if len(reps) > 1 else reps[0]
    print(f"SOLO {name}: runs={reps} median_after_first={med:.2f}s")


if __name__ == "__main__":
    main()
