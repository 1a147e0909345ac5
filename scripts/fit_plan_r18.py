#!/usr/bin/env python
"""Dump the price_cuts exact-percentile FIT plans (r18 evidence).

The fit runs eagerly while the query is constructed, so it never
appears in the returned frame's explain (plans/r18/price_cuts_*.txt).
This script captures both shapes over the real lineitem column:

  - price_cuts_fit_before.txt: the pre-r18 sort-based ``F.percentile``
    aggregation — partial percentile -> Exchange SinglePartition ->
    final percentile (every distinct value merges in ONE task);
  - price_cuts_fit_after.txt: exact_percentiles_dist's final
    rank-extraction aggregation (via stats._RANK_PLAN_HOOK) — the
    distributed range-bucketed prefix-sum shape.

Usage: python scripts/fit_plan_r18.py [--sf DIR]
"""
from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tableone_pyspark_spark.operators import stats
    from tableone_pyspark_spark.sources.testdata import load_table

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("fit-plans-r18")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = ROOT / "plans" / "r18"
    out_dir.mkdir(parents=True, exist_ok=True)

    li = load_table(spark, sf_dir, "lineitem")
    probs = [i / 8 for i in range(1, 8)]
    x = F.col("l_extendedprice").cast("double")

    # BEFORE: the pre-r18 single-reducer sort-based percentile agg
    before = li.where(x.isNotNull() & ~F.isnan(x)).agg(
        F.percentile(x, F.array(*[F.lit(p) for p in probs])).alias("c")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        before.explain("formatted")
    (out_dir / "price_cuts_fit_before.txt").write_text(buf.getvalue())

    # AFTER: capture the distributed rank-extraction plan via the hook
    captured: list = []
    stats._RANK_PLAN_HOOK = captured.append
    try:
        got = stats.fit_quantile_cuts(
            li, "l_extendedprice", n_buckets=8, exact=True
        )
    finally:
        stats._RANK_PLAN_HOOK = None
    want = [float(v) for v in before.first()["c"]]
    assert got == want, (got, want)
    buf = io.StringIO()
    with redirect_stdout(buf):
        captured[0].explain("formatted")
    (out_dir / "price_cuts_fit_after.txt").write_text(buf.getvalue())
    print("wrote price_cuts_fit_{before,after}.txt; octiles bit-equal:", got == want)


if __name__ == "__main__":
    main()
