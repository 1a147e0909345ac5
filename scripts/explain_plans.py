#!/usr/bin/env python
"""Print the formatted physical plans of the headline operators — the
explain-and-iterate loop's artifact. Run after any operator change and
eyeball: pruned ReadSchema, partial aggregation before each Exchange,
broadcast on dimension sides only, no NestedLoop where an equi-join is
expected, no repartition(1).

Usage: python scripts/explain_plans.py [query ...]   (default: a core set)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT = [
    "tableone_strat",
    "cat_counts",
    "embedding_neardup",
    "range_join_ship",
    "dedup_clusters",
    "revenue_by_nation",
]


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    names = sys.argv[1:] or DEFAULT
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name!r}")
            continue
        print(f"\n{'=' * 72}\n{name}\n{'=' * 72}")
        qs[name](spark, "/root/testdata/sf0.001").explain("formatted")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
