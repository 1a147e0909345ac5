#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB against the same parquet tables,
then compares row count, column names, and values (columns sorted by
name, rows sorted by all columns — order-insensitive, exact equality).

Usage: python scripts/check_oracles.py [query ...] [--sf DIR]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(r):
        return tuple(
            (v is None, "NaN" if isinstance(v, float) and math.isnan(v) else v)
            for v in r
        )

    return sorted((tuple(r[i] for i in order) for r in rows), key=key)


def cells_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--sf":
            sf_dir = sys.argv[1:][i + 1]
            args = [x for x in args if x != sf_dir]

    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .appName("oracle-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = e.queries()
    oracles = e.oracle_sql()
    names = args or sorted(qs)
    con = duck_connection(sf_dir)

    failures = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT A QUERY")
            failures += 1
            continue
        sdf = qs[name](spark, sf_dir)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name}: rows-only check — {len(s_rows)} rows, cols {s_cols}")
            if not s_rows:
                print(f"{name}: FAIL (0 rows)")
                failures += 1
            continue
        res = con.execute(oracles[name])
        d_cols = [d[0] for d in res.description]
        d_rows = [tuple(r) for r in res.fetchall()]

        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"row count: spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            ns, nd = normalize(s_rows, s_cols), normalize(d_rows, d_cols)
            n_bad = 0
            for ri, (ra, rb) in enumerate(zip(ns, nd)):
                for ci, (va, vb) in enumerate(zip(ra, rb)):
                    if not cells_equal(va, vb):
                        if n_bad < 5:
                            col = sorted(s_cols)[ci]
                            problems.append(f"row {ri} col {col}: spark={va!r} duck={vb!r}")
                        n_bad += 1
            if n_bad:
                problems.append(f"{n_bad} mismatched cells total")
        if problems:
            print(f"{name}: FAIL")
            for p in problems:
                print(f"    {p}")
            failures += 1
        else:
            print(f"{name}: OK ({len(s_rows)} rows × {len(s_cols)} cols)")

    print(f"\n{len(names) - failures}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
