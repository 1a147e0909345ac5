"""Command-line interface: compute a Table 1 from a parquet table.

Replaces the reference's broken ``__main__`` (it passed raw sys.argv
strings into the API — /root/reference/tableone_pyspark.py:532-533,
SURVEY Q3) with a real argument parser.

    python -m tableone_pyspark_spark INPUT.parquet \
        --cols age,name --strat plan --p-values --beautify \
        [--output OUT.parquet] [--master local[*]]

Without ``--output`` the table is printed, sorted by Index.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tableone_pyspark_spark",
        description="Descriptive-statistics Table 1 over a parquet table.",
    )
    p.add_argument("input", help="input parquet path")
    p.add_argument("--cols", required=True, help="comma-separated columns to analyze")
    p.add_argument("--strat", default="", help="stratification column")
    p.add_argument("--p-values", action="store_true", dest="p_values")
    p.add_argument("--beautify", action="store_true")
    p.add_argument(
        "--quantile-mode",
        choices=["data", "interpolated"],
        default="data",
        help="quartile semantics: actual data value (reference parity) "
        "or linear interpolation",
    )
    p.add_argument(
        "--weight",
        default="",
        help="frequency-weight column (survey-weighted Table 1)",
    )
    p.add_argument("--output", default="", help="write result parquet here instead of printing")
    p.add_argument("--master", default="local[*]")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    from tableone_pyspark_spark import TableOneConfig, tableone

    spark = (
        SparkSession.builder.master(args.master)
        .appName("tableone")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    try:
        df = spark.read.parquet(args.input)
        out = tableone(
            df,
            col_to_strat=args.strat,
            cols_to_analyze=[c.strip() for c in args.cols.split(",") if c.strip()],
            beautify=args.beautify,
            p_values=args.p_values,
            config=TableOneConfig(quantile_mode=args.quantile_mode),
            weight_col=args.weight or None,
        )
        if args.output:
            # the result is tiny — one file is the useful layout
            out.coalesce(1).write.mode("overwrite").parquet(args.output)
        else:
            out.orderBy("Index", "Values").show(1000, truncate=False)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
