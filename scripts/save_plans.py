#!/usr/bin/env python
"""Save .explain("formatted") output for driver-contract queries to
plans/<tag>/<query>_<suffix>.txt (the optimization-round evidence
artifact: judge checks plan claims against these files).

Usage: python scripts/save_plans.py TAG SUFFIX [query ...]
       (default: every queries() entry; sf0.001 — plan SHAPE does not
       depend on scale factor, and staged harness rows run fastest
       there)
"""

from __future__ import annotations

import io
import sys
import traceback
from contextlib import redirect_stdout
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName(f"plans-{tag}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    names = names or sorted(qs)
    out_dir = ROOT / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    failed = []
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name!r}")
            failed.append(name)
            continue
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
            print(f"ok {name}")
        except Exception:
            print(f"FAIL {name}")
            traceback.print_exc()
            failed.append(name)
    spark.stop()
    print(f"saved {len(names) - len(failed)}/{len(names)} to {out_dir}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
