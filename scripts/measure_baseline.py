#!/usr/bin/env python
"""Measure the reference implementation's wall-clock (BASELINE.md B1-B3)
and our engine on the identical workloads, on this machine.

The reference needs scipy; this environment has none, so a minimal
functional substitute built on numpy + our tail-probability module is
injected (identical math, same call signatures).

Usage: python scripts/measure_baseline.py [--sf DIR] [--runs N]
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import json
import statistics
import sys
import time
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from tableone_pyspark_spark.core import special


def install_scipy_substitute() -> None:
    if "scipy" in sys.modules:
        return
    scipy = types.ModuleType("scipy")
    stats = types.ModuleType("scipy.stats")
    scipy.__spec__ = importlib.machinery.ModuleSpec("scipy", None)
    stats.__spec__ = importlib.machinery.ModuleSpec("scipy.stats", None)

    def ttest_ind(a, b):
        a, b = np.asarray(a, dtype=float), np.asarray(b, dtype=float)
        n1, n2 = len(a), len(b)
        v1, v2 = a.var(ddof=1), b.var(ddof=1)
        dof = n1 + n2 - 2
        sp2 = ((n1 - 1) * v1 + (n2 - 1) * v2) / dof
        t = (a.mean() - b.mean()) / np.sqrt(sp2 * (1 / n1 + 1 / n2))
        return t, special.t_sf_two_sided(float(t), dof)

    def f_oneway(*groups):
        gs = [np.asarray(g, dtype=float) for g in groups]
        k = len(gs)
        n = sum(len(g) for g in gs)
        grand = sum(g.sum() for g in gs) / n
        ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in gs)
        ssw = sum(((g - g.mean()) ** 2).sum() for g in gs)
        f = (ssb / (k - 1)) / (ssw / (n - k))
        return f, special.f_sf(float(f), k - 1, n - k)

    def chi2_contingency(table):
        obs = np.asarray(table, dtype=float)
        row = obs.sum(axis=1, keepdims=True)
        col = obs.sum(axis=0, keepdims=True)
        total = obs.sum()
        exp = row @ col / total
        d = np.abs(obs - exp)
        if obs.shape == (2, 2):  # Yates
            d = np.maximum(d - 0.5, 0.0)
        stat = float((d * d / exp).sum())
        dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
        return stat, special.chi2_sf(stat, dof), dof, exp

    stats.ttest_ind = ttest_ind
    stats.f_oneway = f_oneway
    stats.chi2_contingency = chi2_contingency
    scipy.stats = stats
    sys.modules["scipy"] = scipy
    sys.modules["scipy.stats"] = stats


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    argv = sys.argv[1:]
    if "--sf" in argv:
        sf_dir = argv[argv.index("--sf") + 1]
    if "--runs" in argv:
        runs = int(argv[argv.index("--runs") + 1])

    install_scipy_substitute()
    spec = importlib.util.spec_from_file_location(
        "reference_tableone", "/root/reference/tableone_pyspark.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from pyspark.sql import SparkSession

    from tableone_pyspark_spark import TableOneConfig, tableone

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.ansi.enabled", "false")  # reference needs legacy casts
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("baseline")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"]
    workloads = {
        "B1": dict(col_to_strat="", p_values=False, beautify=False),
        "B2": dict(col_to_strat="l_returnflag", p_values=False, beautify=False),
        "B3": dict(col_to_strat="l_returnflag", p_values=True, beautify=True),
    }

    def run_ref(kw):
        strat = kw["col_to_strat"]
        # the reference crashes when the strat column is also analyzed
        # (duplicate select → ambiguous reference); exclude it, same as
        # its own canonical invocation (testing.py:28-29)
        acols = [c for c in cols if c != strat] if strat else cols
        ref.tableone_pyspark(li, spark, cols_to_analyze_list=acols, **kw).collect()

    def run_ours(kw):
        strat = kw["col_to_strat"]
        acols = [c for c in cols if c != strat] if strat else cols
        tableone(
            li,
            col_to_strat=strat,
            cols_to_analyze=acols,
            beautify=kw["beautify"],
            p_values=kw["p_values"],
        ).collect()

    results: dict[str, dict] = {}
    for name, kw in workloads.items():
        for label, fn in (("reference", run_ref), ("ours", run_ours)):
            fn(kw)  # warm-up
            times = []
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(kw)
                times.append(time.perf_counter() - t0)
            results.setdefault(name, {})[label] = round(statistics.median(times), 3)
        r = results[name]
        r["speedup"] = round(r["reference"] / r["ours"], 2)
        print(json.dumps({name: r}))

    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
