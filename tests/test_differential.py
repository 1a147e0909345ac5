"""Differential test: our engine vs. the reference implementation run
side-by-side on the canonical fixture (output-contract parity).

The reference module imports scipy at module level; scipy is not
installed here, so a minimal stub is injected — sufficient because the
differential runs use p_values=False (the scipy-free paths). p-value
parity is covered analytically in test_engine_unit/test_special.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import pytest

from tableone_pyspark_spark import tableone

from conftest import approx

REFERENCE = "/root/reference/tableone_pyspark.py"


@pytest.fixture(scope="session")
def reference_mod(spark):
    if "scipy" not in sys.modules:
        import importlib.machinery

        scipy = types.ModuleType("scipy")
        stats = types.ModuleType("scipy.stats")
        # pyspark.testing probes importlib.util.find_spec("scipy")
        scipy.__spec__ = importlib.machinery.ModuleSpec("scipy", None)
        stats.__spec__ = importlib.machinery.ModuleSpec("scipy.stats", None)

        def _unavailable(*_a, **_k):  # pragma: no cover
            raise RuntimeError("scipy stub: p-value paths not exercised here")

        stats.ttest_ind = _unavailable
        stats.f_oneway = _unavailable
        stats.chi2_contingency = _unavailable
        scipy.stats = stats
        sys.modules["scipy"] = scipy
        sys.modules["scipy.stats"] = stats
    spec = importlib.util.spec_from_file_location("reference_tableone", REFERENCE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # the reference is Spark-2.x-era code: its pandas-NaN Variable_type
    # forces a string↔double union cast that ANSI mode (Spark 4 default)
    # rejects; run it under legacy cast semantics
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    yield mod
    spark.conf.set("spark.sql.ansi.enabled", prev)


def _normalize(df):
    """Collected rows keyed by (Index, Values) with float-cast counts."""
    out = {}
    for r in df.collect():
        d = r.asDict()
        key = (round(float(d["Index"]), 9), d["Values"])
        # Q12: the reference's total row carries pandas-NaN Variable_type
        # (stringified to "NaN" by the legacy union cast); ours uses null
        if d.get("Variable_type") == "NaN":
            d["Variable_type"] = None
        out[key] = {
            k: (float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else v)
            for k, v in d.items()
            if k not in ("Index", "Values")
        }
    return out


@pytest.mark.parametrize("strat", ["", "plan"])
def test_parity_with_reference(spark, patients, reference_mod, strat):
    ours = tableone(
        patients, col_to_strat=strat, cols_to_analyze=["name", "region", "age"]
    )
    theirs = reference_mod.tableone_pyspark(
        patients,
        spark,
        col_to_strat=strat,
        cols_to_analyze_list=["name", "region", "age"],
        beautify=False,
        p_values=False,
    )
    assert ours.columns == theirs.columns
    a, b = _normalize(ours), _normalize(theirs)
    assert a.keys() == b.keys()
    for key in a:
        for col in a[key]:
            assert approx(a[key][col], b[key][col], tol=1e-9), (key, col, a[key][col], b[key][col])


def test_parity_beautify(spark, patients, reference_mod):
    ours = tableone(
        patients, col_to_strat="plan", cols_to_analyze=["name", "age"], beautify=True
    )
    theirs = reference_mod.tableone_pyspark(
        patients, spark, col_to_strat="plan",
        cols_to_analyze_list=["name", "age"], beautify=True, p_values=False,
    )
    assert ours.columns == theirs.columns
    ra = sorted(
        ((round(float(r["Index"]), 9), r["Values"], r["Characteristics"]) for r in ours.collect())
    )
    rb = sorted(
        ((round(float(r["Index"]), 9), r["Values"], r["Characteristics"]) for r in theirs.collect())
    )
    assert ra == rb
