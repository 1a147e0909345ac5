"""Property-based invariants of the TableOne output contract
(SURVEY §5.3), over randomized small tables via hypothesis:

  * per-variable percent columns sum to 1 (categorical rows);
  * per-strat counts sum to All_Patients on every categorical row;
  * Index is strictly increasing within the output;
  * output is invariant under input row order and partitioning.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tableone_pyspark_spark import tableone

CATS = ["Yes", "No", "a", "b c", "MISSING-like", "öx", None]
STRATS = ["s1", "s2", "Yes", None]

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(CATS),
        st.sampled_from(STRATS),
        st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False)),
    ),
    min_size=2,
    max_size=25,
)


def _build(spark, rows):
    return spark.createDataFrame(
        [(c, s, v) for c, s, v in rows], "cat string, strat string, val double"
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_percent_and_count_invariants(spark, rows):
    out = tableone(
        _build(spark, rows), col_to_strat="strat", cols_to_analyze=["cat", "val"]
    ).collect()
    strat_cols = [
        c for c in out[0].asDict()
        if not c.endswith("_%")
        and c not in ("Pivoted_column", "Index", "Characteristics", "Variable_type",
                      "Values", "All_Patients")
    ]
    cat_rows = [r for r in out if r["Variable_type"] == "category"]
    assert cat_rows, "categorical variable must emit rows"
    # percents per column sum to 1 over each variable's rows
    for col in ["All_Patients_%"] + [s + "_%" for s in strat_cols]:
        total = sum(r[col] for r in cat_rows if r[col] is not None)
        if any(r[col] is not None for r in cat_rows):
            assert math.isclose(total, 1.0, rel_tol=1e-9), (col, total)
    # strat counts sum to All_Patients row-wise
    for r in cat_rows:
        assert sum(r[s] or 0 for s in strat_cols) == r["All_Patients"]
    # Index strictly increasing (output assembled in order)
    idx = [r["Index"] for r in out]
    assert idx == sorted(idx) and len(set(idx)) == len(idx)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy, seed=st.integers(0, 2**31 - 1))
def test_row_order_and_partition_invariance(spark, rows, seed):
    import random

    df1 = _build(spark, rows)
    shuffled = list(rows)
    random.Random(seed).shuffle(shuffled)
    df2 = _build(spark, shuffled).repartition(7)
    a = tableone(df1, col_to_strat="strat", cols_to_analyze=["cat", "val"]).collect()
    b = tableone(df2, col_to_strat="strat", cols_to_analyze=["cat", "val"]).collect()
    ka = sorted(map(tuple, a))
    kb = sorted(map(tuple, b))
    assert len(ka) == len(kb)
    for ra, rb in zip(ka, kb):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                assert (math.isnan(va) and math.isnan(vb)) or math.isclose(
                    va, vb, rel_tol=1e-9
                ), (ra, rb)
            else:
                assert va == vb, (ra, rb)
