"""t-digest sketch artifacts (operators/tdigest.py).

Verdict strategy (the X97 HLL class — engine-specific bytes, pinned
contract): exact equality in the small-data singleton regime (the
digest IS the sorted data there), rank-error bounds against exact
sorted data at sketch scale under multiple partitionings, merge ≈
rebuild within the same bound, parquet round-trip of the artifact
rows, and the pure-python reference unit-tested directly."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from tableone_pyspark_spark.operators.tdigest import (
    _td_merge,
    _td_quantile,
    build_tdigest,
    merge_tdigests,
    tdigest_quantiles,
)


def _rank_error(values: np.ndarray, q: float, est: float) -> float:
    """|true rank of est − q·n| / n over the exact sorted data."""
    n = len(values)
    s = np.sort(values)
    lo = np.searchsorted(s, est, side="left")
    hi = np.searchsorted(s, est, side="right")
    target = q * n
    if lo <= target <= hi:
        return 0.0
    return min(abs(lo - target), abs(hi - target)) / n


def test_python_reference_unit():
    # under the bound every point stays a singleton: digest == sorted
    v = np.array([5.0, 1.0, 3.0, 2.0, 4.0])
    m, w = _td_merge(v, np.ones_like(v), delta=100)
    assert list(m) == [1.0, 2.0, 3.0, 4.0, 5.0]
    assert list(w) == [1.0] * 5
    # exact quantiles in the singleton regime (midpoint interpolation)
    assert _td_quantile(m, w, 0.5) == 3.0
    assert _td_quantile(m, w, 0.0) == 1.0
    assert _td_quantile(m, w, 1.0) == 5.0
    # weight conservation + compression at scale
    big = np.random.default_rng(7).normal(size=20_000)
    m, w = _td_merge(big, np.ones_like(big), delta=100)
    assert w.sum() == pytest.approx(20_000.0)
    assert len(m) < 400  # ~O(delta) centroids
    assert list(m) == sorted(m)


def test_small_groups_exact_any_partitioning(spark):
    rows = [(g, float(v)) for g in ("a", "b") for v in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, v double")
    for parts in (1, 7):
        sk = build_tdigest(df.repartition(parts), "v", ["g"])
        got = {r["g"]: r for r in sk.collect()}
        for g in ("a", "b"):
            # singleton regime: the sketch is exactly the sorted data,
            # identical under ANY partitioning
            assert got[g]["means"] == [float(x) for x in range(1, 21)]
            assert got[g]["total"] == 20.0
        qv = {
            (r["g"], r["q"]): r["value"]
            for r in tdigest_quantiles(sk, [0.5], ["g"]).collect()
        }
        assert qv[("a", 0.5)] == pytest.approx(10.5)


def test_rank_error_bound_at_scale(spark):
    rng = np.random.default_rng(11)
    mix = np.concatenate(
        [rng.normal(0, 1, 6000), rng.lognormal(1, 1, 3000), rng.uniform(-50, 50, 1000)]
    )
    df = spark.createDataFrame(
        [(int(i % 3), float(v)) for i, v in enumerate(mix)], "g int, v double"
    )
    sk = build_tdigest(df.repartition(8), "v", ["g"], delta=100)
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    est = {
        (r["g"], r["q"]): r["value"]
        for r in tdigest_quantiles(sk, qs, ["g"]).collect()
    }
    for g in range(3):
        vals = mix[np.arange(len(mix)) % 3 == g]
        for q in qs:
            err = _rank_error(vals, q, est[(g, q)])
            # t-digest contract: tails near-exact, middle within ~1/delta
            bound = 0.005 if q in (0.01, 0.99) else 0.02
            assert err <= bound, (g, q, err)
        # NULL handling: the same group with nulls added is unchanged
    withnull = df.union(
        spark.createDataFrame([(0, None), (1, None)], "g int, v double")
    )
    sk2 = build_tdigest(withnull, "v", ["g"])
    t1 = {r["g"]: r["total"] for r in sk.collect()}
    t2 = {r["g"]: r["total"] for r in sk2.collect()}
    assert t1 == t2


def test_merge_matches_rebuild_contract(spark):
    rng = np.random.default_rng(13)
    day1 = rng.normal(10, 3, 4000)
    day2 = rng.normal(20, 5, 4000)
    mk = lambda arr: spark.createDataFrame(
        [("k", float(v)) for v in arr], "g string, v double"
    )
    sk1 = build_tdigest(mk(day1), "v", ["g"])
    sk2 = build_tdigest(mk(day2), "v", ["g"])
    merged = merge_tdigests(sk1.union(sk2), ["g"])
    allv = np.concatenate([day1, day2])
    qs = [0.05, 0.5, 0.95]
    got = {
        r["q"]: r["value"]
        for r in tdigest_quantiles(merged, qs, ["g"]).collect()
    }
    for q in qs:
        assert _rank_error(allv, q, got[q]) <= 0.02, q
    assert merged.collect()[0]["total"] == pytest.approx(8000.0)


def test_artifact_parquet_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(500)], "g string, v double"
    )
    sk = build_tdigest(df, "v", ["g"])
    p = str(tmp_path / "sketch")
    sk.write.parquet(p)
    back = spark.read.parquet(p)
    a = tdigest_quantiles(back, [0.5], ["g"]).collect()[0]["value"]
    b = tdigest_quantiles(sk, [0.5], ["g"]).collect()[0]["value"]
    assert a == b


def test_small_delta_multi_batch_accumulation(spark):
    """Force many Arrow batches through one partition: the partial
    kernel must accumulate across batches (one digest per partition x
    group, recompressing past 8-delta) and stay within the error
    contract."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        vals = np.random.default_rng(17).normal(size=2000)
        df = spark.createDataFrame(
            [("k", float(v)) for v in vals], "g string, v double"
        ).coalesce(1)
        sk = build_tdigest(df, "v", ["g"], delta=10)
        row = sk.collect()[0]
        assert row["total"] == pytest.approx(2000.0)
        assert row["delta"] == 10
        assert len(row["means"]) < 120  # O(delta), not O(batches)
        est = tdigest_quantiles(sk, [0.5], ["g"]).collect()[0]["value"]
        assert _rank_error(vals, 0.5, est) <= 0.1  # delta=10 is coarse
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_mixed_delta_merge_raises(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(100)], "g string, v double"
    )
    s1 = build_tdigest(df, "v", ["g"], delta=50)
    s2 = build_tdigest(df, "v", ["g"], delta=100)
    with pytest.raises(Exception, match="mixed deltas"):
        merge_tdigests(s1.union(s2), ["g"]).collect()


def test_validation(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="delta"):
        build_tdigest(df, "v", ["g"], delta=5)
    with pytest.raises(ValueError, match="group_cols"):
        build_tdigest(df, "v", [])
    with pytest.raises(ValueError, match="collide"):
        build_tdigest(
            spark.createDataFrame([(1.0, 2.0)], "means double, v double"),
            "v",
            ["means"],
        )
    sk = build_tdigest(df, "v", ["g"])
    with pytest.raises(ValueError, match="fractions"):
        tdigest_quantiles(sk, [1.5], ["g"])
    with pytest.raises(ValueError, match="fractions"):
        tdigest_quantiles(sk, [], ["g"])
    with pytest.raises(ValueError, match="empty centroid"):
        _td_quantile(np.array([]), np.array([]), 0.5)
