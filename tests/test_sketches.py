"""Persistable HLL distinct-count artifacts (operators/sketches.py):
merge-equals-rebuild associativity, parquet round-trip of the binary
sketch column, exact-count agreement on bounded cardinalities, and
the incremental-crawl composition."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tableone_pyspark_spark.operators import sketches as sk


def test_build_merge_estimate_roundtrip(spark, tmp_path):
    # two "days" of events over overlapping user sets
    day1 = spark.range(0, 3000).selectExpr("'d1' AS day", "id % 250 AS user")
    day2 = spark.range(0, 3000).selectExpr("'d2' AS day", "(id % 200) + 100 AS user")

    s1 = sk.build_distinct_sketches(day1, "user", ["day"])
    s2 = sk.build_distinct_sketches(day2, "user", ["day"])

    # artifacts persist as ordinary parquet (binary column)
    p = str(tmp_path / "sketches")
    s1.unionByName(s2).write.mode("overwrite").parquet(p)
    stored = spark.read.parquet(p)
    assert stored.count() == 2

    # per-day estimates exact at these cardinalities (250 and 200)
    per_day = {
        r["day"]: r["n_distinct"]
        for r in sk.distinct_estimates(stored, ["day"]).collect()
    }
    assert round(per_day["d1"]) == 250 and round(per_day["d2"]) == 200

    # merged estimate == distinct of the union (users 0..299 -> 300)
    merged = sk.merge_distinct_sketches(stored)
    est = sk.distinct_estimates(merged).collect()[0]["n_distinct"]
    assert round(est) == 300

    # merge-equals-rebuild: sketching the unioned raw data directly
    # gives the same estimate as merging the per-day artifacts
    rebuilt = sk.build_distinct_sketches(day1.unionByName(day2), "user")
    est2 = sk.distinct_estimates(rebuilt).collect()[0]["n_distinct"]
    assert est == est2


def test_merge_tolerates_mixed_precision(spark):
    a = sk.build_distinct_sketches(
        spark.range(0, 100).selectExpr("id AS k"), "k", lg_k=12
    )
    b = sk.build_distinct_sketches(
        spark.range(50, 150).selectExpr("id AS k"), "k", lg_k=14
    )
    est = sk.distinct_estimates(
        sk.merge_distinct_sketches(a.unionByName(b))
    ).collect()[0]["n_distinct"]
    assert round(est) == 150


def test_validation_and_plan(spark):
    df = spark.range(10).selectExpr("id AS k")
    with pytest.raises(ValueError, match="lg_k"):
        sk.build_distinct_sketches(df, "k", lg_k=99)
    # at most one shuffle, and the sketch agg runs map-side partial
    # first (the shape that keeps the shuffle artifact-sized)
    from tableone_pyspark_spark.plans import inspect

    plan = inspect.executed_plan(sk.build_distinct_sketches(df, "k", ["k"]))
    assert plan.count("Exchange") <= 1
    assert "partial_hll_sketch_agg" in plan


# ---- Count-Min sketch (X99) ------------------------------------------------


def _py_cms(rows, width, depth):
    """Independent pure-Python CMS twin on the same poly-hash family."""
    from tableone_pyspark_spark.operators.dedup import POLY_MOD, poly_coeffs

    def poly(s):
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % POLY_MOD
        return acc

    cms = [0] * (depth * width)
    cf = poly_coeffs(depth)
    for key, w in rows:
        h = poly(key)
        for d, (a, b) in enumerate(cf):
            cms[d * width + ((h * a + b) % POLY_MOD) % width] += w
    return cms


def test_cms_build_matches_python_twin(spark):
    from tableone_pyspark_spark.operators.sketches import build_cms

    rows = [(f"k{i % 7}", 1) for i in range(50)] + [("solo", 1)]
    df = spark.createDataFrame([(k,) for k, _ in rows], "key string")
    got = build_cms(df, "key", width=32, depth=3).collect()[0]
    assert (got["width"], got["depth"]) == (32, 3)
    assert list(got["cms"]) == _py_cms(rows, 32, 3)


def test_cms_estimate_one_sided_and_exact_when_wide(spark):
    from pyspark.sql import functions as F

    from tableone_pyspark_spark.operators.sketches import build_cms, cms_estimate

    df = spark.createDataFrame(
        [(f"k{i % 13}",) for i in range(400)], "key string"
    )
    true = {r["key"]: r["n"] for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    # narrow sketch: one-sided (est >= true)
    sk = build_cms(df, "key", width=4, depth=2)
    est = {r["key"]: r["est"] for r in cms_estimate(sk, df, "key").collect()}
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true)
    # wide sketch: 13 keys into 4096 slots -> every row collision-free
    wide = build_cms(df, "key", width=4096, depth=4)
    est_w = {r["key"]: r["est"] for r in cms_estimate(wide, df, "key").collect()}
    assert est_w == true


def test_cms_merge_equals_rebuild_and_rejects_mixed_geometry(spark):
    import pytest as _pytest

    from tableone_pyspark_spark.operators.sketches import build_cms, merge_cms

    a = spark.createDataFrame([(f"a{i % 5}",) for i in range(60)], "key string")
    b = spark.createDataFrame([(f"a{i % 9}",) for i in range(40)], "key string")
    merged = merge_cms(
        build_cms(a, "key", width=64, depth=3).union(
            build_cms(b, "key", width=64, depth=3)
        )
    ).collect()[0]
    rebuilt = build_cms(a.union(b), "key", width=64, depth=3).collect()[0]
    assert list(merged["cms"]) == list(rebuilt["cms"])
    with _pytest.raises(ValueError, match="mixed sketch geometries"):
        merge_cms(
            build_cms(a, "key", width=64, depth=3).union(
                build_cms(b, "key", width=32, depth=3)
            )
        ).collect()


def test_cms_weighted_equals_replicated_and_grouped(spark):
    from pyspark.sql import functions as F

    from tableone_pyspark_spark.operators.sketches import build_cms

    w = spark.createDataFrame(
        [("x", 3.0), ("y", 2.0), ("x", 1.0), ("z", 0.0), ("n", None),
         ("m", float("nan"))],
        "key string, w double",
    )
    # weight 0 / NULL rows drop; integer weights == row replication
    rep = spark.createDataFrame(
        [("x",)] * 4 + [("y",)] * 2, "key string"
    )
    # weight 0 / NULL / NaN rows drop; integer-valued weights == rows
    got_w = build_cms(w, "key", width=16, depth=2, weight_col="w").collect()[0]
    got_r = build_cms(rep, "key", width=16, depth=2).collect()[0]
    assert list(got_w["cms"]) == list(got_r["cms"])
    # a FRACTIONAL weight raises instead of truncating silently
    # (self-review r9: cast-to-long would have dropped 0.5 to 0)
    import pytest as _pytest
    from pyspark.errors import SparkRuntimeException

    frac = spark.createDataFrame([("x", 0.5)], "key string, w double")
    with _pytest.raises(SparkRuntimeException, match="fractional weight"):
        build_cms(frac, "key", width=16, depth=2, weight_col="w").collect()
    # grouped build: one artifact per group, group totals preserved
    g = spark.createDataFrame(
        [("g1", "a"), ("g1", "a"), ("g2", "b")], "grp string, key string"
    )
    rows = {r["grp"]: r for r in build_cms(g, "key", width=8, depth=2, group_cols=["grp"]).collect()}
    assert sum(rows["g1"]["cms"]) == 2 * 2  # 2 rows x depth increments
    assert sum(rows["g2"]["cms"]) == 1 * 2


def test_cms_artifact_parquet_round_trip(spark, tmp_path):
    from tableone_pyspark_spark.operators.sketches import (
        build_cms,
        cms_estimate,
        merge_cms,
    )

    df = spark.createDataFrame([(f"k{i % 6}",) for i in range(90)], "key string")
    path = str(tmp_path / "cms")
    build_cms(df, "key", width=64, depth=3).write.parquet(path)
    back = spark.read.parquet(path)
    merged = merge_cms(back.union(back))
    est = {r["key"]: r["est"] for r in cms_estimate(merged, df, "key").collect()}
    assert est == {f"k{i}": 30 for i in range(6)}
    # explicit geometry skips the probe (no extra lineage execution on
    # a composed un-persisted build — self-review r9) and must agree
    merged2 = merge_cms(back.union(back), width=64, depth=3)
    est2 = {
        r["key"]: r["est"]
        for r in cms_estimate(merged2, df, "key", width=64, depth=3).collect()
    }
    assert est2 == est


def test_cms_validation(spark):
    import pytest as _pytest

    from tableone_pyspark_spark.operators.sketches import build_cms

    df = spark.createDataFrame([("k",)], "key string")
    with _pytest.raises(ValueError, match="width"):
        build_cms(df, "key", width=1)
    with _pytest.raises(ValueError, match="depth"):
        build_cms(df, "key", depth=0)


def test_cms_plans_broadcast_and_bounded_exchange(spark):
    """Scale-shape pins for the r10-graded CMS pipeline: the estimate
    join BROADCASTS the artifact side (never a SortMergeJoin on the
    key frame), and the build is one hash-partitioned exchange of
    partial slot counts — no global sort, no window."""
    from pyspark.sql import functions as F

    from tableone_pyspark_spark.operators.sketches import (
        build_cms,
        cms_estimate,
    )

    df = spark.createDataFrame(
        [(i % 37, f"g{i % 3}") for i in range(500)], "k long, g string"
    )
    sk = build_cms(df, "k", width=64, depth=3, group_cols=["g"])
    bplan = sk._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in bplan and "SortMergeJoin" not in bplan
    est = cms_estimate(
        sk, df.select("g", "k"), "k", group_cols=["g"], width=64, depth=3
    )
    eplan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in eplan or "BroadcastExchange" in eplan
    assert "SortMergeJoin" not in eplan


def test_heavy_hitters_batch_exact(spark):
    """Batch φ-heavy-hitters: exact counts vs a Python Counter, the
    1/φ output bound, grouped form, and the broadcast-totals plan."""
    import collections

    from tableone_pyspark_spark.operators.sketches import heavy_hitters

    keys = ["a"] * 50 + ["b"] * 30 + [f"c{i}" for i in range(20)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {r["key"]: (r["ct"], r["total"]) for r in
           heavy_hitters(df, "k", phi=0.2).collect()}
    true = collections.Counter(keys)
    want = {k: (c, 100) for k, c in true.items() if c >= 0.2 * 100}
    assert got == want
    assert len(got) <= 5  # 1/phi bound
    # grouped: thresholds apply per group
    gdf = spark.createDataFrame(
        [("g1", "x")] * 9 + [("g1", "y")] + [("g2", "x")] * 2 + [("g2", "z")] * 8,
        "g string, k string",
    )
    grows = {(r["g"], r["key"]): r["ct"] for r in
             heavy_hitters(gdf, "k", phi=0.5, group_cols=["g"]).collect()}
    assert grows == {("g1", "x"): 9, ("g2", "z"): 8}
    plan = heavy_hitters(df, "k", phi=0.2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Window" not in plan and "SortMergeJoin" not in plan
    import pytest as _pytest

    with _pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, "k", phi=0.0)


def test_heavy_hitters_boundary_and_null_group(spark):
    """Self-review r10: (a) a key at EXACTLY φ×total must be included
    — 0.2×110 rounds up in doubles, so the threshold compares in
    integers via the decimal rational of φ; (b) a NULL group is a
    group like any other (eqNullSafe join, not a silent drop)."""
    from tableone_pyspark_spark.operators.sketches import heavy_hitters

    keys = ["hot"] * 22 + [f"u{i}" for i in range(88)]  # 22/110 = 0.2
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {r["key"] for r in heavy_hitters(df, "k", phi=0.2).collect()}
    assert got == {"hot"}  # the exact-boundary key survives

    gdf = spark.createDataFrame(
        [(None, "hot")] * 9 + [(None, "x")] + [("g", "y")] * 2,
        "g string, k string",
    )
    rows = {
        (r["g"], r["key"]): (r["ct"], r["total"])
        for r in heavy_hitters(gdf, "k", phi=0.5, group_cols=["g"]).collect()
    }
    assert rows == {(None, "hot"): (9, 10), ("g", "y"): (2, 2)}
