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
