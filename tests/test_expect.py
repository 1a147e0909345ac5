"""Declarative constraint suite (operators/expect.py): metric values
against hand-computed fractions, Deequ-split null semantics, vacuous
empty-table passes, the one-pass plan pin, and validation errors."""

from __future__ import annotations

import pytest

from tableone_pyspark_spark.operators import expect as E


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        # id, email, status, score
        (1, "a@x.com", "ok", 10.0),
        (2, "b@y.org", "ok", 55.0),
        (3, None, "bad", 120.0),
        (4, "not-an-email", "ok", None),
        (5, "c@z.net", "weird", 30.0),
        (5, "d@w.io", "ok", 40.0),  # duplicate id
    ]
    return spark.createDataFrame(
        rows, "id long, email string, status string, score double"
    )


def _by_name(res):
    return {r["constraint"]: r for r in res.collect()}


def test_metrics_and_pass_fail(frame):
    res = E.validate(
        frame,
        [
            E.completeness("email", min_ratio=0.8),
            E.completeness("score", min_ratio=0.9),
            E.in_range("score", lo=0, hi=100, min_ratio=0.8),
            E.matches("email", r"^[^@]+@[^@]+\.[a-z]+$", min_ratio=0.7),
            E.isin("status", ["ok", "bad"], min_ratio=0.9),
            E.satisfies("id < 10 AND score IS NOT NULL", "scored_ids", 0.5),
            E.distinctness("id", min_ratio=1.0),
            E.primary_key("id"),
            E.row_count(min_rows=3, max_rows=10),
        ],
    )
    r = _by_name(res)
    # completeness over ALL rows
    assert r["completeness(email)"]["metric"] == pytest.approx(5 / 6)
    assert r["completeness(email)"]["passed"]
    assert r["completeness(score)"]["metric"] == pytest.approx(5 / 6)
    assert not r["completeness(score)"]["passed"]  # 0.833 < 0.9
    # value constraints over NON-NULL values only
    assert r["in_range(score)"]["metric"] == pytest.approx(4 / 5)
    assert r["in_range(score)"]["passed"]
    assert r["matches(email)"]["metric"] == pytest.approx(4 / 5)
    assert r["matches(email)"]["passed"]
    assert r["isin(status)"]["metric"] == pytest.approx(5 / 6)  # non-null = 6
    assert not r["isin(status)"]["passed"]
    # satisfies over ALL rows (NULL predicate = violation)
    assert r["satisfies(scored_ids)"]["metric"] == pytest.approx(5 / 6)
    assert r["satisfies(scored_ids)"]["passed"]
    # distinct id values 1,2,3,4,5 over 6 non-null
    assert r["distinctness(id)"]["metric"] == pytest.approx(5 / 6)
    assert not r["distinctness(id)"]["passed"]
    assert r["primary_key(id)"]["metric"] == pytest.approx(5 / 6)
    assert not r["primary_key(id)"]["passed"]
    assert r["row_count"]["metric"] == 6.0
    assert r["row_count"]["passed"]
    # declaration order preserved
    assert [x["constraint"] for x in res.collect()][0] == "completeness(email)"


def test_primary_key_null_and_composite(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "k long, s string"
    )
    r = _by_name(E.validate(df, [E.primary_key("k", "s")]))
    # the (2, NULL) tuple is skipped by count-distinct → 2/3
    assert r["primary_key(k, s)"]["metric"] == pytest.approx(2 / 3)
    assert not r["primary_key(k, s)"]["passed"]
    ok = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    assert _by_name(E.validate(ok, [E.primary_key("k", "s")]))[
        "primary_key(k, s)"
    ]["passed"]


def test_empty_table_vacuous_but_row_count_fails(spark):
    df = spark.createDataFrame([], "id long, v double")
    r = _by_name(
        E.validate(
            df,
            [
                E.completeness("v"),
                E.in_range("v", 0, 1),
                E.distinctness("id"),
                E.primary_key("id"),
                E.row_count(),
            ],
        )
    )
    for name in (
        "completeness(v)",
        "in_range(v)",
        "distinctness(id)",
        "primary_key(id)",
    ):
        assert r[name]["metric"] == 1.0 and r[name]["passed"], name
    assert r["row_count"]["metric"] == 0.0 and not r["row_count"]["passed"]
    # all-null column: value compliance is vacuous, completeness is 0
    dn = spark.createDataFrame([(None,), (None,)], "v double")
    r = _by_name(E.validate(dn, [E.completeness("v"), E.in_range("v", 0, 1)]))
    assert r["completeness(v)"]["metric"] == 0.0
    assert r["in_range(v)"]["metric"] == 1.0


def test_one_pass_plan(frame):
    cons = [
        E.completeness("email"),
        E.in_range("score", 0, 100),
        E.matches("email", "@"),
        E.satisfies("id > 0", "pos"),
        E.row_count(),
    ]
    plan = (
        E._agg_frame(frame, cons)._jdf.queryExecution().executedPlan().toString()
    )
    # no distinct constraint → one partial+final aggregate pair, no
    # Expand, no Join: N constraints never cost N scans
    assert "Join" not in plan and "Expand" not in plan
    assert plan.count("HashAggregate") == 2
    # exact-distinct constraints may add Spark's distinct-aggregate
    # machinery (an extra aggregate pair / Expand depending on the
    # planner) but never a join or a second scan
    plan2 = (
        E._agg_frame(frame, cons + [E.distinctness("id")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan2 and plan2.count("Scan") == 1
    # approx mode stays a plain two-phase aggregate (HLL sketches —
    # no distinct-value machinery at all)
    plan3 = (
        E._agg_frame(frame, cons + [E.distinctness("id", 0.9, approx=True)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan3 and plan3.count("HashAggregate") == 2


def test_approx_distinctness_and_pk(frame, spark):
    r = _by_name(
        E.validate(frame, [E.distinctness("id", min_ratio=0.7, approx=True)])
    )["distinctness(id)"]
    # HLL++ at default rsd is exact at this cardinality
    assert r["metric"] == pytest.approx(5 / 6, abs=0.05)
    # composite approx primary key: tuple-encoded HLL (the raw
    # two-positional call would pass the second column as rsd —
    # self-review r10), null tuples skipped like exact count-distinct
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (3, "c")], "k long, s string"
    )
    r = _by_name(E.validate(df, [E.primary_key("k", "s", min_ratio=0.9, approx=True)]))
    assert r["primary_key(k, s)"]["metric"] == pytest.approx(2 / 4, abs=0.05)
    assert not r["primary_key(k, s)"]["passed"]
    # approx with an exact-1.0 gate is rejected up front
    with pytest.raises(ValueError, match="min_ratio < 1.0"):
        E.distinctness("id", approx=True)
    with pytest.raises(ValueError, match="min_ratio < 1.0"):
        E.primary_key("k", approx=True)
    # metric stays in the fraction domain even if HLL overestimates
    big = spark.range(0, 20000).withColumnRenamed("id", "k")
    m = _by_name(E.validate(big, [E.distinctness("k", 0.9, approx=True)]))[
        "distinctness(k)"
    ]["metric"]
    assert m <= 1.0


def test_quoted_column_names(spark):
    df = spark.createDataFrame([(1, 5.0), (2, None)], "`user.id` long, `a``b` double")
    r = _by_name(
        E.validate(
            df,
            [
                E.completeness("user.id"),
                E.completeness("a`b", min_ratio=0.4),
                E.in_range("a`b", 0, 10),
                E.primary_key("user.id"),
            ],
        )
    )
    assert r["completeness(user.id)"]["metric"] == 1.0
    assert r["completeness(a`b)"]["metric"] == 0.5
    assert r["in_range(a`b)"]["passed"]
    assert r["primary_key(user.id)"]["passed"]


def test_row_count_max_bound_visible(frame):
    r = _by_name(E.validate(frame, [E.row_count(min_rows=1, max_rows=3)]))[
        "row_count"
    ]
    assert not r["passed"] and r["metric"] == 6.0
    assert r["column"] == "[1, 3]"  # the max bound is in the report


def test_validation_errors(frame):
    with pytest.raises(ValueError, match="at least one constraint"):
        E.validate(frame, [])
    with pytest.raises(ValueError, match="at least one bound"):
        E.in_range("score")
    with pytest.raises(ValueError, match="non-empty value set"):
        E.isin("status", [])
    with pytest.raises(ValueError, match="at least one column"):
        E.primary_key()


def test_referential_fk_report(spark):
    """X150: FK containment as a report row — NULL FKs pass (SQL
    semantics), duplicate dim keys never multiply the ratio, empty
    fact side is vacuously 1.0, validation raises on bad args."""
    import pytest

    from tableone_pyspark_spark.operators.expect import referential

    fact = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (None,)], "fk long"
    )
    dim = spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], "k long"  # dup key 1 on purpose
    )
    r = referential(fact, "fk", dim, "k").collect()[0]
    # 4 non-null FK rows, 3 matched (1,1,2); 9 orphaned; NULL passes
    assert r["metric"] == 0.75 and r["threshold"] == 1.0
    assert not r["passed"]
    assert r["constraint"] == "referential(fk -> k)"
    ok = referential(fact, "fk", dim, "k", min_ratio=0.7).collect()[0]
    assert ok["passed"]
    # empty / all-null fact: vacuous pass
    empty = spark.createDataFrame([(None,)], "fk long")
    assert referential(empty, "fk", dim, "k").collect()[0]["metric"] == 1.0
    with pytest.raises(ValueError, match="min_ratio"):
        referential(fact, "fk", dim, "k", min_ratio=2.0)
    with pytest.raises(ValueError, match="no column"):
        referential(fact, "nope", dim, "k")
