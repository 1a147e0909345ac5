"""Tests for operators/relational.py — as-of join, sessionization,
top-k window, cube."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tableone_pyspark_spark.operators import relational as rel

MIN = 60 * 1_000_000_000  # ns


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # (event_id, user_id, event_type, ts_ns)
        (1, 1, "click", 100 * MIN),
        (2, 1, "purchase", 105 * MIN),   # prior click = 100
        (3, 1, "click", 110 * MIN),
        (4, 1, "purchase", 110 * MIN),   # same-ts click matches (>=)
        (5, 1, "purchase", 111 * MIN),   # prior click = 110
        (6, 2, "purchase", 50 * MIN),    # user 2 never clicked → null
        (7, 3, "click", 10 * MIN),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_ns long"
    )


def test_asof_prior_event(events):
    out = {r["event_id"]: r for r in rel.asof_prior_event(events).collect()}
    assert set(out) == {2, 4, 5, 6}
    assert out[2]["prior_ts_ns"] == 100 * MIN and out[2]["gap_ns"] == 5 * MIN
    assert out[4]["prior_ts_ns"] == 110 * MIN and out[4]["gap_ns"] == 0
    assert out[5]["prior_ts_ns"] == 110 * MIN
    assert out[6]["prior_ts_ns"] is None and out[6]["gap_ns"] is None


def test_asof_tie_holds_for_any_type_pair(spark):
    """Equal-ts right events must match regardless of how the type names
    sort lexicographically (explicit priority, not raw event_type
    ordering — 'view' sorts AFTER 'click' yet must still be seen)."""
    rows = [
        (1, 1, "view", 100 * MIN),
        (2, 1, "click", 100 * MIN),  # same-ts view must match (>= semantics)
        (3, 1, "click", 105 * MIN),  # prior view = 100
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_ns long"
    )
    out = {
        r["event_id"]: r
        for r in rel.asof_prior_event(df, left_type="click", right_type="view").collect()
    }
    assert out[2]["prior_ts_ns"] == 100 * MIN and out[2]["gap_ns"] == 0
    assert out[3]["prior_ts_ns"] == 100 * MIN


def test_sessionize(spark):
    rows = [
        (1, 1, 0 * MIN), (2, 1, 10 * MIN), (3, 1, 20 * MIN),   # session 1 (gaps 10m)
        (4, 1, 60 * MIN),                                        # session 2 (gap 40m)
        (5, 2, 0 * MIN),                                         # user 2: one session
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_ns long")
    out = {r["user_id"]: r for r in rel.sessionize(df, gap_minutes=30).collect()}
    assert out[1]["n_sessions"] == 2
    assert out[1]["n_events"] == 4
    assert out[1]["max_session_events"] == 3
    assert out[2]["n_sessions"] == 1


def test_top_orders_per_group(spark):
    rows = [
        (1, "HIGH", 300.0), (2, "HIGH", 200.0), (3, "HIGH", 100.0), (4, "HIGH", 50.0),
        (5, "LOW", 10.0), (6, "LOW", 10.0),  # tie → orderkey breaks it
    ]
    df = spark.createDataFrame(rows, "o_orderkey long, o_orderpriority string, o_totalprice double")
    out = rel.top_orders_per_group(df, k=2).collect()
    got = {(r["o_orderpriority"], r["rank"]): r["o_orderkey"] for r in out}
    assert got[("HIGH", 1)] == 1 and got[("HIGH", 2)] == 2
    assert got[("LOW", 1)] == 5 and got[("LOW", 2)] == 6
    assert len(out) == 4


def test_sales_cube_subtotals(spark):
    rows = [("A", "F", 1.0), ("A", "O", 2.0), ("R", "F", 3.0)]
    df = spark.createDataFrame(rows, "l_returnflag string, l_linestatus string, l_quantity double")
    df = df.withColumn("l_extendedprice", df["l_quantity"] * 10)
    out = rel.sales_cube(df).collect()
    cells = {(r["l_returnflag"], r["l_linestatus"]): r["n"] for r in out}
    assert cells[(None, None)] == 3          # grand total
    assert cells[("A", None)] == 2           # per-flag subtotal
    assert cells[(None, "F")] == 2           # per-status subtotal
    assert cells[("A", "F")] == 1
    assert len(out) == 3 + 2 + 2 + 1  # detail cells + flag + status + grand


def test_bucketed_range_join_is_equi_join(spark):
    """The bucketed range join must plan as a hash/sort-merge EQUI join
    on the cell id — never a BroadcastNestedLoopJoin."""
    from tableone_pyspark_spark.operators.relational import bucketed_range_join

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    od = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    epoch = F.to_date(F.lit("1970-01-01"))
    points = li.select(F.datediff("l_shipdate", epoch).alias("d"))
    iv = od.where(F.col("o_custkey") < 5).select(
        "o_orderkey",
        F.datediff("o_orderdate", epoch).alias("s"),
        (F.datediff("o_orderdate", epoch) + 7).alias("e"),
    )
    out = bucketed_range_join(points, iv, "d", "s", "e", bucket=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "Join" in plan

    # correctness vs the naive theta join
    naive = points.crossJoin(iv).where(F.col("d").between(F.col("s"), F.col("e")))
    assert sorted(map(tuple, out.select("d", "o_orderkey").collect())) == sorted(
        map(tuple, naive.select("d", "o_orderkey").collect())
    )


def test_event_funnel_ordering_and_horizon(spark):
    rows = [
        # u1 completes view->click->purchase in order
        (1, "view", "2024-01-01 00:00:00"),
        (1, "click", "2024-01-01 01:00:00"),
        (1, "purchase", "2024-01-01 02:00:00"),
        # u2 clicks BEFORE viewing -> stops at view
        (2, "click", "2024-01-01 00:00:00"),
        (2, "view", "2024-01-01 01:00:00"),
        # u3 converts but outside the horizon
        (3, "view", "2024-01-01 00:00:00"),
        (3, "click", "2024-01-05 00:00:00"),
        # u4 never views -> not in the funnel at all
        (4, "purchase", "2024-01-01 00:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts string")
    from tableone_pyspark_spark.operators.relational import event_funnel

    out = {r["step_name"]: r for r in event_funnel(
        ev, ["view", "click", "purchase"], horizon_hours=24
    ).collect()}
    assert out["view"]["n_users"] == 3
    assert out["click"]["n_users"] == 1          # only u1 (u3 outside horizon)
    assert out["purchase"]["n_users"] == 1
    assert out["view"]["conv_from_prev"] is None
    assert abs(out["click"]["conv_from_first"] - 1 / 3) < 5e-7


def test_retention_cohorts_triangle(spark):
    from tableone_pyspark_spark.operators.relational import retention_cohorts

    rows = [
        # cohort week of Jan 1: u1 active weeks 0,1; u2 week 0 only
        (1, "2024-01-01 10:00:00"), (1, "2024-01-08 10:00:00"),
        (2, "2024-01-02 10:00:00"),
        # cohort week of Jan 8: u3 active weeks 0 and 2
        (3, "2024-01-10 10:00:00"), (3, "2024-01-22 10:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string")
    out = {(str(r["cohort_week"]), r["week_offset"]): r
           for r in retention_cohorts(ev).collect()}
    assert out[("2024-01-01", 0)]["n_active"] == 2
    assert out[("2024-01-01", 1)]["n_active"] == 1
    assert out[("2024-01-01", 1)]["retention"] == 0.5
    assert out[("2024-01-08", 0)]["n_active"] == 1
    assert out[("2024-01-08", 2)]["retention"] == 1.0
    assert ("2024-01-08", 1) not in out  # no activity -> no row


def test_event_funnel_dead_step_yields_null_conversions(spark):
    """A step matching zero events must produce n_users=0 with NULL
    conversion ratios (ADVICE r3: not engine-dependent 0/0)."""
    from tableone_pyspark_spark.operators.relational import event_funnel

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = {
        r["step_name"]: r
        for r in event_funnel(
            ev, steps=["view", "no_such_type", "click"]
        ).collect()
    }
    dead = rows["no_such_type"]
    assert dead["n_users"] == 0
    assert dead["conv_from_first"] is not None  # first step is alive
    after = rows["click"]
    assert after["n_users"] == 0
    assert after["conv_from_prev"] is None  # 0/0 -> NULL, both engines


def test_asof_join_directions(spark):
    """General asof_join (X121): differential vs a python merge_asof
    twin for backward/forward/nearest with and without tolerance,
    by-keys, equal-on inclusivity, deterministic tie_col, and the
    one-shuffle union-and-scan plan (no range join)."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from tableone_pyspark_spark.operators.relational import asof_join

    trades = [  # (sym, t, qty)
        ("A", 10.0, 1), ("A", 15.0, 2), ("A", 15.0, 3), ("A", 30.0, 4),
        ("B", 5.0, 5), ("B", 100.0, 6),
        ("C", 7.0, 7),  # no quotes at all for C
    ]
    quotes = [  # (sym, t, px, qid)
        ("A", 8.0, 1.0, 1), ("A", 15.0, 2.0, 2), ("A", 15.0, 2.5, 3),
        ("A", 20.0, 3.0, 4),
        ("B", 50.0, 9.0, 5),
    ]
    lt = spark.createDataFrame(trades, "sym string, t double, qty long")
    rt = spark.createDataFrame(quotes, "sym string, t double, px double, qid long")

    def twin(direction, tol):
        out = {}
        for sym, t, qty in trades:
            cands = [(qt, px, qid) for s, qt, px, qid in quotes if s == sym]
            back = [c for c in cands if c[0] <= t]
            fwd = [c for c in cands if c[0] >= t]
            # tie_col qid: greatest wins among equal on
            back = max(back, key=lambda c: (c[0], c[2]), default=None)
            fwd = min(fwd, key=lambda c: (c[0], -c[2]), default=None)
            if direction == "backward":
                m = back
            elif direction == "forward":
                m = fwd
            else:
                if back and fwd:
                    m = back if (t - back[0]) <= (fwd[0] - t) else fwd
                else:
                    m = back or fwd
            if m is not None and tol is not None and abs(m[0] - t) > tol:
                m = None
            out[qty] = None if m is None else (m[1], m[0] - t)
        return out

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 4.0):
            got = {
                r["qty"]: (
                    None
                    if r["px_r"] is None
                    else (r["px_r"], r["asof_gap"])
                )
                for r in asof_join(
                    lt, rt, "t", by=["sym"], direction=direction,
                    tolerance=tol, tie_col="qid",
                ).collect()
            }
            want = twin(direction, tol)
            assert got == want, (direction, tol)

    # equal-on inclusivity both ways: trade at 15 matches quote at 15
    # (qid 3 wins the tie by tie_col) in BOTH directions
    for direction in ("backward", "forward"):
        got = {
            r["qty"]: r["px_r"]
            for r in asof_join(
                lt, rt, "t", by=["sym"], direction=direction, tie_col="qid"
            ).collect()
        }
        assert got[2] == 2.5 and got[3] == 2.5, direction

    # plan: union-and-scan — no range/nested-loop join, no join at all
    plan = (
        asof_join(lt, rt, "t", by=["sym"], tie_col="qid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "Window" in plan and "Union" in plan

    # validation
    with _pytest.raises(ValueError, match="direction"):
        asof_join(lt, rt, "t", direction="sideways")
    with _pytest.raises(ValueError, match="tolerance"):
        asof_join(lt, rt, "t", tolerance=-1)
    with _pytest.raises(ValueError, match="collide"):
        asof_join(lt.withColumn("px_r", F.lit(1)), rt, "t")
    # ADVICE r10: a right column literally named __on/__tie would
    # duplicate the payload struct's internal fields — rejected
    with _pytest.raises(ValueError, match="__on/__tie"):
        asof_join(lt, rt.withColumn("__on", F.lit(1)), "t")
    with _pytest.raises(ValueError, match="__on/__tie"):
        asof_join(lt, rt.withColumn("__tie", F.lit(1)), "t")
    # ADVICE r10: a DECIMAL on-column no longer falls through to the
    # quantizing double cast — it raises with the cast advice
    ldec = lt.withColumn("t", F.col("t").cast("decimal(20,4)"))
    with _pytest.raises(ValueError, match="decimal"):
        asof_join(ldec, rt.withColumn("t", F.col("t").cast("decimal(20,4)")), "t")


def test_asof_join_null_on_and_ns_precision(spark):
    """Self-review r10: NULL-`on` rights never match / NULL-`on` lefts
    survive with NULL match; nanosecond-epoch longs keep exact
    ordering (a double cast would quantize above 2^53 into false
    ties); asof_gap name collision rejected."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from tableone_pyspark_spark.operators.relational import asof_join

    base = 1_760_000_000_000_000_000  # ns epoch, far above 2^53
    lt = spark.createDataFrame(
        [(1, base + 100), (2, base + 300), (3, None)],
        "lid long, t long",
    )
    rt = spark.createDataFrame(
        [(base + 99, 1.0), (base + 101, 2.0), (base + 299, 3.0), (None, 9.9)],
        "t long, px double",
    )
    got = {
        r["lid"]: (r["px_r"], r["asof_gap"])
        for r in asof_join(lt, rt, "t", direction="backward").collect()
    }
    # exact long arithmetic: 100 matches 99 (gap -1), NOT the 101 row
    # a 256-ns-quantized double would conflate
    assert got[1] == (1.0, -1)
    assert got[2] == (3.0, -1)
    assert got[3] == (None, None)  # NULL-on left survives, matchless
    with _pytest.raises(ValueError, match="collide"):
        asof_join(lt.withColumn("asof_gap", F.lit(0)), rt, "t")
