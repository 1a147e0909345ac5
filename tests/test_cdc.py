"""Batch CDC apply + SCD2 history (operators/cdc.py): a hand-built
scenario with a python-dict twin, latest-change-wins with ts ties
raising, delete/upsert/new-key paths, idempotence, SCD2 interval
integrity invariants, and the out-of-order guard."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tableone_pyspark_spark.operators.cdc import apply_cdc, scd2_apply

BASE = [
    (1, "alice", 100.0),
    (2, "bob", 200.0),
    (3, "carol", 300.0),
]
CHANGES = [
    # key, name, balance, ts, op
    (2, "bob2", 250.0, 10, "U"),     # superseded by ts 20
    (2, "bob3", 260.0, 20, "u"),     # lowercase op accepted
    (3, None, None, 15, "D"),        # delete
    (4, "dave", 400.0, 12, "I"),     # brand-new key
    (5, "erin", 500.0, 11, "I"),     # new then deleted later
    (5, None, None, 19, "D"),
]


@pytest.fixture()
def frames(spark):
    base = spark.createDataFrame(BASE, "id long, name string, balance double")
    ch = spark.createDataFrame(
        CHANGES, "id long, name string, balance double, ts long, op string"
    )
    return base, ch


def test_apply_cdc_matches_twin(frames):
    base, ch = frames
    got = {
        r["id"]: (r["name"], r["balance"])
        for r in apply_cdc(base, ch, ["id"]).collect()
    }
    # python twin
    snap = {k: (n, b) for k, n, b in BASE}
    latest = {}
    for k, n, b, ts, op in CHANGES:
        if k not in latest or ts > latest[k][0]:
            latest[k] = (ts, op.upper(), n, b)
    for k, (_, op, n, b) in latest.items():
        if op == "D":
            snap.pop(k, None)
        else:
            snap[k] = (n, b)
    assert got == snap
    assert got == {
        1: ("alice", 100.0),
        2: ("bob3", 260.0),
        4: ("dave", 400.0),
    }
    # idempotence: applying the same batch to the result changes nothing
    nxt = apply_cdc(
        apply_cdc(base, ch, ["id"]), ch, ["id"]
    )
    assert {
        r["id"]: (r["name"], r["balance"]) for r in nxt.collect()
    } == got


def test_ambiguous_and_unknown_ops_raise(frames, spark):
    base, _ = frames
    amb = spark.createDataFrame(
        [(2, "x", 1.0, 20, "U"), (2, "y", 2.0, 20, "U")],
        "id long, name string, balance double, ts long, op string",
    )
    with pytest.raises(Exception, match="ambiguous batch"):
        apply_cdc(base, amb, ["id"]).collect()
    bad = spark.createDataFrame(
        [(2, "x", 1.0, 20, "Z")],
        "id long, name string, balance double, ts long, op string",
    )
    with pytest.raises(Exception, match="unknown op"):
        apply_cdc(base, bad, ["id"]).collect()
    with pytest.raises(ValueError, match="keys must be non-empty"):
        apply_cdc(base, bad, [])
    with pytest.raises(ValueError, match="missing base columns"):
        apply_cdc(base, bad.drop("balance"), ["id"])


def test_scd2_intervals(frames, spark):
    base, ch = frames
    # seed history: every base row current since ts 0
    hist = base.select(
        "*",
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    out = scd2_apply(hist, ch, ["id"], "ts", "op").collect()
    rows = {(r["id"], r["valid_from"]): r for r in out}
    assert len(out) == len(rows)  # no duplicate (key, valid_from)
    # untouched key 1: still one open row
    assert rows[(1, 0)]["is_current"] and rows[(1, 0)]["valid_to"] is None
    # key 2: closed at 20, new current from 20 with bob3
    assert not rows[(2, 0)]["is_current"] and rows[(2, 0)]["valid_to"] == 20
    assert rows[(2, 20)]["is_current"] and rows[(2, 20)]["name"] == "bob3"
    # key 3 deleted: closed at 15, no successor
    assert not rows[(3, 0)]["is_current"] and rows[(3, 0)]["valid_to"] == 15
    assert not any(k == 3 and vf != 0 for k, vf in rows)
    # new key 4: one open row from 12
    assert rows[(4, 12)]["is_current"] and rows[(4, 12)]["valid_to"] is None
    # key 5 (insert then delete in ONE batch): latest op D wins — the
    # key never existed in history and stays absent
    assert not any(k == 5 for k, _ in rows)
    # global invariants: exactly one current row per live key; closed
    # rows have valid_to >= valid_from
    by_key = {}
    for (k, vf), r in rows.items():
        by_key.setdefault(k, []).append(r)
        if r["valid_to"] is not None:
            assert r["valid_to"] >= r["valid_from"]
    for k, rs in by_key.items():
        assert sum(1 for r in rs if r["is_current"]) <= 1, k

    # out-of-order: a change older than the current valid_from raises
    hist2 = base.select(
        "*",
        F.lit(100).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    with pytest.raises(Exception, match="replay batches in order"):
        scd2_apply(hist2, ch, ["id"], "ts", "op").collect()
    with pytest.raises(ValueError, match="missing column"):
        scd2_apply(base, ch, ["id"], "ts", "op")
    # a straggler for a DELETED key (no current row) must also raise —
    # the edge guard covers the whole history, not just current rows
    # (self-review r10)
    deleted = spark.createDataFrame(
        [(7, "gone", 0.0, 0, 50, False)],
        "id long, name string, balance double, "
        "valid_from long, valid_to long, is_current boolean",
    )
    late = spark.createDataFrame(
        [(7, "back", 1.0, 10, "I")],
        "id long, name string, balance double, ts long, op string",
    )
    with pytest.raises(Exception, match="replay batches in order"):
        scd2_apply(deleted, late, ["id"], "ts", "op").collect()
    # and a re-insert AT/after the edge is legal: one new current row
    ok = spark.createDataFrame(
        [(7, "back", 1.0, 60, "I")],
        "id long, name string, balance double, ts long, op string",
    )
    out2 = scd2_apply(deleted, ok, ["id"], "ts", "op").collect()
    cur7 = [r for r in out2 if r["is_current"]]
    assert len(out2) == 2 and len(cur7) == 1 and cur7[0]["valid_from"] == 60
    # NULL is_current rows pass through as closed history, not dropped
    nullflag = spark.createDataFrame(
        [(8, "odd", 0.0, 0, None, None)],
        "id long, name string, balance double, "
        "valid_from long, valid_to long, is_current boolean",
    )
    out3 = scd2_apply(nullflag, ok, ["id"], "ts", "op").collect()
    assert any(r["id"] == 8 for r in out3)


def test_null_ts_raises(frames, spark):
    base, _ = frames
    nts = spark.createDataFrame(
        [(2, "x", 1.0, None, "U")],
        "id long, name string, balance double, ts long, op string",
    )
    with pytest.raises(Exception, match="NULL ts"):
        apply_cdc(base, nts, ["id"]).collect()


def test_snapshot_diff_round_trip(spark):
    """snapshot_diff is apply_cdc's inverse: applying the derived
    batch to old reproduces new exactly — with I, U (incl. NULL-safe
    value changes), D and untouched rows all present."""
    from tableone_pyspark_spark.operators.cdc import apply_cdc, snapshot_diff

    old = spark.createDataFrame(
        [
            (1, "a", 10.0),       # unchanged
            (2, "b", 20.0),       # value change -> U
            (3, None, 30.0),      # NULL -> value -> U
            (4, "d", 40.0),       # deleted
            (5, "e", None),       # NULL attr unchanged -> no row
        ],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 21.0),
            (3, "c", 30.0),
            (5, "e", None),
            (6, "f", 60.0),       # inserted
        ],
        "k long, s string, v double",
    )
    d = snapshot_diff(old, new, ["k"], ts=7)
    ops = {r["k"]: r["op"] for r in d.collect()}
    assert ops == {2: "U", 3: "U", 4: "D", 6: "I"}
    assert all(r["ts"] == 7 for r in d.collect())
    # D rows are tombstones of the OLD values
    drow = d.where("k = 4").first()
    assert (drow["s"], drow["v"]) == ("d", 40.0)
    # round trip
    applied = apply_cdc(old, d, ["k"], ts_col="ts", op_col="op")
    assert sorted(map(tuple, applied.collect())) == sorted(
        map(tuple, new.collect())
    )
    # identical snapshots -> empty batch
    assert snapshot_diff(old, old, ["k"], ts=8).count() == 0


def test_snapshot_diff_guards(spark):
    from pyspark.sql import functions as F

    from tableone_pyspark_spark.operators.cdc import snapshot_diff

    a = spark.createDataFrame([(1, "x")], "k long, s string")
    with pytest.raises(ValueError, match="keys must be non-empty"):
        snapshot_diff(a, a, [], ts=1)
    with pytest.raises(ValueError, match="differ in columns"):
        snapshot_diff(a, a.withColumnRenamed("s", "t"), ["k"], ts=1)
    with pytest.raises(ValueError, match="ts_col/op_col"):
        snapshot_diff(
            a.withColumn("op", F.lit("x")),
            a.withColumn("op", F.lit("x")),
            ["k"],
            ts=1,
        )
    # NULL keys raise mid-plan on EITHER side
    nk = spark.createDataFrame([(None, "x")], "k long, s string")
    from pyspark.errors import SparkRuntimeException

    with pytest.raises(SparkRuntimeException, match="NULL key"):
        snapshot_diff(nk, a, ["k"], ts=1).collect()
    with pytest.raises(SparkRuntimeException, match="NULL key"):
        snapshot_diff(a, nk, ["k"], ts=1).collect()


def test_snapshot_diff_internal_name_guard(spark):
    """Cross-batch review r11: snapshot columns colliding with the
    internal markers raise plainly instead of an ambiguous-reference
    AnalysisException (the asof __on/__tie convention)."""
    a = spark.createDataFrame([(1, "x")], "k long, __in_o string")
    from tableone_pyspark_spark.operators.cdc import snapshot_diff

    with pytest.raises(ValueError, match="internal"):
        snapshot_diff(a, a, ["k"], ts=1)
    b = spark.createDataFrame([(1, "x")], "k long, __o_s string")
    with pytest.raises(ValueError, match="internal"):
        snapshot_diff(b, b, ["k"], ts=1)


def test_snapshot_diff_round_trip_randomized(spark):
    """X123 randomized differential: 8 seeded random snapshot pairs
    (NULL attrs, disjoint/overlapping key sets, value flips) — the
    apply_cdc(old, snapshot_diff(old, new)) ≡ new identity must hold
    on every one, and the diff must contain NO row for unchanged
    keys (minimality)."""
    import random

    from tableone_pyspark_spark.operators.cdc import apply_cdc, snapshot_diff

    for seed in range(8):
        rng = random.Random(seed)
        keys_old = rng.sample(range(20), rng.randint(1, 12))

        def rows(ks, rng):
            return [
                (
                    k,
                    rng.choice(["a", "b", None]),
                    rng.choice([1.0, 2.0, None]),
                )
                for k in ks
            ]

        keys_new = rng.sample(range(20), rng.randint(1, 12))
        old = spark.createDataFrame(
            rows(keys_old, rng), "k long, s string, v double"
        )
        new = spark.createDataFrame(
            rows(keys_new, rng), "k long, s string, v double"
        )
        d = snapshot_diff(old, new, ["k"], ts=seed)
        got = sorted(map(tuple, apply_cdc(old, d, ["k"]).collect()))
        want = sorted(map(tuple, new.collect()))
        assert got == want, f"seed {seed}"
        # minimality: unchanged keys emit nothing
        om = {r["k"]: (r["s"], r["v"]) for r in old.collect()}
        nm = {r["k"]: (r["s"], r["v"]) for r in new.collect()}
        unchanged = {k for k in om.keys() & nm.keys() if om[k] == nm[k]}
        diff_keys = {r["k"] for r in d.collect()}
        assert not (unchanged & diff_keys), f"seed {seed}"


def test_snapshot_diff_plan_reuses_key_exchange(spark):
    """Plan pin (r11 audit): the per-side dup-guard window partitions
    on the GATED key attributes, so the full-outer join reuses each
    side's shuffle — exactly 2 key exchanges, not 4."""
    from pyspark.sql import functions as F

    from tableone_pyspark_spark.operators.cdc import snapshot_diff

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    n = o.where(F.col("o_orderkey") % 2 == 0)
    plan = (
        snapshot_diff(o, n, ["o_orderkey"], ts=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("Window") == 2
