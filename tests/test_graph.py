"""PageRank (operators/graph.py): pinned against an exact python
power-iteration twin (same formula, same iteration count), mass
conservation, dangling/disconnected handling, multigraph multiplicity,
early stopping, and validation."""

from __future__ import annotations

import pytest

from tableone_pyspark_spark.operators.graph import pagerank

# a web-ish digraph: hub (1), authority (2), a dangling page (4),
# a self-loop (5), a duplicate edge 1->2 (multiplicity 2), and an
# isolated pair 6<->7 disconnected from the rest
EDGES = [
    (1, 2), (1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (5, 5),
    (6, 7), (7, 6), (2, 4), (5, 2),
]


def _twin(edges, damping, n_iter):
    verts = sorted({v for e in edges for v in e})
    n = len(verts)
    out: dict[int, list[int]] = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    r = {v: 1.0 / n for v in verts}
    for _ in range(n_iter):
        dang = sum(r[v] for v in verts if v not in out)
        c = {v: 0.0 for v in verts}
        for s, ts in out.items():
            w = r[s] / len(ts)
            for t in ts:
                c[t] += w
        r = {
            v: (1.0 - damping) / n + damping * (c[v] + dang / n)
            for v in verts
        }
    return r


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_matches_python_twin(edge_df):
    got = {r["id"]: r["rank"] for r in pagerank(edge_df, n_iter=8).collect()}
    want = _twin(EDGES, 0.85, 8)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    # mass conservation: exact up to float-sum noise
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    # structure sanity: the authority (2, linked by 1 twice + 5)
    # outranks the dangling leaf's sources' average, and the isolated
    # 6<->7 pair splits its own mass evenly
    assert got[6] == pytest.approx(got[7], abs=1e-12)


def test_multiplicity_counts(spark):
    # 1->2 twice + 1->3 once: 2 gets 2/3 of 1's mass, not 1/2
    df = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 3)], "src long, dst long"
    )
    got = {r["id"]: r["rank"] for r in pagerank(df, n_iter=1).collect()}
    want = _twin([(1, 2), (1, 2), (1, 3)], 0.85, 1)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert got[2] > got[3]


def test_dangling_and_damping(spark):
    # one edge into a dangling sink: with damping d over 2 vertices,
    # mass still sums to 1 every iteration
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    for d in (0.5, 0.85):
        got = {r["id"]: r["rank"] for r in pagerank(df, damping=d, n_iter=12).collect()}
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
        want = _twin([(1, 2)], d, 12)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9)
        assert got[2] > got[1]  # the sink accumulates


def test_early_stop_tolerance(edge_df):
    # tol large enough to stop after the first delta check must agree
    # with the 1-iteration fixed run (stop happens AFTER iteration 1)
    full = {r["id"]: r["rank"] for r in pagerank(edge_df, n_iter=1).collect()}
    tolled = {
        r["id"]: r["rank"]
        for r in pagerank(edge_df, n_iter=50, tol=10.0).collect()
    }
    for v in full:
        assert tolled[v] == pytest.approx(full[v], abs=1e-12)
    # a tight tol converges to (numerically) the same point as many
    # fixed iterations
    # (the 40-iteration cap leaves ~0.85^40 residual ≈ 2e-6/vertex)
    a = {r["id"]: r["rank"] for r in pagerank(edge_df, n_iter=40, tol=1e-8).collect()}
    b = _twin(EDGES, 0.85, 120)
    for v in b:
        assert a[v] == pytest.approx(b[v], abs=1e-5)


def test_edge_frame_not_reshuffled_per_iteration(spark):
    """The scale claim pagerank rests on: a repartition('s')-ed CACHED
    frame keeps HashPartitioning(s) through a join (only the other
    side gets an ENSURE_REQUIREMENTS exchange), while a localCheckpoint
    erases it — so the edge list must be persisted, not checkpointed
    (probed and pinned; self-review r10)."""
    import pyspark.sql.functions as F

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        we = spark.range(100).withColumnRenamed("id", "s").repartition("s").persist()
        we.count()
        r = spark.range(20).select(F.col("id").alias("s"), F.lit(1.0).alias("rank"))
        j = we.join(r, "s").groupBy("s").count()
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        # every requirements exchange hashes the RANK side's join key;
        # the cached edge side is never re-exchanged (its only
        # exchange is the REPARTITION_BY_COL inside the cache build)
        import re

        m = re.search(r"SortMergeJoin \[(s#\d+L?)\], \[(s#\d+L?)\]", plan)
        assert m, plan
        left_key, right_key = m.groups()
        ensures = [
            ln for ln in plan.split("\n") if "ENSURE_REQUIREMENTS" in ln
        ]
        assert ensures, plan
        assert all(
            right_key in ln and left_key not in ln for ln in ensures
        ), plan
        assert "InMemoryTableScan" in plan  # the cache is actually read
        # the checkpoint counter-example: partitioning is erased
        ck = spark.range(100).withColumnRenamed("id", "s").repartition("s").localCheckpoint()
        part = ck._jdf.queryExecution().executedPlan().outputPartitioning().toString()
        assert "Unknown" in part
        we.unpersist()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_validation(spark, edge_df):
    with pytest.raises(ValueError, match="damping"):
        pagerank(edge_df, damping=1.0)
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(edge_df, n_iter=0)
    with pytest.raises(ValueError, match="tol"):
        pagerank(edge_df, tol=0.0)
    with pytest.raises(ValueError, match="NULL edge"):
        pagerank(
            spark.createDataFrame([(1, None)], "src long, dst long")
        )
    with pytest.raises(ValueError, match="empty edge list"):
        pagerank(spark.createDataFrame([], "src long, dst long"))
