"""Tests for operators/similarity.py — cosine math, exact top-k,
LSH recall, near-dup pairs."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from tableone_pyspark_spark.operators import similarity as sim

from conftest import approx

VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
    (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
    (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
    (4, [0.7, 0.7, 0.0, 0.0]),   # 45° from 0
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def test_cosine_expression(vecs):
    df = vecs.where("vec_id in (0, 4)")
    a = df.where("vec_id = 0").select(F.col("embedding").alias("a"))
    b = df.where("vec_id = 4").select(F.col("embedding").alias("b"))
    r = a.crossJoin(b).select(sim.cosine(F.col("a"), F.col("b")).alias("c")).collect()[0]
    assert approx(r["c"], math.cos(math.pi / 4), tol=1e-6)


def test_brute_force_topk_ordering(vecs):
    out = sim.brute_force_topk(vecs, vecs.where("vec_id = 0"), k=4).collect()
    order = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order == [1, 4, 2, 3]  # by descending cosine to e1
    cos = {r["neighbor_id"]: r["cos"] for r in out}
    assert approx(cos[2], 0.0)
    assert approx(cos[3], -1.0)


def test_neardup_pairs(vecs):
    pairs = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in sim.cosine_neardup_pairs(vecs, threshold=0.9).collect()
    }
    assert (0, 1) in pairs
    assert all(c >= 0.9 for c in pairs.values())
    assert (0, 3) not in pairs


def test_lsh_topk_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 20")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.brute_force_topk(emb, q, k=3).collect()
    }
    approx_hits = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.lsh_topk(emb, q, k=3, tables=8, planes=4).collect()
    }
    # deterministic hash-derived planes → stable recall; embeddings are
    # near-random (hard case for LSH) so demand a meaningful but
    # conservative bound
    recall = len(exact & approx_hits) / len(exact)
    assert recall >= 0.5, recall


def test_srp_bucket_deterministic(spark, vecs):
    one = vecs.select(
        "vec_id", sim.srp_signature(F.col("embedding"), dim=4, planes=8).alias("b")
    )
    a = {r["vec_id"]: r["b"] for r in one.collect()}
    b = {r["vec_id"]: r["b"] for r in one.collect()}
    assert a == b
    # identical vectors must always share a bucket
    assert a[0] == a[0]


def test_srp_arrow_matches_catalyst(spark):
    """The Arrow (numpy matmul) and pure-Catalyst SRP bucket paths must
    produce bit-identical (table, bucket) assignments."""
    from pyspark.sql import functions as F

    from tableone_pyspark_spark.operators import similarity as sim

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(200)
    cat = e.select(
        "vec_id",
        F.explode(sim._lsh_table_structs(F.col("embedding"), 64, 4, 4, arrow=False)).alias("tb"),
    ).select("vec_id", "tb.table", "tb.bucket")
    arw = e.select(
        "vec_id",
        F.explode(sim._lsh_table_structs(F.col("embedding"), 64, 4, 4, arrow=True)).alias("tb"),
    ).select("vec_id", "tb.table", "tb.bucket")
    assert sorted(map(tuple, cat.collect())) == sorted(map(tuple, arw.collect()))


def test_neardup_lsh_path_no_cartesian(spark):
    """The scale strategy must plan as an equi-join on (table, bucket) —
    a BroadcastNestedLoopJoin anywhere in the plan means the O(N²)
    cartesian leaked back in."""
    from tableone_pyspark_spark.plans.inspect import executed_plan

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lsh = sim.cosine_neardup_pairs(e, threshold=0.9, strategy="lsh")
    assert "BroadcastNestedLoopJoin" not in executed_plan(lsh)
    brute = sim.cosine_neardup_pairs(e, threshold=0.9, strategy="brute")
    assert "BroadcastNestedLoopJoin" in executed_plan(brute)


def test_neardup_auto_picks_by_size(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    auto_small = sim.cosine_neardup_pairs(e, threshold=0.9)  # n=500 <= limit
    assert "BroadcastNestedLoopJoin" in auto_small._jdf.queryExecution().executedPlan().toString()
    auto_big = sim.cosine_neardup_pairs(e, threshold=0.9, brute_force_limit=100)
    assert "BroadcastNestedLoopJoin" not in auto_big._jdf.queryExecution().executedPlan().toString()


def test_neardup_lsh_subset_with_exact_scores(spark):
    """LSH candidates are verified with the exact cosine: every emitted
    pair appears in the brute-force result with an identical score, and
    recall on the high-similarity regime stays high."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    brute = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in sim.cosine_neardup_pairs(e, threshold=0.3, strategy="brute").collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in sim.cosine_neardup_pairs(e, threshold=0.3, strategy="lsh").collect()
    }
    assert len(brute) > 0
    assert set(lsh).issubset(set(brute))
    for pair, cos in lsh.items():
        assert cos == brute[pair]
    # measured 0.699 on this corpus at cos>=0.3 — the moderate-similarity
    # regime (true near-dups at cos>=0.9 collide with prob ~1); the
    # planes are deterministic constants so the number is pinnable
    assert len(lsh) / len(brute) >= 0.65


def test_quantize_int8_profile(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = sim.quantize_int8_profile(e).collect()
    assert len(rows) == e.count()
    for r in rows:
        # round-half-up reconstruction error is bounded by scale/2
        # (both sides independently ROUND(6)-ed → allow 1e-6 slack)
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-6

    # zero vector: scale 0, no error, q = zeros
    z = spark.createDataFrame([(1, [0.0] * 4)], "vec_id long, embedding array<double>")
    r = sim.quantize_int8_profile(z).collect()[0]
    assert (r["scale"], r["max_abs_err"], r["sum_q"]) == (0.0, 0.0, 0)


def test_quantize_profile_no_shuffle(spark):
    from tableone_pyspark_spark.plans.inspect import plan_facts

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    f = plan_facts(sim.quantize_int8_profile(e))
    assert f.n_exchanges == 0  # scan -> project, nothing else


def test_label_centroids_numpy_twin(spark):
    """Differential pin for label_centroids (its graded query was
    deleted r11 — this numpy twin keeps the row-level evidence): per
    (label, pos) the centroid equals the plain component mean, long
    format, every label x dim cell present exactly once."""
    import numpy as np

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(e.first()["embedding"])
    rows = sim.label_centroids(e, "label", "embedding").collect()
    got = {(r["label"], r["pos"]): r["centroid"] for r in rows}
    pdf = e.select("label", "embedding").toPandas()
    want = {}
    for lbl, grp in pdf.groupby("label"):
        m = np.stack(grp["embedding"].to_numpy()).mean(axis=0)
        for pos in range(dim):
            want[(lbl, pos)] = round(float(m[pos]), 6)
    assert set(got) == set(want)
    assert len(rows) == len(want)  # one row per (label, pos)
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-6, k
