"""Tests for the MLlib-backed approximate operators (MinHashLSH, IVF)
and streaming dedup."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tableone_pyspark_spark.operators import dedup as dd
from tableone_pyspark_spark.operators import ml_lsh
from tableone_pyspark_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def test_ml_minhash_recall_and_precision(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ml = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ml_lsh.ml_minhash_pairs(
            docs, "text", "doc_id", jaccard_threshold=0.5
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5).collect()
    }
    # approxSimilarityJoin distances are exact Jaccard → no false
    # positives, and on this corpus recall is total
    assert set(ml) == set(exact)
    for pair, j in ml.items():
        assert abs(j - exact[pair]) < 1e-9


def test_ivf_topk_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where("vec_id < 20")
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ml_lsh.ivf_topk(emb, q, k=3, n_centroids=16, n_probe=4).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.brute_force_topk(emb, q, k=3).collect()
    }
    recall = len(ivf & exact) / len(exact)
    # seeded KMeans → deterministic; random vectors are IVF's worst
    # case, still must beat 0.5 at 4/16 probes
    assert recall >= 0.5, recall
    # every query keeps exactly k survivors
    assert len(ivf) == len(exact)


def test_streaming_dedup(spark):
    from tableone_pyspark_spark.sources.testdata import events_stream
    from tableone_pyspark_spark.streaming.stream_stats import streaming_dedup

    stream = events_stream(spark, SF).select("ts", "user_id", "event_type")
    deduped = streaming_dedup(stream, ["user_id", "event_type"])
    assert deduped.isStreaming
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_stream_dedup").count()
    from tableone_pyspark_spark.sources.testdata import load_events

    want = (
        load_events(spark, SF)
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert got == want


def test_semantic_dedup_keeps_lowest_id(spark):
    # two exact-duplicate groups + singletons; the quadratic stays
    # within KMeans cells, and each dup group keeps its lowest id
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0]),   # ~dup of 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 1.0, 0.001]),   # ~dup of 2
        (4, [0.0, 0.0, 1.0]),     # singleton
        (5, [-1.0, 0.0, 0.0]),    # anti-parallel to 0: cos=-1, kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["keep"]
        for r in ml_lsh.semantic_dedup(
            df, threshold=0.99, n_centroids=3, train_limit=6
        ).collect()
    }
    assert len(out) == 6  # every input row present exactly once
    assert out[0] and out[2] and out[4] and out[5]
    assert not out[1] and not out[3]


def test_semantic_dedup_shares_ivf_index(spark):
    # the assignment is the memoized IVF index: the same corpus plan
    # must return the identical (cached) DataFrame object
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = ml_lsh.ivf_assign(emb)
    b = ml_lsh.ivf_assign(spark.read.parquet(f"{SF}/embeddings.parquet"))
    assert a is b


def test_cell_quality_profile_covers_corpus(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = ml_lsh.cell_quality_profile(emb, docs).collect()
    joined = emb.join(
        docs, emb.vec_id == docs.doc_id, "inner"
    ).count()
    assert sum(r["n"] for r in out) == joined  # every joined doc in exactly one cell
    assert all(0.0 <= r["avg_quality"] <= 1.0 for r in out)
    assert all(r["avg_tokens"] > 0 for r in out)
