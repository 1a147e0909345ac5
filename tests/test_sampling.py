"""Deterministic split/sample: partitioning invariance, key
consistency, approximate fractions, salt decorrelation."""

from __future__ import annotations

from pyspark.sql import functions as F

from tableone_pyspark_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_split_partition_invariant(spark):
    d = _docs(spark)
    a = {r["doc_id"]: r["split"] for r in hash_split(d, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(d.repartition(13), "doc_id").collect()
    }
    assert a == b


def test_split_fraction_and_disjointness(spark):
    d = _docs(spark)
    out = hash_split(d, "doc_id", test_fraction=0.25)
    n = out.count()
    n_test = out.where(F.col("split") == "test").count()
    assert 0.15 <= n_test / n <= 0.35  # hashed fraction ≈ requested
    assert out.where(~F.col("split").isin("train", "test")).count() == 0


def test_sample_is_subset_and_consistent_across_tables(spark):
    d = _docs(spark)
    s1 = {r["doc_id"] for r in deterministic_sample(d, "doc_id", 0.3).collect()}
    # a second table sharing the key space picks the SAME keys
    other = d.select("doc_id", "lang")
    s2 = {r["doc_id"] for r in deterministic_sample(other, "doc_id", 0.3).collect()}
    assert s1 == s2 and 0 < len(s1) < d.count()


def test_salt_decorrelates(spark):
    d = _docs(spark)
    a = {r["doc_id"] for r in deterministic_sample(d, "doc_id", 0.5, salt="a").collect()}
    b = {r["doc_id"] for r in deterministic_sample(d, "doc_id", 0.5, salt="b").collect()}
    assert a != b  # different salts draw different halves
