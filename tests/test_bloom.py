"""Distributed Bloom filter (operators/bloom.py): no false negatives
ever, false positives at the designed rate, artifact deterministic and
partition-invariant (bit_or is commutative/associative/idempotent)."""

from __future__ import annotations

import numpy as np
import pytest

from tableone_pyspark_spark.operators.bloom import bloom_probe, build_bloom

M = 1 << 16
K = 5


def _seen_df(spark, n=500):
    return spark.createDataFrame(
        [(i, f"seen document number {i}") for i in range(n)], ["id", "text"]
    )


def test_no_false_negatives_and_low_fp_rate(spark):
    seen = _seen_df(spark)
    blm = build_bloom(seen, "text", m_bits=M, n_hashes=K)
    assert blm.bits.shape == (M // 64,) and blm.bits.dtype == np.uint64
    assert blm.m_bits == M and blm.n_hashes == K and not blm.normalize

    # every inserted key MUST probe positive
    got = {r["id"]: r["maybe_seen"] for r in
           bloom_probe(seen, blm, "text", "id").collect()}
    assert all(got.values()) and len(got) == 500

    # unseen keys: fp rate near the design point
    # (k=5, m=65536, n=2500 bits set-ish -> fpp ~ (nk/m)^k ~ tiny)
    novel = spark.createDataFrame(
        [(i, f"novel crawl page {i}") for i in range(1000)], ["id", "text"]
    )
    fp = sum(
        r["maybe_seen"]
        for r in bloom_probe(novel, blm, "text", "id").collect()
    )
    assert fp / 1000 < 0.05, fp


def test_artifact_deterministic_and_partition_invariant(spark):
    seen = _seen_df(spark, 300)
    a = build_bloom(seen, "text", m_bits=M, n_hashes=K)
    b = build_bloom(seen.repartition(13), "text", m_bits=M, n_hashes=K)
    assert np.array_equal(a.bits, b.bits)


def test_incremental_artifact_union_is_bitwise_or(spark):
    # the artifact composes: bloom(A ∪ B) == bloom(A) | bloom(B) —
    # the property that makes it an INCREMENTAL crawl index
    a_df = _seen_df(spark, 200)
    b_df = spark.createDataFrame(
        [(i, f"batch two page {i}") for i in range(200)], ["id", "text"]
    )
    a = build_bloom(a_df, "text", m_bits=M, n_hashes=K)
    b = build_bloom(b_df, "text", m_bits=M, n_hashes=K)
    ab = build_bloom(a_df.union(b_df), "text", m_bits=M, n_hashes=K)
    assert np.array_equal(ab.bits, a.union(b).bits)
    with pytest.raises(ValueError, match="different parameters"):
        a.union(build_bloom(b_df, "text", m_bits=M, n_hashes=K + 1))


def test_normalized_keys_match_family_convention(spark):
    seen = spark.createDataFrame([(1, "Hello   World.")], ["id", "text"])
    blm = build_bloom(seen, "text", m_bits=M, n_hashes=K, normalize=True)
    probe = spark.createDataFrame(
        [(1, "hello world."), (2, "HELLO\tWORLD."), (3, "different text.")],
        ["id", "text"],
    )
    got = {r["id"]: r["maybe_seen"] for r in
           bloom_probe(probe, blm, "text", "id").collect()}
    assert got[1] and got[2] and not got[3]


def test_validation(spark):
    df = _seen_df(spark, 1)
    with pytest.raises(ValueError, match="power of two"):
        build_bloom(df, "text", m_bits=100)
    with pytest.raises(ValueError, match="power of two"):
        # multiple of 64 but not a power of two: the odd KM step can
        # cycle on a subgroup of Z_192 — rejected, not silently weaker
        build_bloom(df, "text", m_bits=192)
    with pytest.raises(ValueError, match="n_hashes"):
        build_bloom(df, "text", n_hashes=0)


def test_null_keys_and_string_ids(spark):
    # NULL keys skip at build, probe False; string ids pass through
    seen = spark.createDataFrame(
        [("a", "first doc."), ("b", None), ("c", "second doc.")],
        "id string, text string",
    )
    blm = build_bloom(seen, "text", m_bits=M, n_hashes=K)
    probe = spark.createDataFrame(
        [("u1", "first doc."), ("u2", None), ("u3", "never seen doc.")],
        "id string, text string",
    )
    got = {r["id"]: r["maybe_seen"] for r in
           bloom_probe(probe, blm, "text", "id").collect()}
    assert got == {"u1": True, "u2": False, "u3": False}


def test_arrow_and_catalyst_hash_impls_bit_identical(spark):
    # same corpus (incl. non-ASCII BMP text AND astral-plane chars:
    # Spark's split('')/ascii pair is codepoint-aware, so the UTF-32
    # arrow kernel matches beyond the BMP too), both impls: the filter
    # bits and every probe verdict must match exactly
    rows = [
        (i, t)
        for i, t in enumerate(
            ["hello world", "héllo wörld", "数据 分析", "a" * 500, "", "x",
             "astral \U0001D11E clef", "emoji \U0001F600\U0001F680 mix"]
            + [f"doc {i} body text" for i in range(50)]
        )
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    a = build_bloom(df, "text", m_bits=1 << 10, n_hashes=5, normalize=True,
                    hash_impl="arrow")
    c = build_bloom(df, "text", m_bits=1 << 10, n_hashes=5, normalize=True,
                    hash_impl="catalyst")
    assert (a.bits == c.bits).all()
    pa = {r["id"]: r["maybe_seen"]
          for r in bloom_probe(df, a, "text", "id", hash_impl="arrow").collect()}
    pc = {r["id"]: r["maybe_seen"]
          for r in bloom_probe(df, c, "text", "id", hash_impl="catalyst").collect()}
    assert pa == pc
    assert all(pa.values())  # every built key probes seen
    with pytest.raises(ValueError, match="hash_impl"):
        build_bloom(df, "text", hash_impl="simd")
