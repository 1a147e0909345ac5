"""DSIR importance resampling (operators/dsir.py).

The log-weight arithmetic is pinned against a pure-Python replay of
the hashed-bigram models; the selection contract — target-like docs
out-select off-target docs — is asserted end-to-end; determinism and
the Gumbel lattice are pinned directly."""

from __future__ import annotations

import math

import pytest

from tableone_pyspark_spark.operators import dsir

TARGET = [
    (1, "the cat sat on the mat"),
    (2, "the cat ran on the mat"),
    (3, "a cat on a mat"),
]
RAW = [
    (10, "the cat sat on the mat"),      # in-domain
    (11, "stock market index futures"),  # off-domain
    (12, "the cat on the mat again"),    # in-domain-ish
    (13, "quantum flux capacitor array"),
    (14, ""),                            # no features
]
B = 97  # small prime so bucket collisions are exercised


def _poly(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % ((1 << 31) - 1)
    return h


def _ref_buckets(text: str) -> list[int]:
    words = [w for w in " ".join(text.lower().split()).split(" ") if w]
    return [_poly(f"{a} {b}") % B for a, b in zip(words, words[1:])]


def _ref_model(rows):
    counts: dict[int, int] = {}
    for _i, t in rows:
        for b in _ref_buckets(t):
            counts[b] = counts.get(b, 0) + 1
    return counts


def _ref_logw(text: str, alpha=1.0) -> tuple[int, float]:
    p, q = _ref_model(TARGET), _ref_model(RAW)
    np_, nq = sum(p.values()), sum(q.values())
    out = 0.0
    bs = _ref_buckets(text)
    for b in bs:
        out += math.log((p.get(b, 0) + alpha) / (np_ + alpha * B))
        out -= math.log((q.get(b, 0) + alpha) / (nq + alpha * B))
    return len(bs), out


def _frames(spark):
    t = spark.createDataFrame(TARGET, ["id", "text"])
    r = spark.createDataFrame(RAW, ["id", "text"])
    return t, r


def test_importance_weights_match_reference(spark):
    t, r = _frames(spark)
    tm = dsir.fit_hashed_ngram_model(t, "text", "id", B)
    rm = dsir.fit_hashed_ngram_model(r, "text", "id", B)
    got = {
        row["id"]: row
        for row in dsir.importance_weights(r, tm, rm, "text", "id", B).collect()
    }
    assert set(got) == {i for i, _ in RAW}
    for i, text in RAW:
        n, lw = _ref_logw(text)
        assert got[i]["n_features"] == n, (i, text)
        assert got[i]["log_w"] == pytest.approx(lw, abs=1e-9), (i, text)
    # no-feature doc: weight 1 (log 0), not NULL and not an error
    assert got[14]["n_features"] == 0 and got[14]["log_w"] == 0.0


def test_target_like_docs_outweigh_off_target(spark):
    t, r = _frames(spark)
    tm = dsir.fit_hashed_ngram_model(t, "text", "id", B)
    rm = dsir.fit_hashed_ngram_model(r, "text", "id", B)
    w = {
        row["id"]: row["log_w"]
        for row in dsir.importance_weights(r, tm, rm, "text", "id", B).collect()
    }
    assert w[10] > w[11] and w[10] > w[13]
    assert w[12] > w[11]


def test_dsir_select_deterministic_topk(spark):
    t, r = _frames(spark)
    tm = dsir.fit_hashed_ngram_model(t, "text", "id", B)
    rm = dsir.fit_hashed_ngram_model(r, "text", "id", B)
    weights = dsir.importance_weights(r, tm, rm, "text", "id", B)
    s1 = [row["id"] for row in dsir.dsir_select(weights, 3).collect()]
    s2 = [row["id"] for row in dsir.dsir_select(weights, 3).collect()]
    assert s1 == s2 and len(s1) == 3
    # different salt -> a different (but equally deterministic) draw is
    # ALLOWED; same salt must reproduce exactly
    s3 = [row["id"] for row in dsir.dsir_select(weights, 3, salt="dsir-v2").collect()]
    assert len(s3) == 3
    # gumbel key must equal log_w + the lattice draw
    from tableone_pyspark_spark.operators.sampling import BUCKETS, split_bucket
    from pyspark.sql import functions as F

    row = dsir.dsir_select(weights, 1).collect()[0]
    b = (
        weights.where(F.col("id") == row["id"])
        .select(split_bucket(F.col("id"), "dsir-v1").alias("b"))
        .collect()[0]["b"]
    )
    u = (b + 0.5) / BUCKETS
    assert row["gumbel_key"] == pytest.approx(
        row["log_w"] + -math.log(-math.log(u)), abs=1e-9
    )


def test_select_plan_is_topk_not_full_sort(spark):
    t, r = _frames(spark)
    tm = dsir.fit_hashed_ngram_model(t, "text", "id", B)
    rm = dsir.fit_hashed_ngram_model(r, "text", "id", B)
    weights = dsir.importance_weights(r, tm, rm, "text", "id", B)
    plan = dsir.dsir_select(weights, 2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_unseen_buckets_get_smoothed_ratio_not_zero(spark):
    """Scoring docs OUTSIDE the fitting corpora (fit once, score new
    shards): a bucket absent from both models must contribute the
    add-alpha smoothed log((nq+aB)/(np+aB)) per occurrence — zeroing it
    would bias novel-bigram docs toward weight 1."""
    t, r = _frames(spark)
    tm = dsir.fit_hashed_ngram_model(t, "text", "id", B)
    rm = dsir.fit_hashed_ngram_model(r, "text", "id", B)
    novel = spark.createDataFrame(
        [(99, "zzzz qqqq qqxx wwww")], ["id", "text"]
    )
    got = dsir.importance_weights(novel, tm, rm, "text", "id", B).collect()[0]
    p_model, q_model = _ref_model(TARGET), _ref_model(RAW)
    np_, nq = sum(p_model.values()), sum(q_model.values())
    exp = 0.0
    for b in _ref_buckets("zzzz qqqq qqxx wwww"):
        exp += math.log((p_model.get(b, 0) + 1.0) / (np_ + B))
        exp -= math.log((q_model.get(b, 0) + 1.0) / (nq + B))
    assert got["n_features"] == 3
    assert got["log_w"] == pytest.approx(exp, abs=1e-9)
    assert abs(exp) > 1e-6  # the buckets really are novel -> nonzero


def test_hashed_bigram_impls_identical(spark):
    # arrow melt+hash vs the catalyst column pipeline: identical
    # (id, bucket) multisets, incl. normalization edge cases
    from tableone_pyspark_spark.operators.dsir import _hashed_bigrams

    df = spark.createDataFrame(
        [
            (1, "The  Quick\tBrown\nfox JUMPS"),
            (2, "one"),
            (3, None),
            (4, "  padded   words  here  "),
            (5, "héllo wörld again"),
            # trailing \r / \x0b / unicode space: F.trim strips SPACES
            # only, so these must survive in the last word on BOTH paths
            (6, "ends with cr\r"),
            (7, "vt tail\x0b and\xa0nbsp"),  # \xa0 NBSP joins a word
            (8, "astral \U0001D11E clef \U0001F600 here"),
        ],
        "doc_id long, text string",
    )
    a = sorted(
        map(tuple, _hashed_bigrams(df, "text", "doc_id", 10_000).collect())
    )
    c = sorted(
        map(
            tuple,
            _hashed_bigrams(
                df, "text", "doc_id", 10_000, hash_impl="catalyst"
            ).collect(),
        )
    )
    assert a == c
    assert len(a) == 4 + 0 + 0 + 2 + 2 + 2 + 2 + 4  # bigrams per doc
    import pytest as _pytest
    with _pytest.raises(ValueError, match="hash_impl"):
        _hashed_bigrams(df, "text", "doc_id", 10_000, hash_impl="x").collect()
