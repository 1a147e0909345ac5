"""Bigram-LM perplexity scoring (operators/lm.py, CCNet-style).

Counts and smoothed log-probabilities are pinned against hand
computation; the smoothing is checked by its defining property
(conditionals sum to 1 over the vocabulary); and the end-to-end
contract — in-domain text scores lower perplexity than out-of-domain —
is asserted on a synthetic corpus."""

from __future__ import annotations

import math

import pytest

from tableone_pyspark_spark.operators.lm import (
    _bigram_occurrences,
    lm_perplexity,
    train_bigram_lm,
)

REF_ROWS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "a cat"),
]


def _model(spark):
    ref = spark.createDataFrame(REF_ROWS, ["id", "text"])
    return train_bigram_lm(ref, "text", "id")


def test_counts_and_vocab_hand_pinned(spark):
    bg, ctx, v = _model(spark)
    assert v == 8  # the cat sat on mat dog log a
    got = {(r["w1"], r["w2"]): r["c2"] for r in bg.collect()}
    assert got[("on", "the")] == 2 and got[("sat", "on")] == 2
    assert got[("the", "cat")] == 1 and len(got) == 9
    c1 = {r["w1"]: r["c1"] for r in ctx.collect()}
    # context counts exclude each doc's LAST word: "cat" is a context
    # only in doc 1 (doc 3 ends with it); sum of c2 over w2 == c1
    assert c1["the"] == 4 and c1["cat"] == 1 and "mat" not in c1
    for w, c in c1.items():
        assert c == sum(v2 for (w1, _w2), v2 in got.items() if w1 == w)


def test_smoothed_conditionals_sum_to_one(spark):
    # Σ_w2∈V (c2 + α)/(c1 + αV) = (c1 + αV)/(c1 + αV) = 1 — holds
    # because c1 counts CONTEXT occurrences (the denominator invariant)
    bg, ctx, v = _model(spark)
    counts = {(r["w1"], r["w2"]): r["c2"] for r in bg.collect()}
    c1 = {r["w1"]: r["c1"] for r in ctx.collect()}
    vocab = {w for pair in counts for w in pair} | set(c1)
    assert len(vocab) == v
    alpha = 1.0
    for w1 in c1:
        total = sum(
            (counts.get((w1, w2), 0) + alpha) / (c1[w1] + alpha * v)
            for w2 in vocab
        )
        assert total == pytest.approx(1.0, abs=1e-12)


def test_perplexity_hand_pinned_and_edges(spark):
    bg, ctx, v = _model(spark)
    test = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zebra quantum flux"), (12, "single"),
         (13, "")],
        ["id", "text"],
    )
    out = {r["id"]: r for r in lm_perplexity(test, bg, ctx, v, "text", "id").collect()}
    # doc 10: ln((1+1)/(4+8)) + ln((1+1)/(1+8)) over 2 bigrams
    exp = (math.log(2 / 12) + math.log(2 / 9)) / 2
    assert out[10]["avg_logp"] == pytest.approx(exp, abs=1e-12)
    assert out[10]["ppl"] == pytest.approx(math.exp(-exp), abs=1e-9)
    assert out[10]["n_matched"] == 2
    # fully out-of-domain: floor probability 1/(0 + V) per bigram
    assert out[11]["n_matched"] == 0
    assert out[11]["ppl"] == pytest.approx(float(v), abs=1e-9)
    # < 2 words: no bigrams, NULL scores (not an error)
    assert out[12]["n_bigrams"] == 0 and out[12]["avg_logp"] is None
    assert out[13]["n_bigrams"] == 0 and out[13]["ppl"] is None


def test_in_domain_scores_lower_than_out_of_domain(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    ref = spark.createDataFrame(rows, ["id", "text"])
    bg, ctx, v = train_bigram_lm(ref, "text", "id")
    test = spark.createDataFrame(
        [(100, "the quick brown fox"), (101, "zzz yyy xxx www")],
        ["id", "text"],
    )
    out = {r["id"]: r["ppl"] for r in lm_perplexity(test, bg, ctx, v, "text", "id").collect()}
    assert out[100] < out[101]


def test_bigram_occurrences_ordering_and_normalization(spark):
    df = spark.createDataFrame([(1, "  The   CAT\tsat \n")], ["id", "text"])
    got = [(r["w1"], r["w2"]) for r in _bigram_occurrences(df, "text", "id").collect()]
    assert got == [("the", "cat"), ("cat", "sat")]


def test_empty_model_rejected(spark):
    bg, ctx, _v = _model(spark)
    test = spark.createDataFrame([(1, "x")], ["id", "text"])
    with pytest.raises(ValueError, match="vocab_size"):
        lm_perplexity(test, bg, ctx, 0, "text", "id")


def test_ccnet_buckets(spark):
    # deterministic tercile split over ppl with explicit unscored
    from pyspark.sql import functions as F

    from tableone_pyspark_spark.operators.lm import ccnet_buckets

    rows = [(i, float(i + 1)) for i in range(9)] + [(99, None)]
    df = spark.createDataFrame(rows, "id long, ppl double")
    # both modes agree on distinct values away from tie boundaries:
    # sketch cuts = quantile_disc values 3.0/6.0, rank pr = i/8
    for mode in ("sketch", "rank"):
        got = {
            r["id"]: r["bucket"]
            for r in ccnet_buckets(df, mode=mode).collect()
        }
        assert [got[i] for i in range(9)] == (
            ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
        ), mode
        assert got[99] == "unscored"
    # determinism: equal ppl everywhere still splits the same way
    # twice in rank mode (id tiebreak); in sketch mode the whole tie
    # mass shares one bucket (value semantics)
    tied = spark.createDataFrame([(i, 5.0) for i in range(6)], "id long, ppl double")
    a = sorted(map(tuple, ccnet_buckets(tied, mode="rank").collect()))
    b = sorted(map(tuple, ccnet_buckets(tied, mode="rank").collect()))
    assert a == b
    assert {
        r["bucket"] for r in ccnet_buckets(tied, mode="sketch").collect()
    } == {"head"}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="cuts"):
        ccnet_buckets(df, cuts=(0.9, 0.3))
    with _pytest.raises(ValueError, match="mode"):
        ccnet_buckets(df, mode="nope")


def test_ccnet_buckets_sketch_plan_has_no_window(spark):
    """VERDICT r8's one scale-shape flag: the default mode must not
    funnel the scored frame through a global single-partition sort.
    The sketch plan carries NO Window operator and NO global Sort;
    since r17 the cut values are collected literals and bucketing is
    one projection over the checkpointed scored frame — no joins,
    no union, no second execution of the upstream DAG."""
    from tableone_pyspark_spark.operators.lm import ccnet_buckets

    df = spark.createDataFrame(
        [(i, float(i % 17)) for i in range(100)], "id long, ppl double"
    )
    plan = ccnet_buckets(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "percent_rank" not in plan
    assert "Exchange" not in plan  # literal cuts: pure projection, no join
    assert "Union" not in plan  # unscored arm folded into the when-chain
    # rank mode keeps the deterministic reference shape
    rplan = (
        ccnet_buckets(df, mode="rank")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in rplan
