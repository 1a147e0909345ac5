"""Trained hashed-n-gram quality classifier (operators/classifier.py).

Differential strategy: an independent pure-python twin (re tokenize,
poly_hash_py, dict counts, the same NB-log-odds formulas) reproduces
training EXACTLY (integer counts + identical math.log sequence) and
scoring to 1e-12; the catalyst reference impl and the arrow default
are parity-pinned against each other; the catalyst scoring plan is
pinned Exchange-free (map-side only — the 100 TB shape)."""

from __future__ import annotations

import math
import re

import pytest

from tableone_pyspark_spark.operators.bloom import poly_hash_py
from tableone_pyspark_spark.operators.classifier import (
    score_quality,
    train_quality_classifier,
)

CLEAN = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "a well written paragraph contains varied words and clear structure",
    "researchers published the annual report about climate and energy",
    "she walked to the market and bought fresh bread for the family",
    "the committee discussed the proposal and agreed on a new plan",
    "history books describe the long journey of early explorers",
]
JUNK = [
    "click here click here buy now buy now free free free",
    "xxx zzz qqq xxx zzz qqq xxx zzz qqq",
    "win win win prize prize prize now now now",
    "aaa bbb aaa bbb aaa bbb aaa bbb",
    "cheap cheap deals deals click click subscribe subscribe",
    "lorem lorem lorem ipsum ipsum ipsum dolor dolor",
]


def _grams(t: str) -> list[str]:
    ws = [w for w in re.sub(r"[ \t\n]+", " ", t.lower()).strip(" ").split(" ") if w]
    return ws + [a + " " + b for a, b in zip(ws, ws[1:])]


def _twin_train(rows, b, alpha=1.0):
    pos = [0] * b
    neg = [0] * b
    np_ = nn = 0
    for t, y in rows:
        if y == 1:
            np_ += 1
        else:
            nn += 1
        for g in _grams(t):
            k = poly_hash_py(g) % b
            if y == 1:
                pos[k] += 1
            else:
                neg[k] += 1
    pt, nt, av = sum(pos), sum(neg), alpha * b
    w = [
        math.log((pos[i] + alpha) / (pt + av))
        - math.log((neg[i] + alpha) / (nt + av))
        for i in range(b)
    ]
    return w, math.log(np_ / nn)


def _twin_score(t, w, prior):
    gs = [] if t is None else _grams(t)
    acc = 0.0
    for g in gs:
        acc += w[poly_hash_py(g) % len(w)]
    z = prior + (acc / len(gs) if gs else 0.0)
    return len(gs), 1.0 / (1.0 + math.exp(-z))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, t, 1) for i, t in enumerate(CLEAN)] + [
        (100 + i, t, 0) for i, t in enumerate(JUNK)
    ]
    return spark.createDataFrame(rows, "id long, text string, label int")


def test_train_matches_python_twin_exactly(corpus):
    b = 256
    for impl in ("arrow", "catalyst"):
        w, prior = train_quality_classifier(
            corpus, "text", "label", n_buckets=b, hash_impl=impl
        )
        tw, tp = _twin_train(
            [(t, 1) for t in CLEAN] + [(t, 0) for t in JUNK], b
        )
        assert w == tw, impl  # integer counts + identical log sequence
        assert prior == tp, impl


def test_score_matches_twin_and_impl_parity(corpus, spark):
    b = 256
    w, prior = train_quality_classifier(corpus, "text", "label", n_buckets=b)
    probe = spark.createDataFrame(
        [
            (1, "the quick committee agreed on the annual report"),
            (2, "click click buy buy free free now"),
            (3, ""),
            (4, None),
            (5, "  \t\n  "),
            (6, "Ünïcode Tokens 𝄞 here 𝄞 here"),
            (7, "single"),
        ],
        "id long, text string",
    )
    got = {}
    for impl in ("arrow", "catalyst"):
        rows = score_quality(
            probe, "text", "id", w, prior, hash_impl=impl
        ).collect()
        got[impl] = {r["id"]: (r["n_features"], r["quality_score"]) for r in rows}
    texts = {r["id"]: r["text"] for r in probe.collect()}
    for i, t in texts.items():
        n, s = _twin_score(t, w, prior)
        for impl in ("arrow", "catalyst"):
            gn, gs = got[impl][i]
            assert gn == n, (impl, i)
            assert gs == pytest.approx(s, abs=1e-12), (impl, i)
    # the two impls agree with each other to float-sequence exactness
    for i in texts:
        assert got["arrow"][i][1] == pytest.approx(
            got["catalyst"][i][1], abs=1e-12
        ), i
    # empty/null/whitespace docs sit at the prior
    base = 1.0 / (1.0 + math.exp(-prior))
    for i in (3, 4, 5):
        assert got["arrow"][i] == (0, pytest.approx(base, abs=1e-12))


def test_classifier_separates_classes(corpus, spark):
    w, prior = train_quality_classifier(corpus, "text", "label", n_buckets=512)
    scored = score_quality(corpus, "text", "id", w, prior).collect()
    lab = {r["id"]: r for r in scored}
    clean = [lab[i]["quality_score"] for i in range(len(CLEAN))]
    junk = [lab[100 + i]["quality_score"] for i in range(len(JUNK))]
    assert min(clean) > max(junk)  # perfect separation on train data


def test_partitioning_invariance(corpus):
    b = 128
    w1, p1 = train_quality_classifier(corpus, "text", "label", n_buckets=b)
    w8, p8 = train_quality_classifier(
        corpus.repartition(8), "text", "label", n_buckets=b
    )
    assert w1 == w8 and p1 == p8  # exact integer counts → exact model


def test_catalyst_scoring_plan_is_exchange_free(corpus):
    w, prior = train_quality_classifier(corpus, "text", "label", n_buckets=64)
    scored = score_quality(corpus, "text", "id", w, prior, hash_impl="catalyst")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-side only: the 100 TB shape


def test_validation_errors(corpus, spark):
    with pytest.raises(ValueError, match="hash_impl"):
        train_quality_classifier(corpus, "text", "label", hash_impl="fast")
    with pytest.raises(ValueError, match="n_buckets"):
        train_quality_classifier(corpus, "text", "label", n_buckets=0)
    with pytest.raises(ValueError, match="alpha"):
        train_quality_classifier(corpus, "text", "label", alpha=0.0)
    with pytest.raises(ValueError, match="weights"):
        score_quality(corpus, "text", "id", [], 0.0)
    with pytest.raises(ValueError, match="hash_impl"):
        score_quality(corpus, "text", "id", [0.0], 0.0, hash_impl="fast")
    bad = spark.createDataFrame(
        [(1, "a b", 2), (2, "c d", 0)], "id long, text string, label int"
    )
    with pytest.raises(ValueError, match="labels must be 0/1"):
        train_quality_classifier(bad, "text", "label")
    one_class = spark.createDataFrame(
        [(1, "a b", 1), (2, "c d", 1)], "id long, text string, label int"
    )
    with pytest.raises(ValueError, match="BOTH label classes"):
        train_quality_classifier(one_class, "text", "label")
    # NULL labels must raise, not silently train as negative evidence
    # (min/max ignore NULLs — self-review r10)
    nulled = spark.createDataFrame(
        [(1, "a b", 1), (2, "c d", 0), (3, "e f", None)],
        "id long, text string, label int",
    )
    with pytest.raises(ValueError, match="NULL"):
        train_quality_classifier(nulled, "text", "label")
    empty = spark.createDataFrame([], "id long, text string, label int")
    with pytest.raises(ValueError, match="empty"):
        train_quality_classifier(empty, "text", "label")
