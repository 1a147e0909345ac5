"""Exact duplicate-span removal (dedup.remove_duplicate_spans) pinned
against an independent pure-Python reference implementation of the Lee
et al. 2022 rule: every k-token window seen before (globally-first
occurrence wins, (doc, pos)-lexicographic) marks its span for removal;
coverage merges overlaps."""

from __future__ import annotations

import numpy as np
import pytest

from tableone_pyspark_spark.operators.dedup import remove_duplicate_spans


def _norm(t: str) -> list[str]:
    """EXACTLY normalize_text's rule: lowercase, collapse [ \t\n]+ —
    deliberately NOT str.split() (which also eats \r and unicode
    whitespace the product leaves alone)."""
    import re

    return [w for w in re.sub("[ \t\n]+", " ", t.lower()).strip().split(" ") if w]


def _ref(rows, k):
    """Pure-Python replay on normalized token streams."""
    toks = {i: _norm(t) for i, t in rows}
    first: dict[tuple, tuple] = {}
    for i in sorted(toks):
        ws = toks[i]
        for p in range(len(ws) - k + 1):
            g = tuple(ws[p : p + k])
            if g not in first:
                first[g] = (i, p)
    seen_count: dict[tuple, int] = {}
    for i in sorted(toks):
        ws = toks[i]
        for p in range(len(ws) - k + 1):
            g = tuple(ws[p : p + k])
            seen_count[g] = seen_count.get(g, 0) + 1
    out = {}
    for i in sorted(toks):
        ws = toks[i]
        drop = set()
        for p in range(len(ws) - k + 1):
            g = tuple(ws[p : p + k])
            if seen_count[g] > 1 and first[g] != (i, p):
                drop.update(range(p, p + k))
        kept = [w for j, w in enumerate(ws) if j not in drop]
        out[i] = (" ".join(kept), len(ws), len(ws) - len(kept))
    return out


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(df, "text", "doc_id", k=k).collect()
    }
    assert got == _ref(rows, k)
    return got


def test_simple_cross_doc_duplicate_span(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "intro alpha beta gamma delta outro"),  # dup 4-gram, not first
    ]
    got = _run(spark, rows, 4)
    assert got[1][2] == 0                      # first occurrence kept
    assert got[2][0] == "intro outro"          # span cut from doc 2
    assert got[2][2] == 4


def test_overlapping_windows_merge_via_coverage(spark):
    # a 6-token duplicated region = three overlapping 4-grams; coverage
    # must remove exactly the 6 tokens, not 12
    region = "one two three four five six"
    rows = [(1, f"{region} tailA"), (2, f"headB {region} tailB")]
    got = _run(spark, rows, 4)
    assert got[2][0] == "headb tailb"
    assert got[2][2] == 6


def test_within_doc_repetition(spark):
    # the same 3-gram twice INSIDE one doc: second occurrence cut
    rows = [(1, "x y z filler x y z")]
    got = _run(spark, rows, 3)
    assert got[1][0] == "x y z filler"
    assert got[1][2] == 3


def test_short_and_empty_docs_pass_through(spark):
    rows = [(1, "tiny doc"), (2, ""), (3, "a b c d e f g h i j")]
    got = _run(spark, rows, 5)
    assert got[1] == ("tiny doc", 2, 0)
    assert got[2] == ("", 0, 0)
    assert got[3][2] == 0


def test_randomized_differential(spark):
    rng = np.random.default_rng(17)
    vocab = [f"w{j}" for j in range(12)]
    rows = []
    for i in range(30):
        n = int(rng.integers(0, 40))
        rows.append((i, " ".join(rng.choice(vocab, n))))
    # small vocab + k=5 yields plenty of genuine cross-doc duplicates
    _run(spark, rows, 5)


def test_k_validation(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="k must be"):
        remove_duplicate_spans(df, "text", "doc_id", k=1)


def test_null_text_defined_row_and_cr_not_collapsed(spark):
    # NULL text: defined ('', 0, 0) row — family convention
    df = spark.createDataFrame(
        [(1, None), (2, "a b c a b c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(df, "text", "doc_id", k=3).collect()
    }
    assert got[1] == ("", 0, 0)
    assert got[2] == ("a b c", 6, 3)

    # \r survives normalization (documented family boundary): a CRLF
    # copy does NOT match its LF twin
    rows = [(1, "one two three four"), (2, "one two\r three four")]
    _run(spark, rows, 4)  # differential: both sides agree \r blocks the match


def test_arrow_occurrence_kernel_matches_catalyst(spark):
    # r17: the window melt runs as one Arrow kernel; pin it
    # bit-identical ((id, pos, h1, h2) multiset) to the pure-Catalyst
    # posexplode + char-fold construction it replaced, across unicode,
    # \r, NULL, empty, and shorter-than-k docs
    from tableone_pyspark_spark.operators.dedup import (
        _span_occurrences,
        _span_occurrences_catalyst,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon alpha beta gamma"),
        (2, "Ünïcode wörds    collapse\tand\nlowercase Straße ok"),
        (3, "carriage\rreturn stays one token x y z"),
        (4, None),
        (5, ""),
        (6, "short doc"),
        (7, " ".join(f"w{i % 7}" for i in range(200))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (2, 3, 10):
        got = sorted(
            tuple(r) for r in _span_occurrences(df, "text", "doc_id", k).collect()
        )
        ref = sorted(
            tuple(r)
            for r in _span_occurrences_catalyst(df, "text", "doc_id", k).collect()
        )
        assert got == ref and len(got) > 0
