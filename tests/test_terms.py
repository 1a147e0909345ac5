"""Tests for operators/terms.py (TF-IDF, winnowing) and
ml_lsh.kmeans_profile."""

from __future__ import annotations

import pytest

from tableone_pyspark_spark.operators import terms as tm

DOCS = [
    (1, "spark shuffles data between stages and spark plans joins"),
    (2, "the quick brown fox jumps over the lazy dog near the barn"),
    (3, "a quick brown fox jumps over the lazy dog near a barn"),  # shares a long run with 2
    (4, "parquet column pruning reduces scan bytes dramatically"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_tfidf_ranks_distinctive_terms(docs):
    out = tm.tfidf_top_terms(docs, "text", "doc_id", k=2)
    rows = {(r["id"], r["rank"]): r for r in out.collect()}
    # doc 1's top term is its repeated corpus-unique word
    top1 = rows[(1, 1)]
    assert top1["term"] == "spark" and top1["tf"] == 2 and top1["df"] == 1
    # every doc gets exactly k rows; ranks are 1..k
    by_doc = {}
    for (i, r), _ in rows.items():
        by_doc.setdefault(i, []).append(r)
    assert all(sorted(v) == [1, 2] for v in by_doc.values())


def test_tfidf_common_term_scores_zero(docs):
    """A term present in every document has idf = ln(N/N) = 0."""
    out = tm.tfidf_top_terms(docs, "text", "doc_id", k=50).collect()
    # 'the'/'over' etc. appear in docs 2 and 3 only; construct the check
    # from df: any term with df == n_docs must have tfidf 0
    for r in out:
        if r["df"] == 4:
            assert r["tfidf"] == 0.0


def test_winnow_shared_run_guarantee(docs):
    """Docs 2 and 3 share the 8-word run 'quick brown fox jumps over the
    lazy dog' >= window + n - 1 = 6 words → MUST share a fingerprint
    (the winnowing locality guarantee), and the overlap query surfaces
    the pair."""
    fp = tm.winnow_fingerprints(docs, "text", "doc_id", n=3, window=4)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r["id"], set()).add(r["fingerprint"])
    assert by_doc[2] & by_doc[3]
    # unrelated docs share nothing
    assert not (by_doc[1] & by_doc[4])

    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in tm.winnow_overlap_pairs(
            docs, "text", "doc_id", n=3, window=4, min_shared=1
        ).collect()
    }
    assert (2, 3) in pairs


def test_winnow_kernel_matches_catalyst_twin(spark):
    """r17: the zero-shuffle Arrow winnow kernel must be bit-identical
    to the pre-r17 pure-Catalyst construction (kept as the twin) on
    the real corpus AND adversarial inputs (unicode incl. astral
    plane, whitespace variants, nulls, short docs, repetition), for
    the default and a non-default (n, window)."""
    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    adv = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, ""),
            (3, None),
            (4, "x y z"),
            (5, "x y z w"),
            (6, "x y z w v u"),
            (7, "Héllo   WÖRLD\t中文 emoji \U0001f389 test ß more words here"),
            (8, "a a a a a a a a a a"),
            (9, " leading and trailing  \n spaces \t tabs "),
            (10, "word " * 500),
        ],
        "doc_id long, text string",
    )
    for df, n, window in ((real, 3, 4), (adv, 3, 4), (adv, 2, 2)):
        a = tm._winnow_fingerprints_build(df, "text", "doc_id", n, window)
        b = tm._winnow_fingerprints_catalyst(df, "text", "doc_id", n, window)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0


def test_winnow_short_docs_empty(spark):
    d = spark.createDataFrame([(1, "just five words is not"), (2, "tiny")], "doc_id long, text string")
    # doc 2 has < n words; doc 1 has 5 words → 3 shingles < window=4 →
    # no full window → no fingerprints for either
    out = tm.winnow_fingerprints(d, "text", "doc_id", n=3, window=4).collect()
    assert out == []


def test_kmeans_profile_partitions_corpus(spark):
    from tableone_pyspark_spark.operators.ml_lsh import kmeans_profile

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    total = e.count()
    rows = kmeans_profile(e, n_centroids=8).collect()
    assert sum(r["n"] for r in rows) == total
    assert len(rows) <= 8
    assert all(r["mean_dist2"] >= 0 for r in rows)


def test_incremental_dedup_indexed_matches_in_session(spark, tmp_path):
    """The persisted-index variant must return exactly what the
    in-session variant returns, and the index side of the join must
    read its buckets with no Exchange (the write-time shuffle is the
    only shuffle the index ever pays)."""
    from tableone_pyspark_spark.operators.terms import (
        build_dedup_index,
        incremental_dedup,
        incremental_dedup_indexed,
    )
    from tableone_pyspark_spark.plans import inspect

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    seen, new = d.where("doc_id < 25"), d.where("doc_id >= 25")
    try:
        build_dedup_index(
            seen, "text", "doc_id", "t_dedup_idx", str(tmp_path / "idx"),
            n_buckets=8,
        )
        out = incremental_dedup_indexed(new, "t_dedup_idx", "text", "doc_id")
        want = {
            r["id"]: (r["n_shared"], r["is_dup"])
            for r in incremental_dedup(new, seen, "text", "doc_id").collect()
        }
        got = {r["id"]: (r["n_shared"], r["is_dup"]) for r in out.collect()}
        assert got == want and len(got) == new.count()
        # the bucketed index side joins exchange-free: the only
        # exchanges in the whole plan belong to the NEW side
        # (fingerprint groupBy + the id re-join), never the index scan
        exe = inspect.executed_plan(out)
        assert "SelectedBucketsCount" in exe or "Bucketed: true" in exe, exe
        import re

        idx_scan = re.search(r"FileScan parquet[^\n]*t_dedup_idx[^\n]*", exe)
        assert idx_scan is not None, exe
    finally:
        spark.sql("DROP TABLE IF EXISTS t_dedup_idx")


def test_incremental_dedup_flags_overlap(spark):
    from tableone_pyspark_spark.operators.terms import incremental_dedup

    seen = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near the river bank")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # contiguous overlap with the seen doc -> dup
            (10, "the quick brown fox jumps over the lazy dog near the old barn"),
            # disjoint text -> kept
            (11, "completely different words about spark partitions and shuffles here"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in incremental_dedup(
        new, seen, "text", "doc_id", min_shared=2
    ).collect()}
    assert len(out) == 2
    assert out[10]["is_dup"] and out[10]["n_shared"] >= 2
    assert not out[11]["is_dup"] and out[11]["n_shared"] == 0
