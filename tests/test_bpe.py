"""Distributed BPE (operators/bpe.py) vs a pure-Python reference
implementation of Sennrich et al.'s algorithm written independently in
this test: the trainer must produce the IDENTICAL merge sequence
(including count-desc / pair-asc tie-breaks), and the encoder must
produce the identical tokenization as batch-sequential merge
application over random words."""

from __future__ import annotations

import numpy as np
import pytest

from tableone_pyspark_spark.operators import bpe


# ---------------------------------------------------------------------------
# pure-Python reference (independent of the Spark implementation)
# ---------------------------------------------------------------------------


def _ref_train(word_counts: dict[str, int], n_merges: int):
    words = {
        tuple(list(w[:-1]) + [w[-1] + bpe.EOW]): c for w, c in word_counts.items()
    }
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for toks, c in words.items():
            for x, y in zip(toks, toks[1:]):
                pairs[(x, y)] = pairs.get((x, y), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = _merge_dicts(words, best)
    return merges


def _merge_dicts(words, best):
    # apply the merge and group identical post-merge sequences
    out: dict[tuple, int] = {}
    for t, c in words.items():
        k = _ref_apply(t, best)
        out[k] = out.get(k, 0) + c
    return out


def _ref_apply(toks: tuple, pair: tuple) -> tuple:
    t = list(toks)
    res = []
    i = 0
    while i < len(t):
        if i + 1 < len(t) and (t[i], t[i + 1]) == pair:
            res.append(t[i] + t[i + 1])
            i += 2
        else:
            res.append(t[i])
            i += 1
    return tuple(res)


def _ref_encode(word: str, merges: list) -> list[str]:
    toks = tuple(list(word[:-1]) + [word[-1] + bpe.EOW])
    for pair in merges:  # batch-sequential, training order
        toks = _ref_apply(toks, pair)
    return list(toks)


CORPUS = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def _corpus_df(spark):
    rows = []
    i = 0
    for w, c in CORPUS:
        for _ in range(c):
            rows.append((i, w))
            i += 1
    return spark.createDataFrame(rows, ["id", "text"])


def test_trainer_matches_reference_merge_sequence(spark):
    merges = bpe.train_bpe(_corpus_df(spark), "text", 10)
    assert merges == _ref_train(dict(CORPUS), 10)
    # the classic corpus fully merges its four words within 10 merges
    assert ("lo", "w" + bpe.EOW) in merges


def test_trainer_early_stop_and_min_count(spark):
    df = spark.createDataFrame([(1, "ab")], ["id", "text"])
    # "ab" -> a, b</w>: exactly one merge possible, then vocabulary is
    # a single token per word and no pairs remain
    assert bpe.train_bpe(df, "text", 50) == [("a", "b" + bpe.EOW)]
    assert bpe.train_bpe(df, "text", 50, min_count=2) == []


def test_trainer_checkpoint_path_equivalent(spark):
    # checkpoint_every=1 forces the localCheckpoint branch every round;
    # the merge sequence must not change
    df = _corpus_df(spark)
    assert bpe.train_bpe(df, "text", 6, checkpoint_every=1) == bpe.train_bpe(
        df, "text", 6, checkpoint_every=100
    )


def test_encode_matches_sequential_reference_on_random_words(spark):
    merges = bpe.train_bpe(_corpus_df(spark), "text", 10)
    rng = np.random.default_rng(3)
    alphabet = list("lowernstdi")
    words = [
        "".join(rng.choice(alphabet, rng.integers(1, 12)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], ["id", "text"]
    )
    got = {r["id"]: list(r["tokens"]) for r in
           bpe.bpe_encode(df, "text", "id", merges).collect()}
    for i, w in enumerate(words):
        assert got[i] == _ref_encode(w, merges), (w, got[i])


def test_encode_round_trips_and_counts(spark):
    merges = bpe.train_bpe(_corpus_df(spark), "text", 10)
    df = spark.createDataFrame(
        [(1, "low lower newest widest"), (2, ""), (3, "  low  ")],
        ["id", "text"],
    )
    out = {r["id"]: r for r in bpe.bpe_encode(df, "text", "id", merges).collect()}
    r = out[1]
    assert r["n_words"] == 4 and r["n_tokens"] == len(r["tokens"])
    # detokenization: concatenating tokens and stripping EOW markers
    # recovers the normalized text exactly
    text = "".join(r["tokens"]).replace(bpe.EOW, " ").strip()
    assert text == "low lower newest widest"
    assert out[2]["n_words"] == 0 and list(out[2]["tokens"]) == []
    assert out[3]["n_words"] == 1 and out[3]["tokens"][0] == "low" + bpe.EOW


def test_encode_null_text_defined_row(spark):
    merges = bpe.train_bpe(_corpus_df(spark), "text", 4)
    df = spark.createDataFrame(
        [(1, "low"), (2, None)], "id long, text string"
    )
    out = {r["id"]: r for r in bpe.bpe_encode(df, "text", "id", merges).collect()}
    assert out[2]["n_words"] == 0 and list(out[2]["tokens"]) == []
    assert out[1]["n_words"] == 1


def test_encode_string_ids_pass_through_untyped(spark):
    # the dedup-family convention (same as bloom_probe): ids keep the
    # source dtype — string/UUID ids must not crash the kernel
    merges = bpe.train_bpe(_corpus_df(spark), "text", 4)
    df = spark.createDataFrame(
        [("doc-a", "low"), ("urn:uuid:42", "lower")], "id string, text string"
    )
    enc = bpe.bpe_encode(df, "text", "id", merges)
    assert enc.schema["id"].dataType.simpleString() == "string"
    out = {r["id"]: r for r in enc.collect()}
    assert out["doc-a"]["n_words"] == 1 and out["urn:uuid:42"]["n_words"] == 1


def test_batched_training_round_trips_and_is_disjoint(spark):
    # batched mode (documented deviation: merge ORDER may differ from
    # strict) must still yield a VALID tokenizer: encode then
    # detokenize reproduces the normalized text exactly, and every
    # within-round batch is token-disjoint by construction
    rng = np.random.default_rng(7)
    vocab = ["spark", "scan", "shuffle", "batch", "column", "row",
             "vector", "agg", "join", "sort"]
    rows = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(3, 12))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    merges = bpe.train_bpe(df, "text", 24, batch_merges=8)
    assert len(merges) == 24
    out = bpe.bpe_encode(df, "text", "id", merges).collect()
    texts = dict(rows)
    for r in out:
        detok = "".join(r["tokens"]).replace(bpe.EOW, " ").rstrip()
        assert detok == texts[r["id"]], r["id"]


def test_batched_equals_strict_when_batches_are_disjoint(spark):
    # a corpus whose top pairs never chain: each word is a distinct
    # letter pair repeated, so strict and batched pick identical sets
    rows = []
    i = 0
    for w, c in [("ab", 9), ("cd", 7), ("ef", 5), ("gh", 3)]:
        for _ in range(c):
            rows.append((i, w))
            i += 1
    df = spark.createDataFrame(rows, ["id", "text"])
    strict = bpe.train_bpe(df, "text", 4, batch_merges=1)
    batched = bpe.train_bpe(df, "text", 4, batch_merges=4)
    assert strict == batched


def test_batched_validation(spark):
    df = _corpus_df(spark)
    with pytest.raises(ValueError, match="batch_merges"):
        bpe.train_bpe(df, "text", 2, batch_merges=0)


def test_train_min_word_count_truncates_tail(spark):
    # dropping singleton word types removes "lower"(2 lt 3) etc. from
    # the table; merges must equal reference-training on the truncated
    # counts
    df = _corpus_df(spark)
    kept = {w: c for w, c in CORPUS if c >= 3}
    assert bpe.train_bpe(df, "text", 6, min_word_count=3) == _ref_train(kept, 6)
