"""Curation operators: PII profile/redaction, per-source quota
sampling, benchmark decontamination, duplicate-n-gram fraction."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from tableone_pyspark_spark.functions.pii import pii_profile, redact_pii
from tableone_pyspark_spark.operators.decontam import (
    benchmark_overlap,
    decontaminate,
)
from tableone_pyspark_spark.operators.dedup import duplicate_ngram_fraction
from tableone_pyspark_spark.operators.sampling import quota_sample


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


# ---------------------------------------------------------------- PII

PII_ROWS = [
    (1, "reach me at alice@example.com or 22-123-456-7890 today"),
    (2, "server 10.0.250.1 rebooted; ping bob.smith+x@mail.co too"),
    (3, "no contact info here at all"),
    (4, "twice: a@b.io then c@d.org"),
]


def test_pii_profile_counts_and_redaction(spark):
    df = spark.createDataFrame(PII_ROWS, ["id", "text"])
    got = {r["id"]: r.asDict() for r in pii_profile(df, "id", "text").collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert got[2]["n_email"] == 1 and got[2]["n_ipv4"] == 1
    assert got[3]["n_pii"] == 0
    assert got[4]["n_email"] == 2 and got[4]["n_pii"] == 2
    # untouched doc keeps its length; redacted docs change length
    assert got[3]["redacted_len"] == got[3]["orig_len"]
    assert got[1]["redacted_len"] != got[1]["orig_len"]


def test_redact_replaces_with_placeholders(spark):
    df = spark.createDataFrame(PII_ROWS, ["id", "text"])
    red = {
        r["id"]: r["red"]
        for r in df.select("id", redact_pii(F.col("text")).alias("red")).collect()
    }
    assert "<EMAIL>" in red[1] and "<PHONE>" in red[1]
    assert "alice@example.com" not in red[1]
    assert "<IPV4>" in red[2] and "10.0.250.1" not in red[2]
    assert red[3] == PII_ROWS[2][1]
    # email redaction runs before ipv4, so dotted domains never
    # half-match the dotted-quad pattern
    assert red[4].count("<EMAIL>") == 2


# -------------------------------------------------------- quota sample


def test_quota_caps_each_group(spark):
    d = _docs(spark)
    out = quota_sample(d, "source", "doc_id", quota=3)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    full = {r["source"]: r["n"] for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in per.items():
        assert n == min(3, full[src])
    assert out.where(F.col("rk") > 3).count() == 0


def test_quota_deterministic_and_partition_invariant(spark):
    d = _docs(spark)
    a = {r["doc_id"] for r in quota_sample(d, "source", "doc_id", 5).collect()}
    b = {r["doc_id"] for r in quota_sample(d.repartition(17), "source", "doc_id", 5).collect()}
    assert a == b and len(a) > 0


def test_quota_rank_allows_tightening(spark):
    d = _docs(spark)
    five = quota_sample(d, "source", "doc_id", 5)
    two_direct = {r["doc_id"] for r in quota_sample(d, "source", "doc_id", 2).collect()}
    two_nested = {r["doc_id"] for r in five.where(F.col("rk") <= 2).collect()}
    assert two_direct == two_nested


# ------------------------------------------------------- decontam

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "the quick brown fox naps all day long"),  # shares 2 grams w/ 1
    (4, "completely different words entirely here now"),
]
BENCH = [(100, "the quick brown fox is the benchmark sentence")]


def test_benchmark_overlap_counts_shared_grams(spark):
    train = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["doc_id", "text"])
    got = {
        r["id"]: r["n_shared"]
        for r in benchmark_overlap(train, bench, "text", "doc_id").collect()
    }
    # docs 1 and 3 share "the quick brown" / "quick brown fox"
    assert got[1] == 2 and got[3] == 2
    assert 2 not in got and 4 not in got


def test_decontaminate_drops_only_hits(spark):
    train = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["doc_id", "text"])
    kept = {r["doc_id"] for r in decontaminate(train, bench, "text", "doc_id").collect()}
    assert kept == {2, 4}
    # higher threshold keeps everything (max shared here is 2)
    kept3 = {
        r["doc_id"]
        for r in decontaminate(train, bench, "text", "doc_id", min_shared=3).collect()
    }
    assert kept3 == {1, 2, 3, 4}


# ------------------------------------------------- dup n-gram fraction


def test_dup_ngram_fraction_bounds_and_exact_values(spark):
    rows = [
        (1, "a b c d e"),  # grams: abc bcd cde
        (2, "a b c x y"),  # grams: abc bcx cxy  -> shares abc with 1
        (3, "p q r s t"),  # disjoint
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["id"]: r.asDict()
        for r in duplicate_ngram_fraction(df, "text", "doc_id").collect()
    }
    assert got[1]["n_grams"] == 3 and got[1]["n_dup"] == 1
    assert abs(got[1]["dup_frac"] - 1 / 3) < 1e-12
    assert got[2]["n_dup"] == 1
    assert got[3]["n_dup"] == 0 and got[3]["dup_frac"] == 0.0


def test_dup_ngram_fraction_on_corpus(spark):
    d = _docs(spark)
    out = duplicate_ngram_fraction(d, "text", "doc_id")
    assert out.count() == d.count()
    bad = out.where((F.col("dup_frac") < 0) | (F.col("dup_frac") > 1)).count()
    assert bad == 0


# ---------------------------------------------------- sequence packing


def test_pack_sequences_is_a_permutation_of_the_stream(spark):
    from tableone_pyspark_spark.operators.packing import pack_sequences
    from tableone_pyspark_spark.functions.text import token_count

    d = _docs(spark).select(
        "doc_id", token_count(F.col("text")).alias("n_tok")
    )
    out = pack_sequences(d, "doc_id", "n_tok", max_tokens=512).collect()
    total = sum(r["n_tokens"] for r in out)
    # offsets tile the stream exactly: sorted spans are contiguous
    spans = sorted((r["offset"], r["n_tokens"]) for r in out)
    pos = 0
    for off, n in spans:
        assert off == pos
        pos += n
    assert pos == total
    for r in out:
        assert r["seq_id"] == r["offset"] // 512
        assert r["pos_in_seq"] == r["offset"] % 512
        assert r["end_seq_id"] >= r["seq_id"]


def test_pack_sequences_partition_invariant(spark):
    from tableone_pyspark_spark.operators.packing import pack_sequences
    from tableone_pyspark_spark.functions.text import token_count

    d = _docs(spark).select("doc_id", token_count(F.col("text")).alias("n_tok"))
    a = {r["id"]: r["offset"] for r in pack_sequences(d, "doc_id", "n_tok", 512).collect()}
    b = {
        r["id"]: r["offset"]
        for r in pack_sequences(d.repartition(11), "doc_id", "n_tok", 512).collect()
    }
    assert a == b


def test_pack_sequences_no_global_sort(spark):
    from tableone_pyspark_spark.operators.packing import pack_sequences
    from tableone_pyspark_spark.functions.text import token_count
    from tableone_pyspark_spark.plans import inspect

    d = _docs(spark).select("doc_id", token_count(F.col("text")).alias("n_tok"))
    out = pack_sequences(d, "doc_id", "n_tok", 512)
    exe = inspect.executed_plan(out)
    # the window must partition by shard — a global-order window would
    # plan a single-partition Exchange
    assert "SinglePartition" not in exe
    assert inspect.plan_facts(out).n_broadcast_joins == 1


# ---------------------------------------------------- weighted sample


def test_weighted_sample_extremes_and_rate(spark):
    from tableone_pyspark_spark.operators.sampling import weighted_sample

    d = _docs(spark)
    assert weighted_sample(d, "doc_id", F.lit(0.0)).count() == 0
    assert weighted_sample(d, "doc_id", F.lit(1.0)).count() == d.count()
    assert weighted_sample(d, "doc_id", F.lit(7.5)).count() == d.count()  # clamped
    n = weighted_sample(d, "doc_id", F.lit(0.5)).count()
    assert 0.35 <= n / d.count() <= 0.65


def test_weighted_sample_favors_high_weight(spark):
    from tableone_pyspark_spark.operators.sampling import weighted_sample

    d = _docs(spark)
    # weight by length: long docs should survive more often
    w = (F.col("n_chars") / F.lit(600.0))
    kept = weighted_sample(d, "doc_id", w)
    med_all = d.approxQuantile("n_chars", [0.5], 0.0)[0]
    med_kept = kept.approxQuantile("n_chars", [0.5], 0.0)[0]
    assert med_kept > med_all


def test_c4_clean_line_and_page_rules(spark):
    """C4 heuristics pinned faithfully to Raffel 2020 §2.2:
    terminal-punctuation lines with >=3 words survive; javascript
    lines drop; a curly bracket ANYWHERE drops the page; lorem-ipsum
    and thin (<5-sentence) pages drop entirely; NULL behaves as
    empty."""
    from pyspark.sql import functions as F

    from tableone_pyspark_spark.functions.text import c4_clean

    good_page = "\n".join([
        "This is a proper first sentence.",
        "Short one.",                      # < 3 words -> line drops
        "Click here",                      # no terminal punct -> drops
        "Enable javascript to continue reading this page.",  # drops
        "Here is another full sentence!",
        'She said "it ends with a quote."',
        "And a third sentence arrives here?",
        "A fourth one rounds things out.",
        "Finally the fifth sentence lands.",
    ])
    brace_page = good_page + "\nbody { margin: 0; } is not prose."
    lorem_page = "Lorem ipsum dolor sit amet. " * 10
    thin_page = "\n".join([
        "Only four sentences live here today.",
        "That is sentence number two right now.",
        "Here comes the third full sentence.",
        "The fourth one is the last sadly.",
    ])
    rows = [(1, good_page), (2, lorem_page), (3, thin_page), (4, None),
            (5, brace_page)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r["c"]
        for r in df.select("id", c4_clean(F.col("text")).alias("c")).collect()
    }
    g = out[1]
    assert not g["drop"]
    assert g["n_lines"] == 9 and g["n_kept"] == 6
    kept_lines = g["text"].split("\n")
    assert kept_lines[0] == "This is a proper first sentence."
    assert kept_lines[1] == "Here is another full sentence!"
    assert 'quote."' in kept_lines[2]
    assert out[2]["drop"] and out[2]["text"] == "" and out[2]["n_kept"] == 0
    assert out[3]["drop"]       # 4 sentences < 5
    assert out[4]["drop"] and out[4]["n_lines"] == 1
    assert out[5]["drop"]       # brace ANYWHERE drops the page


def test_c4_clean_tab_separated_words_count(spark):
    """Word counting uses the module's WORD_RE (tabs separate words) —
    a tab-separated 4-word line must survive the >=3-words rule."""
    from pyspark.sql import functions as F

    from tableone_pyspark_spark.functions.text import c4_clean

    page = "\n".join([
        "one\ttwo\tthree\tfour.",
        "Sentence two stands here proudly.",
        "Sentence three stands here proudly.",
        "Sentence four stands here proudly.",
        "Sentence five stands here proudly.",
    ])
    df = spark.createDataFrame([(1, page)], "id long, text string")
    c = df.select(c4_clean(F.col("text")).alias("c")).collect()[0]["c"]
    assert not c["drop"] and c["n_kept"] == 5


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae 2021 A1.1) — r7
# ---------------------------------------------------------------------------


def _gq(spark, texts, **kw):
    from tableone_pyspark_spark.functions.text import gopher_quality

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = df.select("id", gopher_quality(F.col("text"), **kw).alias("g")).collect()
    return {r["id"]: r["g"] for r in rows}


def test_gopher_each_rule_trips_independently(spark):
    base_words = ("the data that we have built works well with care and " * 8).split()
    good = " ".join(base_words)  # 88 words, stopword-rich, alphabetic
    texts = [
        good,                                    # 0: keeps
        "the of and " * 4,                       # 1: too few words
        " ".join(["supercalifragilistic"] * 60), # 2: mean word len > 10
        good + " " + "#" * 1,                    # 3: one hash is fine
        good + " " + " ".join(["#"] * 30),       # 4: hash ratio > 0.1
        good + (" word..." * 40),                # 5: ellipsis ratio > 0.1
        "\n".join(["• " + good] * 10),           # 6: every line bulleted
        good.replace("the", "123").replace("that", "456")
        .replace("have", "789").replace("with", "000")
        .replace("and", "111"),                  # 7: no stop words
        " ".join(["12345"] * 80),                # 8: alpha fraction 0
        None,                                    # 9: NULL -> drop
    ]
    g = _gq(spark, texts)
    assert g[0]["keep"] is True
    assert g[0]["n_stop_words"] >= 2 and g[0]["alpha_word_frac"] == 1.0
    assert g[1]["keep"] is False and g[1]["n_words"] < 50
    assert g[2]["keep"] is False and g[2]["mean_word_len"] > 10
    assert g[3]["keep"] is True
    assert g[4]["keep"] is False and g[4]["hash_word_ratio"] > 0.1
    assert g[5]["keep"] is False and g[5]["ellipsis_word_ratio"] > 0.1
    assert g[6]["keep"] is False and g[6]["bullet_line_frac"] == 1.0
    assert g[7]["keep"] is False and g[7]["n_stop_words"] < 2
    assert g[8]["keep"] is False and g[8]["alpha_word_frac"] == 0.0
    assert g[9]["keep"] is False and g[9]["n_words"] == 0


def test_gopher_ellipsis_line_rule_and_unicode_ellipsis(spark):
    base = "the data that we have built works well with care and more words " * 5
    lines_ok = "\n".join([base] * 7 + [base + "…"] * 1)   # 1/8 = 12.5%
    lines_bad = "\n".join([base] * 5 + [base + "..."] * 5)  # 50%
    g = _gq(spark, [lines_ok, lines_bad])
    assert g[0]["keep"] is True and g[0]["ellipsis_line_frac"] == 0.125
    assert g[1]["keep"] is False and g[1]["ellipsis_line_frac"] == 0.5


def test_gopher_stop_word_boundaries(spark):
    # 'theory' must not count as 'the'; punctuation-attached forms do
    base = "theory analysis berth toward offer " * 20
    g0 = _gq(spark, [base])[0]
    assert g0["n_stop_words"] == 0 and g0["keep"] is False
    withstops = base + " the, cat sat. that!"
    g1 = _gq(spark, [withstops])[0]
    assert g1["n_stop_words"] == 2


def test_gopher_thresholds_are_parameters(spark):
    short = "the cat and that dog have fun with it here now so be it"
    g = _gq(spark, [short], min_words=5)[0]
    assert g["keep"] is True and g["n_words"] == 14


# ---------------------------------------------------------------------------
# Gopher repetition rules (Rae 2021 A1.1) — r7
# ---------------------------------------------------------------------------


def _grp(spark, texts, **kw):
    from tableone_pyspark_spark.functions.text import gopher_repetition_profile

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    return {
        r["id"]: r
        for r in gopher_repetition_profile(df, "id", "text", **kw).collect()
    }


def test_gopher_repetition_line_and_para_rules(spark):
    clean = "\n".join(
        " ".join(f"w{r}x{c}" for c in range(12)) for r in range(6)
    )  # 72 distinct words: no rule trips
    dup_lines = "spam line\nspam line\nspam line\nunique longer line here"
    dup_paras = "para one here\n\npara one here\n\nother"
    g = _grp(spark, [clean, dup_lines, dup_paras, None, ""])
    assert g[0]["keep"] is True and g[0]["dup_line_frac"] == 0.0
    # 3 'spam line' -> 2 beyond-first of 4 lines
    assert g[1]["dup_line_frac"] == pytest.approx(0.5)
    chars = 3 * len("spam line") + len("unique longer line here")
    assert g[1]["dup_line_char_frac"] == pytest.approx(
        2 * len("spam line") / chars
    )
    assert g[1]["keep"] is False
    assert g[2]["dup_para_frac"] == pytest.approx(1 / 3)
    assert g[2]["keep"] is False
    assert g[3]["keep"] is True and g[3]["dup_line_frac"] == 0.0  # NULL
    assert g[4]["keep"] is True  # empty: vacuous (gate n_words upstream)


def test_gopher_repetition_top_and_dup_gram_rules(spark):
    # 'one two three four five six' * 10: every 2-gram dominated by
    # repetition; the dup-5gram coverage is the whole text
    loop = ("one two three four five six " * 10).strip()
    varied = " ".join(f"w{i:03d}" for i in range(80))
    g = _grp(spark, [loop, varied])
    assert g[0]["keep"] is False
    assert g[0]["dup_5gram_char_frac"] == pytest.approx(1.0)  # full cover
    assert g[0]["dup_10gram_char_frac"] == pytest.approx(1.0)
    # top-2gram: five grams tie at count 10; the lexicographic
    # tie-break picks 'five six' (7 word chars) over 220 total
    wchars = sum(len(w) for w in loop.split())
    assert g[0]["top_2gram_char_frac"] == pytest.approx(10 * 7 / wchars)
    assert g[1]["keep"] is True
    assert g[1]["dup_5gram_char_frac"] == 0.0
    assert g[1]["top_2gram_char_frac"] == pytest.approx(8 / (80 * 4))


def test_gopher_repetition_overlap_union_not_double_count(spark):
    # 'a b c d e a b c d e a b c d e' (k=5 gram 'a b c d e' x3, the
    # overlapping duplicated grams cover EVERY word exactly once)
    txt = " ".join(["a b c d e"] * 3)
    g = _grp(spark, [txt])[0]
    assert g["dup_5gram_char_frac"] == pytest.approx(1.0)


def test_gopher_repetition_differential_random(spark):
    # independent reference computation on random loopy corpora
    import re
    from collections import Counter

    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(12)]
    texts = []
    for _ in range(25):
        n = int(rng.integers(5, 120))
        words = list(rng.choice(vocab, size=n))
        if rng.random() < 0.5:  # inject a loop
            seg = words[: int(rng.integers(3, 12))]
            words = words + seg * int(rng.integers(1, 4))
        texts.append(" ".join(words))
    g = _grp(spark, texts)
    for i, txt in enumerate(texts):
        ws = txt.split()
        wchars = sum(len(w) for w in ws)
        for n in (5, 8, 10):
            grams = list(zip(*[ws[j:] for j in range(n)]))
            c = Counter(grams)
            covered = set()
            for j, gr in enumerate(grams):
                if c[gr] >= 2:
                    covered.update(range(j, j + n))
            exp = (
                sum(len(ws[j]) for j in covered) / wchars if grams else 0.0
            )
            assert g[i][f"dup_{n}gram_char_frac"] == pytest.approx(exp), (i, n)
        for n in (2, 4):
            grams = list(zip(*[ws[j:] for j in range(n)]))
            if grams:
                c = Counter(grams)
                top = max(c.values())
                gsel = min(gr for gr, k in c.items() if k == top)
                exp = top * sum(len(w) for w in gsel) / wchars
                assert g[i][f"top_{n}gram_char_frac"] == pytest.approx(exp)


def test_gopher_repetition_thresholds_parameterized(spark):
    loop = ("one two three four five six " * 10).strip()
    g = _grp(spark, [loop], thresholds={
        k: 1.0 for k in (
            "top_2gram_char_frac", "top_3gram_char_frac",
            "top_4gram_char_frac", "dup_5gram_char_frac",
            "dup_6gram_char_frac", "dup_7gram_char_frac",
            "dup_8gram_char_frac", "dup_9gram_char_frac",
            "dup_10gram_char_frac",
        )
    })[0]
    assert g["keep"] is True
    with pytest.raises(ValueError, match="unknown thresholds"):
        _grp(spark, [loop], thresholds={"nope": 0.5})


def test_semantic_overlap_brute_exact(spark):
    """Embedding-space decontam: planted near-duplicates of benchmark
    vectors are flagged with the right hit counts and max cosine; an
    orthogonal vector is not; numpy recomputes every reported value."""
    import numpy as np

    from tableone_pyspark_spark.operators.decontam import semantic_overlap

    rng = np.random.default_rng(13)
    B = rng.normal(size=(6, 64))
    # train 0/1 = noisy copies of bench 0 (paraphrase stand-ins),
    # train 2 = exact copy of bench 3, train 3.. = fresh random
    T = rng.normal(size=(8, 64))
    T[0] = B[0] + 0.05 * rng.normal(size=64)
    T[1] = B[0] + 0.08 * rng.normal(size=64)
    T[2] = 2.5 * B[3]  # scale-invariant under cosine
    train = spark.createDataFrame(
        [(i, [float(x) for x in T[i]]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(i, [float(x) for x in B[i]]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["id"]: (r["n_bench_hits"], r["max_cos"])
        for r in semantic_overlap(
            train, bench, threshold=0.9, strategy="brute"
        ).collect()
    }
    Tn = T / np.linalg.norm(T, axis=1, keepdims=True)
    Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
    cos = Tn @ Bn.T
    expect = {}
    for i in range(8):
        hits = cos[i] >= 0.9
        if hits.any():
            expect[i] = (int(hits.sum()), float(cos[i][hits].max()))
    assert set(got) == set(expect) == {0, 1, 2}
    for i in expect:
        assert got[i][0] == expect[i][0]
        assert abs(got[i][1] - expect[i][1]) < 1e-9
    assert got[2][1] > 0.999999  # the exact copy


def test_semantic_overlap_lsh_agrees_on_high_cosine(spark):
    """The LSH strategy finds the same contaminated ids as brute in
    the high-cosine regime it exists for (multi-table SRP recall)."""
    import numpy as np

    from tableone_pyspark_spark.operators.decontam import semantic_overlap

    rng = np.random.default_rng(29)
    B = rng.normal(size=(5, 64))
    T = rng.normal(size=(30, 64))
    for i in range(5):  # plant one near-copy per bench vector
        T[i] = B[i] + 0.02 * rng.normal(size=64)
    train = spark.createDataFrame(
        [(i, [float(x) for x in T[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(1000 + i, [float(x) for x in B[i]]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    brute = {
        r["id"] for r in semantic_overlap(
            train, bench, threshold=0.95, strategy="brute"
        ).collect()
    }
    lsh = {
        r["id"] for r in semantic_overlap(
            train, bench, threshold=0.95, strategy="lsh"
        ).collect()
    }
    assert brute == set(range(5))
    assert lsh == brute  # every planted pair collides in >=1 table
    import pytest as _pytest

    with _pytest.raises(ValueError, match="strategy"):
        semantic_overlap(train, bench, strategy="nope")


def test_semantic_overlap_brute_plan_broadcasts_bench(spark):
    """Scale-shape pin for the r10-graded brute arm: the benchmark
    side rides a broadcast (BroadcastNestedLoopJoin) — the training
    corpus is never shuffled for the pairing."""
    from tableone_pyspark_spark.operators.decontam import semantic_overlap

    vecs = [(i, [float((i * 7 + j) % 13) for j in range(8)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = semantic_overlap(
        df.where("vec_id % 10 != 0"),
        df.where("vec_id % 10 = 0"),
        threshold=0.0,
        strategy="brute",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_resample_interpolate(spark):
    """Grid resampling (X119): exact linear interpolation vs a python
    twin, coincident-tick exactness at BOTH range ends, tie averaging,
    the max-gap NULL policy, NULL/NaN drops, and validation."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from tableone_pyspark_spark.functions.events import resample_interpolate

    t0 = 1_699_999_980  # multiple of 60: observations sit ON ticks
    rows = [
        # key a: irregular points, incl. a duplicate instant (avg) and
        # a long 10-minute gap
        ("a", t0, 10.0),
        ("a", t0, 20.0),            # tie at t0 -> avg 15.0
        ("a", t0 + 90, 30.0),
        ("a", t0 + 120, 40.0),
        ("a", t0 + 720, 100.0),     # 600 s gap from t0+120
        # key b: single observation -> one-tick grid, value exact
        ("b", t0 + 60, 7.0),
        # dropped rows
        (None, t0, 1.0), ("a", None, 1.0), ("a", t0 + 30, None),
        ("a", t0 + 31, float("nan")),
    ]
    df = spark.createDataFrame(rows, "k string, ts long, v double").select(
        "k", F.timestamp_seconds("ts").alias("ts"), "v"
    )

    def run(**kw):
        out = resample_interpolate(df, "k", "ts", "v", 60, **kw)
        return {
            (r["k"], int(r["ts"].timestamp())): r["v"]
            for r in out.collect()
        }

    got = run()
    # twin: observations for a after cleaning
    obs = [(t0, 15.0), (t0 + 90, 30.0), (t0 + 120, 40.0), (t0 + 720, 100.0)]

    def lin(t):
        for (ta, va), (tb, vb) in zip(obs, obs[1:]):
            if ta <= t <= tb:
                return va if ta == tb else va + (vb - va) * (t - ta) / (tb - ta)
        raise AssertionError(t)

    a_ticks = [t0 + 60 * i for i in range(0, 13)]  # t0 .. t0+720
    assert {k for k in got if k[0] == "a"} == {("a", t) for t in a_ticks}
    for t in a_ticks:
        assert got[("a", t)] == _pytest.approx(lin(t), abs=1e-12), t
    # exact at coincident ticks incl. both range ends
    assert got[("a", t0)] == 15.0
    assert got[("a", t0 + 720)] == 100.0
    assert got[("a", t0 + 120)] == 40.0
    # single-observation key: its one tick carries the value exactly
    assert got[("b", t0 + 60)] == 7.0
    # max_gap: ticks strictly inside the 600 s outage go NULL; the
    # endpoints are observations, the gap span is (t0+120, t0+720)
    gapped = run(max_gap_seconds=300)
    for t in a_ticks:
        inside_outage = t0 + 120 < t < t0 + 720
        if inside_outage:
            assert gapped[("a", t)] is None, t
        else:
            assert gapped[("a", t)] == _pytest.approx(lin(t), abs=1e-12), t
    with _pytest.raises(ValueError, match="interval_seconds"):
        resample_interpolate(df, "k", "ts", "v", 0)
    with _pytest.raises(ValueError, match="max_gap_seconds"):
        resample_interpolate(df, "k", "ts", "v", 60, max_gap_seconds=0)


def test_resample_interpolate_subsecond(spark):
    """Sub-second observations interpolate on true fractional seconds
    (unix_timestamp truncation would merge 0.0s and 0.9s into a fake
    tie — self-review r10)."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from tableone_pyspark_spark.functions.events import resample_interpolate

    t0 = 1_699_999_980
    df = spark.createDataFrame(
        [("s", t0 + 0.0, 0.0), ("s", t0 + 0.9, 100.0), ("s", t0 + 60.0, 100.0)],
        "k string, ts double, v double",
    ).select("k", F.timestamp_seconds("ts").alias("ts"), "v")
    out = {
        int(r["ts"].timestamp()): r["v"]
        for r in resample_interpolate(df, "k", "ts", "v", 60).collect()
    }
    # the t0 tick coincides with the 0.0 observation, NOT a tie-average
    assert out[t0] == 0.0
    assert out[t0 + 60] == 100.0
