"""Benchmark decontamination: drop training docs that overlap eval sets.

A training corpus must not contain the benchmarks it will be evaluated
on. The standard test (GPT-3 appendix C, PaLM §9) is n-gram overlap:
a training document is contaminated if it shares at least
``min_shared`` word n-grams with any benchmark document.

Shape for 100 TB: shingle both sides with the same normalized word
n-grams the dedup family uses, then equi-join on the shingle. The
benchmark side is tiny (thousands of eval docs vs billions of training
docs), so its shingle set is broadcast — the scan-side join filters
training shingles map-side with zero shuffle of the corpus; only the
matched (doc_id, shingle) pairs — a vanishingly small fraction —
reach the one aggregation shuffle that counts distinct shared shingles
per training doc.

North-star extension per BASELINE.json; no counterpart in the
reference (tableone_pyspark.py has no text operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles


def benchmark_overlap(
    train: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per training doc, the number of distinct word n-grams shared
    with the benchmark corpus: ``(id, n_shared)``, rows only for docs
    with at least one shared shingle.

    Benchmark shingles are deduped across benchmark docs before the
    join (a gram in 50 eval docs must count once, and the dedup keeps
    the broadcast small).
    """
    t = word_shingles(train, text_col, id_col, n=n)
    b = word_shingles(bench, text_col, id_col, n=n).select("shingle").distinct()
    if broadcast_bench:
        b = F.broadcast(b)
    return (
        t.join(b, "shingle")
        .groupBy("id")
        .agg(F.count("*").alias("n_shared"))
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_shared: int = 1,
) -> DataFrame:
    """Training rows with fewer than ``min_shared`` shared n-grams.

    Left-anti join on the contaminated id set — the corpus itself is
    never shuffled, only its id column joins against the (small)
    contaminated list.
    """
    hits = benchmark_overlap(train, bench, text_col, id_col, n=n).where(
        F.col("n_shared") >= min_shared
    )
    return train.join(
        F.broadcast(hits.select(F.col("id").alias(id_col))), id_col, "left_anti"
    )


def semantic_overlap(
    train: DataFrame,
    bench: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "auto",
    dim: int = 64,
    tables: int = 8,
    planes: int = 4,
    brute_limit: int = 100_000,
) -> DataFrame:
    """Embedding-space contamination: per TRAINING vector, how many
    BENCHMARK vectors sit within cosine ``threshold`` and the max such
    cosine — the paraphrase-robust check :func:`benchmark_overlap`'s
    n-grams miss (a reworded eval question shares no 3-grams but sits
    at cosine ≈ 0.97; the Llama/Phi decontam reports pair both
    signals). Returns ``(id, n_bench_hits, max_cos)``, rows only for
    contaminated training docs — feed the id set to the same
    ``left_anti`` drop :func:`decontaminate` uses.

    Strategies (the :func:`~tableone_pyspark_spark.operators.\
similarity.cosine_neardup_pairs` pattern, cross-corpus):

    * ``"brute"`` — the benchmark side broadcasts (eval sets are
      thousands of rows vs billions of training docs) and every
      (train, bench) pair is scored with the in-JVM fold dot — exact,
      cost O(|train|·|bench|) dots, all row-local, zero shuffle of
      the training corpus.
    * ``"lsh"`` — both sides bucket through the SAME memoized SRP
      index family; only (table, bucket) collisions are scored. The
      100 TB path: work scales with bucket occupancy; high-cosine
      pairs — the contamination regime — collide with probability
      1−(1−(1−θ/π)^planes)^tables per pair (the operator exists for
      θ ≈ 0.2 rad, where that is ≈ 1).
    * ``"auto"`` (default) — one metadata-cheap count picks brute up
      to ``brute_limit`` training rows, LSH above.
    """
    from tableone_pyspark_spark.core.memo import memo, memo_key
    from tableone_pyspark_spark.operators.similarity import (
        _normed_corpus,
        _srp_bucket_index,
        dot,
    )

    if strategy not in ("auto", "brute", "lsh"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "auto":
        n_t = memo("corpus_count", memo_key(train), lambda: train.count())
        strategy = "brute" if n_t <= brute_limit else "lsh"
    tn = _normed_corpus(train, id_col, vec_col, False).select(
        F.col("_id").alias("id"), F.col("n_vec").alias("tv")
    )
    bn = _normed_corpus(bench, id_col, vec_col, False).select(
        F.col("_id").alias("bid"), F.col("n_vec").alias("bv")
    )
    if strategy == "brute":
        pairs = tn.crossJoin(F.broadcast(bn))
    else:
        tb = _srp_bucket_index(
            train, id_col, vec_col, dim, tables, planes, False, True
        ).select(F.col("_id").alias("id"), "table", "bucket")
        bb = _srp_bucket_index(
            bench, id_col, vec_col, dim, tables, planes, False, True
        ).select(F.col("_id").alias("bid"), "table", "bucket")
        cand = (
            tb.join(F.broadcast(bb), ["table", "bucket"])
            .select("id", "bid")
            .distinct()
        )
        pairs = cand.join(tn, "id").join(F.broadcast(bn), "bid")
    scored = pairs.select(
        "id", dot(F.col("tv"), F.col("bv")).alias("cos")
    ).where(F.col("cos") >= F.lit(float(threshold)))
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bench_hits"),
        F.max("cos").alias("max_cos"),
    )
