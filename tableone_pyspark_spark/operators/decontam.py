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
