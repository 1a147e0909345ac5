#!/usr/bin/env python
"""10x-union scaling spot-checks for the round-7 additions: FLAC
synth+decode, duplicate-span removal (incl. a pathological
self-repetition regime), and DSIR weights. Protocol identical to
earlier rounds: sf0.1 input, local[32], the operator at 1x and at the
input unioned 10x (ids re-keyed so unions don't collapse), wall-clock
per run (one session warm-up, then timed single runs — knee probes,
not medians).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def x10(df: DataFrame, id_col: str) -> DataFrame:
    """10x union with DISTINCT ids per copy (k*1e9 offset) — span/DSIR
    dedup semantics would otherwise collapse identical ids."""
    parts = [
        df.withColumn(id_col, F.col(id_col) + F.lit(k * 1_000_000_000))
        for k in range(10)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def timed(label: str, fn) -> None:
    t0 = time.time()
    n = fn()
    print(f"{label}: {time.time() - t0:.2f}s ({n} rows)", flush=True)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("scale_check_r7")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tableone_pyspark_spark.operators.dedup import remove_duplicate_spans
    from tableone_pyspark_spark.operators.dsir import (
        fit_hashed_ngram_model,
        importance_weights,
    )
    from tableone_pyspark_spark.operators.multimodal import (
        audio_metadata,
        synthesize_audio_corpus,
    )
    from tableone_pyspark_spark.operators.sampling import split_bucket

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    d.count()  # session warm-up

    # ---- FLAC/WAV synth + decode (all-FLAC ids via *3 so every row
    # takes the compressed path) --------------------------------------
    d3 = d.withColumn("doc_id", F.col("doc_id") * 3)
    timed(
        "flac synth+decode 1x",
        lambda: audio_metadata(
            synthesize_audio_corpus(d3, "doc_id", "text"), "id", "payload"
        ).count(),
    )
    timed(
        "flac synth+decode 10x",
        lambda: audio_metadata(
            synthesize_audio_corpus(x10(d3, "doc_id"), "doc_id", "text"),
            "id",
            "payload",
        ).count(),
    )

    # ---- duplicate-span removal ------------------------------------
    timed(
        "span_dedup k=10 1x",
        lambda: remove_duplicate_spans(d, "text", "doc_id", k=10).count(),
    )
    timed(
        "span_dedup k=10 10x (distinct ids: every copy is a cross-doc dup)",
        lambda: remove_duplicate_spans(
            x10(d, "doc_id"), "text", "doc_id", k=10
        ).count(),
    )
    # pathological: one 128k-token doc that is one phrase repeated —
    # every window duplicates every other; the gaps-and-islands merge
    # must stay linear (no per-doc quadratic)
    patho = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog " * 16_000)],
        ["doc_id", "text"],
    )
    timed(
        "span_dedup pathological 128k-token self-repeating doc",
        lambda: remove_duplicate_spans(patho, "text", "doc_id", k=10).count(),
    )

    # ---- DSIR weights ------------------------------------------------
    def dsir(frame: DataFrame) -> int:
        tgt = frame.where(split_bucket(F.col("doc_id"), "dsir-target") < 2000)
        tm = fit_hashed_ngram_model(tgt, "text", "doc_id")
        rm = fit_hashed_ngram_model(frame, "text", "doc_id")
        return importance_weights(frame, tm, rm, "text", "doc_id").count()

    timed("dsir_weights 1x", lambda: dsir(d))
    timed("dsir_weights 10x", lambda: dsir(x10(d, "doc_id")))

    spark.stop()


if __name__ == "__main__":
    main()
