#!/usr/bin/env python
"""10x-union scaling spot-checks for round 6 (VERDICT r5 ask #3):
winsorize_stats' capped percentile path on a near-unique column.
Protocol identical to earlier rounds: sf0.1 input, local[32], the
operator at 1x and at the input unioned 10x, wall-clock per run (one
session warm-up, then timed single runs — knee probes, not medians).

The interesting contrast at 10x (6M near-unique l_extendedprice
values) is capped (percentile_approx sketch, bounded buffer) vs the
old unbounded exact percentile (sort-based buffer holding every
distinct value in one final merge).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, SparkSession

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def x10(df: DataFrame) -> DataFrame:
    out = df
    for _ in range(9):
        out = out.union(df)
    return out


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("scale_check_r6")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tableone_pyspark_spark.operators.stats import winsorize_stats

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n1 = li.count()
    print(f"lineitem={n1} (sf dir {SF})")

    def timed(label: str, fn) -> None:
        t0 = time.perf_counter()
        rows = fn().collect()
        print(f"{label}: {time.perf_counter() - t0:.2f} s  -> {rows[0]}")

    # warm-up
    winsorize_stats(li, "l_extendedprice").collect()

    timed("winsorize 1x (exact path, 600k rows)",
          lambda: winsorize_stats(li, "l_extendedprice"))
    big = x10(li)
    timed("winsorize 10x capped (approx path, 6M rows, cap=1M)",
          lambda: winsorize_stats(big, "l_extendedprice"))
    timed("winsorize 10x UNCAPPED exact (old behavior, cap=100M)",
          lambda: winsorize_stats(big, "l_extendedprice", exact_cap=100_000_000))

    # indexed incremental dedup: build once (the amortized cost), then
    # per-batch queries at 1x and 10x-fresh-docs scale — the contrast
    # vs incremental_dedup is that the seen corpus is NEVER re-read
    import time as _t

    from tableone_pyspark_spark.operators.terms import (
        build_dedup_index,
        incremental_dedup,
        incremental_dedup_indexed,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    seen = docs.where("doc_id < 2500")
    new = docs.where("doc_id >= 2500")
    t0 = _t.perf_counter()
    build_dedup_index(
        seen, "text", "doc_id", "t_scale_idx",
        "/root/repo/spark-warehouse/t_scale_idx",
    )
    print(f"index build (one-time, 2.5k docs): {_t.perf_counter() - t0:.2f} s")
    timed("indexed dedup 1x batch (2.5k new docs)",
          lambda: incremental_dedup_indexed(new, "t_scale_idx", "text", "doc_id"))
    timed("indexed dedup 10x batch (25k new docs)",
          lambda: incremental_dedup_indexed(x10(new), "t_scale_idx", "text", "doc_id"))
    from tableone_pyspark_spark.core.memo import memo_clear

    memo_clear("winnow_fps")  # fair contrast: no cached fingerprint builds
    timed("in-session dedup 1x batch (re-fingerprints seen corpus too)",
          lambda: incremental_dedup(new, seen, "text", "doc_id"))
    spark.sql("DROP TABLE IF EXISTS t_scale_idx")

    # GIF synth+decode (r6 codec): like the PNG row in BASELINE.md —
    # expect linear in payload count (Arrow-batched Python LZW
    # dominates), shuffle-free plan, so 100x just scales executor CPU
    from pyspark.sql import functions as F

    from tableone_pyspark_spark.operators.multimodal import (
        image_metadata,
        synthesize_gif_corpus,
    )

    d = docs.where(F.length("text") > 0).select("doc_id", "text")
    def gif_pipe(src):
        return image_metadata(
            synthesize_gif_corpus(src, "doc_id", "text"), "id", "payload"
        ).agg(F.sum("width").alias("sw"))
    timed("gif synth+decode 1x (5k payloads)", lambda: gif_pipe(d))
    timed("gif synth+decode 10x (50k payloads)",
          lambda: gif_pipe(x10(d).withColumn(
              "doc_id", F.monotonically_increasing_id())))

    # interpolated weighted quartiles (r6): same bucketed prefix-sum
    # job as disc mode — the contrast of interest is interpolated vs
    # disc at 10x on a NEAR-UNIQUE column (6M distinct-ish cells):
    # both must stay on the 256-bucket parallel cumsum, no single-task
    # sort, so the two should cost the same
    from tableone_pyspark_spark import TableOneConfig, tableone

    def t1w(src, mode):
        return tableone(
            src, col_to_strat="l_returnflag",
            cols_to_analyze=["l_extendedprice"], weight_col="l_quantity",
            config=TableOneConfig(quantile_mode=mode),
        )
    timed("weighted tableone 1x disc (600k rows)", lambda: t1w(li, "data"))
    timed("weighted tableone 1x interpolated", lambda: t1w(li, "interpolated"))
    timed("weighted tableone 10x disc (6M rows)", lambda: t1w(big, "data"))
    timed("weighted tableone 10x interpolated", lambda: t1w(big, "interpolated"))

    # bigram-LM perplexity (r6): occurrence-bounded shuffles; sub-linear
    from tableone_pyspark_spark.operators.lm import lm_perplexity, train_bigram_lm
    from tableone_pyspark_spark.operators.sampling import split_bucket

    def lm_pipe(src):
        b = split_bucket(F.col("doc_id"), "lm-v1")
        bg, cx, v = train_bigram_lm(src.where(b < 5000), "text", "doc_id")
        return lm_perplexity(
            src.where(b >= 5000), bg, cx, v, "text", "doc_id"
        ).agg(F.count(F.lit(1)).alias("n"))
    docs10 = x10(docs.select("doc_id", "text"))
    timed("lm_perplexity 1x (5k docs)", lambda: lm_pipe(docs))
    timed("lm_perplexity 10x rows", lambda: lm_pipe(docs10))

    # duplicate-span removal (r6): pathological regime = every doc
    # duplicated 10x (88% of tokens cut) + one book-length straggler
    from tableone_pyspark_spark.operators.dedup import remove_duplicate_spans

    def span_pipe(src, k=20):
        return remove_duplicate_spans(src, "text", "doc_id", k=k).agg(
            F.sum("n_removed").alias("rm")
        )
    big_docs = docs
    for j in range(9):
        big_docs = big_docs.union(
            docs.withColumn("doc_id", F.col("doc_id") + (j + 1) * 1_000_000)
        )
    timed("span dedup 1x (5k docs)", lambda: span_pipe(docs))
    timed("span dedup 10x pathological (50k docs, 10 copies each)",
          lambda: span_pipe(big_docs))
    book = " ".join(f"w{i % 97}x{i % 13}" for i in range(128_000))
    straggler = spark.createDataFrame(
        [(1, book), (2, book)], "doc_id long, text string"
    )
    timed("span dedup book-length straggler (2x 128k-token dup doc, k=50)",
          lambda: span_pipe(straggler, k=50))

    spark.stop()


if __name__ == "__main__":
    main()
