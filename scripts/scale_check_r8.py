#!/usr/bin/env python
"""10x-union scaling spot-checks for the round-8 additions: PQ encode
+ ADC search, IVFPQ search, and the streaming-Bloom batch twin of the
verdict arithmetic. Protocol identical to earlier rounds: sf0.1
input, local[32], the operator at 1x and at the input unioned 10x
(ids re-keyed so nothing collapses), wall-clock per run (one session
warm-up, then timed single runs — knee probes, not medians).

Expected shapes:
  - pq_encode is a row-local projection -> ~linear in corpus size;
  - pq_topk / ivfpq_topk scan CODES with per-query LUTs -> ~linear,
    and the trained model is shared (memoized on the 1x plan, the
    build-once FAISS pattern — training cost excluded by design);
  - the Bloom probe is one vectorized gather per batch -> ~linear,
    independent of the seen-corpus size.
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
        .appName("scale_check_r8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tableone_pyspark_spark.operators.bloom import build_bloom, bloom_probe
    from tableone_pyspark_spark.operators.pq import (
        ivfpq_topk,
        pq_encode,
        pq_topk,
        train_ivfpq,
        train_pq,
    )

    e1 = spark.read.parquet(f"{SF}/embeddings.parquet")
    e10 = x10(e1, "vec_id")
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # train once on the 1x corpus (the FAISS build-once model); the
    # SAME artifacts search both scales — exactly the production shape
    cb = train_pq(e1, m=4, n_codes=16)
    ix = train_ivfpq(e1, n_centroids=16, m=4, n_codes=16)

    # session warm-up (codegen + python workers)
    pq_encode(e1, cb).count()

    timed("pq_encode 1x", lambda: pq_encode(e1, cb).count())
    timed("pq_encode 10x", lambda: pq_encode(e10, cb).count())
    timed("pq_topk 1x", lambda: pq_topk(e1, cb, n_queries=10, k=5).count())
    timed("pq_topk 10x", lambda: pq_topk(e10, cb, n_queries=10, k=5).count())
    timed(
        "ivfpq_topk 1x",
        lambda: ivfpq_topk(e1, ix, n_probe=4, n_queries=10, k=5).count(),
    )
    timed(
        "ivfpq_topk 10x",
        lambda: ivfpq_topk(e10, ix, n_probe=4, n_queries=10, k=5).count(),
    )

    # Bloom probe against a FIXED filter: probe cost must scale with
    # the PROBE side only (the artifact is constant-size by design)
    blm = build_bloom(docs, "text", m_bits=1 << 22, n_hashes=5, normalize=True)
    d10 = x10(docs, "doc_id")
    timed(
        "bloom_probe 1x",
        lambda: bloom_probe(docs, blm, "text", "doc_id").count(),
    )
    timed(
        "bloom_probe 10x",
        lambda: bloom_probe(d10, blm, "text", "doc_id").count(),
    )


if __name__ == "__main__":
    main()
