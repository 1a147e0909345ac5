#!/usr/bin/env python
"""10x-union scaling spot-checks for the round-9 additions: the
scale-safe ccnet_buckets sketch mode (the VERDICT r8 weak mark), the
dHash pigeonhole near-dup join, and the streaming-drift batch twin.
Protocol identical to earlier rounds: sf0.1 input, local[32], the
operator at 1x and at the input unioned 10x (ids re-keyed so nothing
collapses), wall-clock per run (one session warm-up, then timed
single runs — knee probes, not medians).

Expected shapes:
  - ccnet_buckets(mode="sketch") is one partial-aggregated
    percentile_approx pass + a broadcast compare -> ~linear, and the
    plan carries NO window/global sort at either scale (asserted);
  - ccnet_buckets(mode="rank") is the single-partition percent_rank
    reference — timed for contrast, expected superlinear-ish wall
    clock concentration on one task (kept for bounded frames only);
  - phash_neardup_pairs shuffles 63-bit signatures into pigeonhole
    chunk buckets -> candidate work scales with bucket occupancy;
  - streaming_drift's batch twin is ONE windowed agg with k literal
    counters -> ~linear scan, state independent of row count.
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
        .appName("scale_check_r9")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tableone_pyspark_spark.operators.lm import ccnet_buckets
    from tableone_pyspark_spark.operators.multimodal import phash_neardup_pairs
    from tableone_pyspark_spark.streaming.stream_stats import streaming_drift

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    events = spark.read.parquet(f"{SF}/events.parquet")

    # a scored (id, ppl) frame shaped like lm_perplexity's output; the
    # score itself is irrelevant to the bucketing plan shape
    scored1 = docs.select(
        F.col("doc_id").alias("id"),
        (F.length("text") % 997 / 10.0).alias("ppl"),
    )
    scored10 = x10(scored1, "id")

    # warm-up
    ccnet_buckets(scored1).count()

    for label, frame in (("1x", scored1), ("10x", scored10)):
        plan = (
            ccnet_buckets(frame)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan, f"sketch mode grew a window at {label}"
        timed(f"ccnet_buckets sketch {label}", lambda f=frame: ccnet_buckets(f).count())
    for label, frame in (("1x", scored1), ("10x", scored10)):
        timed(
            f"ccnet_buckets rank   {label} (reference, single-task sort)",
            lambda f=frame: ccnet_buckets(f, mode="rank").count(),
        )

    payloads1 = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    payloads10 = x10(payloads1, "doc_id")
    phash_neardup_pairs(payloads1, "doc_id", "payload", max_hamming=8).count()
    timed(
        "phash_neardup 1x",
        lambda: phash_neardup_pairs(
            payloads1, "doc_id", "payload", max_hamming=8
        ).count(),
    )
    # NOTE the 10x corpus repeats every payload 10x under new ids, so
    # each duplicate family grows 10x -> the TRUE pair count grows
    # ~100x (quadratic in family size, the real semantics of
    # duplicating a corpus); candidate generation must still be
    # bucket-bounded, not all-pairs
    timed(
        "phash_neardup 10x (pair count ~100x by construction)",
        lambda: phash_neardup_pairs(
            payloads10, "doc_id", "payload", max_hamming=8
        ).count(),
    )

    drift_args = dict(
        ref_edges=[10.0, 25.0, 50.0, 100.0],
        ref_probs=[0.4, 0.3, 0.2, 0.05, 0.05],
        window="6 hours",
    )
    ev1 = events.select("event_id", "ts", "value")
    ev10 = x10(ev1, "event_id").select("ts", "value")
    ev1 = ev1.select("ts", "value")
    streaming_drift(ev1, "value", **drift_args).count()
    timed(
        "streaming_drift batch twin 1x",
        lambda: streaming_drift(ev1, "value", **drift_args).count(),
    )
    timed(
        "streaming_drift batch twin 10x",
        lambda: streaming_drift(ev10, "value", **drift_args).count(),
    )


if __name__ == "__main__":
    main()


def web_toolkit_probe() -> None:
    """Appended late-r9: the WARC → html_extract ingest path at 1x vs
    10x archives (rebalance() spreads the narrow-and-heavy archive
    rows; the walk + extraction are row-local, so the knee should be
    ~linear). Run standalone: python -c "import scripts.scale_check_r9
    as s; s.web_toolkit_probe()" or via __main__ below."""
    from pyspark.sql import SparkSession

    from tableone_pyspark_spark.functions.html import html_extract
    from tableone_pyspark_spark.functions.warc import (
        encode_warc,
        http_response,
        warc_records,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    page = (
        b"<html><head><title>T</title><script>if (a<b) x();</script>"
        b"</head><body>" + b"<p>para text here</p>" * 40 + b"</body></html>"
    )
    archive = encode_warc(
        [("response", f"http://e.com/{k}", http_response(page)) for k in range(100)],
        gzip_members=True,
    )
    def frame(n_archives):
        return spark.createDataFrame(
            [(i, bytearray(archive)) for i in range(n_archives)],
            "id long, payload binary",
        )

    def run(df):
        recs = warc_records(df, "id", "payload")
        return recs.select(
            html_extract(F.decode("body", "UTF-8")).alias("e")
        ).where(F.col("e.text").isNotNull()).count()

    run(frame(4))  # warm-up
    timed("warc→html 1x (8 archives, 800 pages)", lambda: run(frame(8)))
    timed("warc→html 10x (80 archives, 8000 pages)", lambda: run(frame(80)))


if __name__ == "__main__" and __import__("os").environ.get("WEB_PROBE"):
    web_toolkit_probe()
