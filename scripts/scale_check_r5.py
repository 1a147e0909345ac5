#!/usr/bin/env python
"""10x-union scaling spot-check for the round-4 operators that have no
BASELINE.md scaling row yet (VERDICT r4 ask #7): paragraph_dedup,
png_decode_stats (synthesize+decode pipeline), salted_collect,
stream_tableone. Protocol identical to the round-1 checks: sf0.1
input, local[32], same operator at 1x and at the input unioned 10x,
wall-clock per run (one warm-up of the session, then timed single
runs — these are knee probes, not medians).
"""

from __future__ import annotations

import functools
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, SparkSession, functions as F

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
        .appName("scale_check_r5")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    events = spark.read.parquet(f"{SF}/events.parquet")
    print(f"docs={docs.count()} events={events.count()} (sf dir {SF})")

    def timed(label: str, fn) -> None:
        t0 = time.perf_counter()
        n = fn()
        print(f"{label}: {time.perf_counter() - t0:.2f} s  ({n} rows)")

    # ---- paragraph_dedup ------------------------------------------------
    from tableone_pyspark_spark.operators.dedup import paragraph_dedup

    def run_pd(src: DataFrame) -> int:
        out = paragraph_dedup(src, "doc_id", "text")
        return out.agg(
            F.count(F.lit(1)), F.sum("n_removed"), F.sum(F.length("text"))
        ).collect()[0][0]

    run_pd(docs)  # warm-up
    timed("paragraph_dedup 1x", lambda: run_pd(docs))
    # pathological 10x: distinct ids, IDENTICAL texts -> every paragraph
    # is corpus-duplicated (count >= 10), i.e. the all-boilerplate
    # regime where the "tiny anti-join side" assumption breaks
    copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"), "text"
        )
        for i in range(10)
    ]
    dup10 = functools.reduce(DataFrame.union, copies)
    timed("paragraph_dedup 10x (pathological all-dup)", lambda: run_pd(dup10))
    # honest 10x: distinct ids, texts salted per copy so the duplicated-
    # paragraph FRACTION stays ~constant (a real 10x corpus)
    salted = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f"\n\nsalt-{i}")).alias("text"),
        )
        for i in range(10)
    ]
    docs10 = functools.reduce(DataFrame.union, salted)
    timed("paragraph_dedup 10x (fresh docs)", lambda: run_pd(docs10))

    # ---- png pipeline (synthesize + decode) -----------------------------
    from tableone_pyspark_spark.operators.multimodal import (
        image_metadata,
        synthesize_png_corpus,
    )

    def run_png(src: DataFrame) -> int:
        d = src.where(F.length("text") > 0).select("doc_id", "text")
        meta = image_metadata(
            synthesize_png_corpus(d, "doc_id", "text", w=16, h=16),
            "id", "payload",
        )
        return meta.agg(F.count(F.lit(1)), F.sum("mean_intensity")).collect()[0][0]

    run_png(docs)
    timed("png synth+decode 1x", lambda: run_png(docs))
    timed("png synth+decode 10x", lambda: run_png(docs10))

    # ---- salted_collect -------------------------------------------------
    from tableone_pyspark_spark.plans.skew import salted_collect_set

    def run_sc(src: DataFrame) -> int:
        agg = salted_collect_set(src, ["user_id"], "event_type", n_salt=16)
        return agg.select("user_id", F.explode("values")).count()

    run_sc(events)
    timed("salted_collect 1x", lambda: run_sc(events))
    timed("salted_collect 10x", lambda: run_sc(x10(events)))

    # ---- stream_tableone (availableNow micro-batch) ---------------------
    from tableone_pyspark_spark.streaming.stream_stats import streaming_tableone

    from tableone_pyspark_spark.sources.testdata import events_stream

    def run_st(path_mult: int, name: str) -> int:
        stream = events_stream(spark, SF)
        src = stream
        # scale the STREAM by exploding each event path_mult times with
        # jittered user segment (files can't be unioned in readStream
        # from the same path; explode gives the same state/row load)
        if path_mult > 1:
            src = stream.withColumn(
                "__m", F.explode(F.array(*[F.lit(i) for i in range(path_mult)]))
            )
        src = src.select(
            "ts", "event_type",
            (F.col("user_id") % 3).cast("string").alias("seg"),
            "value",
        )
        out = streaming_tableone(
            src, "event_type", cont_vars=["value"],
            cat_vars={"seg": ["0", "1", "2"]}, window="1 day", quartiles=True,
        )
        q = (
            out.writeStream.format("memory").queryName(name)
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return spark.table(name).count()

    run_st(1, "warm_st")
    timed("stream_tableone 1x", lambda: run_st(1, "st1"))
    timed("stream_tableone 10x (exploded rows)", lambda: run_st(10, "st10"))

    spark.stop()


if __name__ == "__main__":
    main()
