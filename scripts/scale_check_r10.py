#!/usr/bin/env python
"""10x-union scaling spot-checks for the round-10 additions: the
Count-Min artifact family (batch build/merge/estimate), the brute
semantic-overlap decontamination, the composed WARC ingest pipeline,
and WebDataset tar sharding. Protocol identical to earlier rounds:
sf0.1 input, local[32], the operator at 1x and at the input unioned
10x (ids re-keyed so nothing collapses), wall-clock per run (one
session warm-up, then timed single runs — knee probes, not medians).

Expected shapes:
  - build_cms is one partial-aggregated pass whose exchange is
    bounded by groups × depth × width REGARDLESS of input rows ->
    ~linear scan time, flat shuffle;
  - semantic_overlap(brute) broadcasts the benchmark side and scores
    row-local fold dots -> linear in train rows, zero corpus shuffle
    (at 10x the corpus the pair count is 10x, not 100x: the bench
    side is held fixed — the decontam shape);
  - warc_pipeline-style ingest (build archives -> warc_records ->
    decode -> html_extract -> canonical_url) is row-local behind one
    archive-keyed exchange; rebalance() keeps the record walk fed ->
    ~linear (the r9 WARC probe held near-flat on 10x archives; this
    composes the url/charset legs on top);
  - webdataset_shards is one shard-keyed exchange + per-shard tar
    assembly -> linear bytes, shard count fixed.
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
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("scale_check_r10")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{SF}/events.parquet")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ev.count(), docs.count(), emb.count()  # session warm-up

    # ---- Count-Min build + estimate ---------------------------------
    from tableone_pyspark_spark.operators.sketches import (
        build_cms,
        cms_estimate,
    )

    def cms_run(src):
        sk = build_cms(src, "user_id", width=1024, depth=4,
                       group_cols=["event_type"])
        est = cms_estimate(sk, src.select("event_type", "user_id"),
                           "user_id", group_cols=["event_type"],
                           width=1024, depth=4)
        return est.count()

    timed("cms build+estimate 1x", lambda: cms_run(ev))
    ev10 = x10(ev, "user_id")  # 10x rows AND 10x distinct keys
    timed("cms build+estimate 10x", lambda: cms_run(ev10))

    # ---- semantic_overlap brute -------------------------------------
    from tableone_pyspark_spark.operators.decontam import semantic_overlap

    bench = emb.where(F.col("vec_id") % 10 == 0)  # held FIXED
    def sem_run(train):
        return semantic_overlap(train, bench, threshold=0.3,
                                strategy="brute").count()

    train1 = emb.where(F.col("vec_id") % 10 != 0)
    timed("semantic_overlap brute 1x", lambda: sem_run(train1))
    timed("semantic_overlap brute 10x", lambda: sem_run(x10(train1, "vec_id")))

    # ---- composed WARC ingest (the warc_pipeline shape) -------------
    import pandas as pd

    from tableone_pyspark_spark.functions.html import html_extract
    from tableone_pyspark_spark.functions.url import canonical_url
    from tableone_pyspark_spark.functions.warc import decode_body, warc_records

    def ingest_run(d, n_arch):
        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            import html as _h
            import re as _re

            from tableone_pyspark_spark.functions.warc import (
                encode_warc,
                http_response,
            )

            pdf = pdf.sort_values("doc_id")
            aid = int(pdf["_arch"].iloc[0])
            recs = []
            for _, r in pdf.iterrows():
                did = int(r["doc_id"])
                clean = _re.sub(r"[^ -~]", " ", r["text"])
                page = (
                    f"<html><head><title>Doc {did}</title></head><body>"
                    f"<p>{_h.escape(clean)}</p></body></html>"
                )
                recs.append((
                    "response",
                    f"HTTP://Example.COM:80/d/{did}?utm_source=x",
                    http_response(page.encode(), content_type="text/html; charset=utf-8"),
                ))
            return pd.DataFrame({
                "archive_id": [aid],
                "payload": [encode_warc(recs, gzip_members=(aid % 2 == 1))],
            })

        arch = (
            d.withColumn("_arch", F.pmod(F.col("doc_id"), F.lit(n_arch)).cast("int"))
            .groupBy("_arch")
            .applyInPandas(build, "archive_id int, payload binary")
        )
        recs = warc_records(arch, "archive_id", "payload")
        out = recs.where(F.col("http_status") == 200).select(
            canonical_url(F.col("target_uri")).alias("url"),
            html_extract(decode_body(F.col("body"), F.col("content_type"))).alias("e"),
        )
        return out.count()

    timed("warc ingest 1x (8 archives)", lambda: ingest_run(docs, 8))
    timed("warc ingest 10x (80 archives)", lambda: ingest_run(x10(docs, "doc_id"), 80))

    # ---- webdataset_shards ------------------------------------------
    from tableone_pyspark_spark.operators.packing import webdataset_shards

    def wds_run(d, n_shards):
        out = webdataset_shards(d, "doc_id", {"txt": "text"}, n_shards=n_shards)
        return out.agg(F.sum("n_samples")).collect()[0][0]

    timed("webdataset 1x (16 shards)", lambda: wds_run(docs, 16))
    timed("webdataset 10x (16 shards)", lambda: wds_run(x10(docs, "doc_id"), 16))

    # ---- quality classifier (X110) ----------------------------------
    # train: one exchange bounded by n_buckets; score: map-side only.
    # Expect SUBLINEAR 1x→10x (measured 1.91→5.39 s = 2.8× wall over
    # two CPU-bound corpus passes; the shuffle stays bucket-bounded).
    # The 10x model DIFFERS from 1x by design: replication multiplies
    # counts but not the add-α smoothing mass.
    from tableone_pyspark_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
    )

    def clf_run(d):
        lab = d.select(
            "doc_id", "text", (F.col("doc_id") % 2).cast("int").alias("label")
        )
        w, p = train_quality_classifier(lab, "text", "label", n_buckets=2048)
        return score_quality(lab, "text", "doc_id", w, p).agg(
            F.sum("n_features")
        ).collect()[0][0]

    timed("quality classifier 1x (train+score)", lambda: clf_run(docs))
    timed(
        "quality classifier 10x (train+score)",
        lambda: clf_run(x10(docs, "doc_id")),
    )

    # ---- t-digest build (X114) ---------------------------------------
    # two-level: only digests cross the exchange. Expect sublinear.
    from tableone_pyspark_spark.operators.tdigest import (
        build_tdigest,
        tdigest_quantiles,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")

    def td_run(d):
        sk = build_tdigest(d, "l_extendedprice", ["l_returnflag"])
        return tdigest_quantiles(sk, [0.5, 0.99], ["l_returnflag"]).count()

    timed("tdigest build+query 1x", lambda: td_run(li))
    timed("tdigest build+query 10x", lambda: td_run(x10(li, "l_orderkey")))

    # ---- PageRank (X112) ---------------------------------------------
    # inherently O(n_iter) vertex-frame shuffles; the probe checks the
    # per-iteration cost scales with VERTICES, not edge re-shuffles
    # (edge frame persisted + src-partitioned). Expect ~linear in
    # edges at fixed iterations — not flat — with no blowup.
    from tableone_pyspark_spark.operators.graph import pagerank

    def pr_run(d):
        e = d.select(
            F.col("l_orderkey").alias("src"),
            (F.lit(10_000_000) + F.col("l_suppkey")).alias("dst"),
        )
        return pagerank(e, n_iter=5).count()

    timed("pagerank 5-iter 1x", lambda: pr_run(li))
    timed("pagerank 5-iter 10x", lambda: pr_run(x10(li, "l_orderkey")))

    spark.stop()


if __name__ == "__main__":
    main()
