"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS): pick raw-corpus documents whose hashed-n-gram distribution
looks like a target corpus, by importance weights under two bag-of-
hashed-bigram models.

    features : every word bigram of a doc hashes into one of B buckets
               (cross-engine polynomial hash — SQL-replayable)
    models   : p̂[b] (target) and q̂[b] (raw), add-α smoothed over B
    weight   : log ŵ(doc) = Σ_buckets count_b · (ln p̂[b] − ln q̂[b])
    resample : Gumbel top-k — argmax of (log ŵ + Gumbel noise) draws
               k docs ~ softmax(log ŵ) without replacement; the noise
               is hash-derived (−ln(−ln(u)), u from the split_bucket
               lattice), so selection is a deterministic pure function
               of (doc key, salt) reproducible on any engine.

Spark shapes, 100 TB story: each model is ONE partial-aggregated
shuffle of hashed bigrams collapsed to ≤ B rows (B ~ 10⁴: the model
is broadcast-sized BY CONSTRUCTION — that is DSIR's point); scoring
is one explode + one broadcast join + one per-doc sum; selection is a
global top-k (TakeOrderedAndProject — never a full sort). No UDFs,
no driver-side loops, no collect of row data.

No counterpart in the reference repo; extends the LLM-pipeline
curation family (BASELINE.json north star) alongside quality_score /
lang_id / lm_perplexity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tableone_pyspark_spark.functions.text import normalize_text, poly_hash
from tableone_pyspark_spark.operators.sampling import BUCKETS, split_bucket


def _hashed_bigrams(
    df: DataFrame, text_col: str, id_col: str, b: int, hash_impl: str = "arrow"
) -> DataFrame:
    """(id, bucket) — one row per bigram OCCURRENCE, bucketed by the
    cross-engine polynomial hash of 'w1 w2'.

    'arrow' (default) melts AND hashes inside one vectorized kernel
    (normalization replicated exactly: lower, collapse [ \\t\\n]+,
    strip — the same python twin the Gopher kernel uses; hashing via
    the batch Horner of ``operators/bloom.py``). 'catalyst' keeps the
    Column pipeline shared with the LM module — the oracle-reference
    arithmetic; both produce identical rows (parity pinned), the fold
    just evaluates interpreted per character (~3 corpus passes per
    DSIR run made it the operator's hot spot)."""
    if hash_impl == "catalyst":
        from tableone_pyspark_spark.operators.lm import _bigram_occurrences

        return _bigram_occurrences(df, text_col, id_col).select(
            "id",
            (poly_hash(F.concat_ws(" ", F.col("w1"), F.col("w2"))) % b).alias(
                "bucket"
            ),
        )
    if hash_impl != "arrow":
        raise ValueError(f"hash_impl must be 'arrow' or 'catalyst', got {hash_impl!r}")

    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from tableone_pyspark_spark.functions.text import py_norm_words
    from tableone_pyspark_spark.operators.bloom import _horner_batch
    from tableone_pyspark_spark.plans.layout import rebalance

    # CPU-bound melt+hash kernel (run 3× per DSIR fit+score): spread
    # narrow inputs across cores; no-op on wide (100 TB) inputs
    src = rebalance(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    )
    schema = T.StructType(
        [
            T.StructField("id", src.schema["id"].dataType),
            T.StructField("bucket", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, grams = [], []
            for i, t in zip(pdf["id"], pdf["t"]):
                ws = py_norm_words(t)
                for a, c in zip(ws, ws[1:]):
                    ids.append(i)
                    grams.append(a + " " + c)
            if not ids:
                continue
            h = _horner_batch(grams, 31)
            yield pd.DataFrame({"id": ids, "bucket": (h % b).astype(np.int64)})

    return src.mapInPandas(kernel, schema)


def fit_hashed_ngram_model(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int = 10_000
) -> DataFrame:
    """(bucket, c) — bucket occurrence counts; ≤ ``n_buckets`` rows, so
    the fitted model broadcasts regardless of corpus size."""
    return (
        _hashed_bigrams(df, text_col, id_col, n_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def importance_weights(
    df: DataFrame,
    target_model: DataFrame,
    raw_model: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 10_000,
    alpha: float = 1.0,
) -> DataFrame:
    """(id, n_features, log_w): per-doc DSIR log importance weight
    under add-α smoothed bucket models. Docs with no bigram get
    n_features = 0 and log_w = 0 (weight 1 — no evidence either way).
    """
    ratios = (
        target_model.select("bucket", F.col("c").alias("cp"))
        .join(raw_model.select("bucket", F.col("c").alias("cq")), "bucket", "outer")
        .select(
            "bucket",
            F.coalesce("cp", F.lit(0)).alias("cp"),
            F.coalesce("cq", F.lit(0)).alias("cq"),
        )
    )
    # materialize the joined models ONCE (r17, guide §5.4): the frame
    # is ≤ n_buckets rows BY CONSTRUCTION (DSIR's whole point), but it
    # sits under both the eager normalizer agg below AND the scoring
    # join — left lazy, every downstream action re-ran both model
    # fits (two more melt+hash corpus passes per action).
    # Cluster caveat (ADVICE r17): localCheckpoint blocks are NOT
    # recoverable on executor loss and stay persisted for the life of
    # the returned frame (the scoring join consumes them lazily, so
    # they cannot be unpersisted here); a long-lived session that fits
    # many models should release superseded frames via
    # plans.layout.release_checkpoint once done scoring with them.
    ratios = ratios.localCheckpoint(eager=True)
    tp = ratios.agg(F.sum("cp"), F.sum("cq")).collect()[0]
    np_, nq = float(tp[0] or 0), float(tp[1] or 0)
    av = alpha * n_buckets
    logr = F.log((F.col("cp") + alpha) / F.lit(np_ + av)) - F.log(
        (F.col("cq") + alpha) / F.lit(nq + av)
    )
    ratios = ratios.select("bucket", logr.alias("logr"))
    # a bucket absent from BOTH models (possible only when scoring docs
    # outside the fitting corpora — the normal fit-once/score-shards
    # deployment) still has a smoothed ratio: cp = cq = 0 gives
    # log(α/(np+αB)) − log(α/(nq+αB)) = log((nq+αB)/(np+αB)), NOT 0
    import math

    unseen = math.log((nq + av) / (np_ + av)) if np_ + av > 0 else 0.0

    occ = _hashed_bigrams(df, text_col, id_col, n_buckets)
    scored = (
        occ.join(F.broadcast(ratios), "bucket", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum(F.coalesce("logr", F.lit(unseen))).alias("log_w"),
        )
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return ids.join(scored, "id", "left").select(
        "id",
        F.coalesce("n_features", F.lit(0)).alias("n_features"),
        F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
    )


def _gumbel(key: Column, salt: str) -> Column:
    """Deterministic Gumbel(0,1) draw from the hashed-key lattice:
    u = (bucket + 0.5) / BUCKETS ∈ (0, 1), g = −ln(−ln u). Pure
    function of (key, salt) — same draw on any engine or re-run."""
    u = (split_bucket(key, salt) + F.lit(0.5)) / F.lit(float(BUCKETS))
    return -F.log(-F.log(u))


def dsir_select(
    weights: DataFrame,
    k: int,
    salt: str = "dsir-v1",
) -> DataFrame:
    """Gumbel top-k over (id, log_w): draws ``k`` docs distributed as
    softmax(log_w) WITHOUT replacement (Gumbel-max argmax trick),
    deterministically. Returns (id, n_features, log_w, gumbel_key)
    ordered by descending key. The plan is a global top-k
    (TakeOrderedAndProject), never a full sort."""
    key = (F.col("log_w") + _gumbel(F.col("id"), salt)).alias("gumbel_key")
    return (
        weights.select("id", "n_features", "log_w", key)
        .orderBy(F.desc("gumbel_key"), F.asc("id"))
        .limit(k)
    )
