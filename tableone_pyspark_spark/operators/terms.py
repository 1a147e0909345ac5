"""Corpus/term-level text operators: TF-IDF term ranking and winnowing
document fingerprints.

Spark-first shapes with explicit 100 TB stories:

  * tfidf_top_terms — two partial-aggregated shuffles (term frequency,
    document frequency), one join on the term, one per-doc ranking
    window. No driver-side vocabulary, no UDFs — every step is a
    Catalyst aggregate over (id, term) pairs.
  * winnow_fingerprints — the winnowing scheme of Schleimer, Wilkerson
    & Aiken (SIGMOD 2003, "Winnowing: Local Algorithms for Document
    Fingerprinting") applied at word-shingle granularity: each sliding
    window of ``window`` consecutive shingle hashes contributes its
    minimum, guaranteeing any sufficiently long match between two
    documents shares a fingerprint. One window pass per document
    partition — a single shuffle on the doc id; fingerprints use the
    cross-engine polynomial hash, so results are SQL-oracle-exact.

No counterpart in the reference repo (no text surface); these extend
the LLM-pipeline operator family (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tableone_pyspark_spark.functions.text import normalize_text, poly_hash
from tableone_pyspark_spark.plans.layout import rebalance


def doc_terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term) rows — one per word OCCURRENCE of the normalized
    text (the melt every term-level aggregate starts from)."""
    return (
        rebalance(df.select(id_col, text_col))
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
        )
        .where(F.col("term") != "")
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    tf = occurrences of the term in the doc; idf = ln(N / df) with df =
    number of docs containing the term. Both are partial-aggregated
    groupBys (the shuffles carry (id, term) / (term) keys, never text
    bodies beyond the terms themselves); the corpus size N joins in as
    a broadcast scalar, and ranking is one per-doc window with a
    deterministic (score desc, term asc) tie-break.
    Returns (id, term, tf, df, tfidf, rank).
    """
    terms = doc_terms(df, text_col, id_col)
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency derives from tf's rows (one per (doc, term)) —
    # no second melt over the corpus, and the tf exchange is reused
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id", "term", "tf", "df", "tfidf", "rank")
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints over word ``n``-gram shingles: the
    distinct set of per-window minimum shingle hashes, one window per
    consecutive run of ``window`` shingles.

    Guarantee (Schleimer et al. 2003 §2): two documents sharing a run
    of at least ``window + n - 1`` words share at least one
    fingerprint — so candidate retrieval is an equi-join on the
    fingerprint, the same bucketed shape as MinHash banding, but with a
    LOCALITY guarantee (contiguous-match detection, e.g. quotation /
    boilerplate / plagiarism discovery) instead of a set-similarity
    one. Hashes are the cross-engine polynomial family, so the whole
    operator is SQL-oracle-exact.

    The whole construction is per-document, so it runs as ONE Arrow
    kernel with ZERO shuffles (r17, guide §4.2): tokenize, hash
    shingles by per-word Horner combination, slide the window minimum
    and de-duplicate per doc inside the batch — bit-identical integer
    arithmetic to the Catalyst twin (`_winnow_fingerprints_catalyst`,
    kept as the differential pin), which needed a posexplode, a
    per-doc window shuffle+sort and a distinct shuffle.
    Returns distinct (id, fingerprint).

    The fingerprint table is a session-memoized per-corpus artifact
    (:mod:`core.memo`): the listing query, overlap pairing and
    incremental dedup all consume it, and must not re-shingle and
    re-window the corpus each time.
    """
    from tableone_pyspark_spark.core.memo import memo_df, memo_key

    mkey = memo_key(df, text_col, id_col, n, window, "winnow-v1")
    return memo_df(
        "winnow_fps", mkey, lambda: _winnow_fingerprints_build(df, text_col, id_col, n, window)
    )


_POLY_MOD = (1 << 31) - 1


def _winnow_kernel(n: int, window: int):
    """mapInArrow kernel: (id, __t1_text) batches -> distinct
    (id, fingerprint) pairs. Pure integer arithmetic — bit-identical
    to the Catalyst construction (differential-pinned)."""

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        from tableone_pyspark_spark.functions.text import (
            poly_word_entry,
            py_norm_words,
        )

        p = _POLY_MOD
        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            ndocs = len(texts)
            if ndocs == 0:
                continue
            entries = []  # flattened (h, f, a) word entries
            nw = np.empty(ndocs, dtype=np.int64)
            for di, t in enumerate(texts):
                ws = py_norm_words(t)
                nw[di] = len(ws)
                for w in ws:
                    entries.append(poly_word_entry(w))
            k = np.maximum(nw - (n - 1), 0)  # shingles per doc
            total = int(k.sum())
            if total == 0 or total < 1:
                continue
            ent = np.asarray(entries, dtype=np.int64)
            H, FF, AA = ent[:, 0], ent[:, 1], ent[:, 2]
            starts = np.concatenate(([0], np.cumsum(nw)[:-1]))
            cum = np.concatenate(([0], np.cumsum(k)))
            doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), k)
            pos = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], k)
            i0 = np.repeat(starts, k) + pos
            h = H[i0]
            for j in range(1, n):
                ij = i0 + j
                h = (h * FF[ij] + AA[ij]) % p
            if total < window:
                m = None
            else:
                m = h[window - 1 :].copy()
                for j in range(1, window):
                    np.minimum(m, h[window - 1 - j : total - j], out=m)
                valid = doc_of[window - 1 :] == doc_of[: total - window + 1]
                md = doc_of[window - 1 :][valid]
                mv = m[valid]
            if m is None or len(mv) == 0:
                continue
            key = (md << 31) | mv  # fingerprint < 2^31-1 fits 31 bits
            u = np.unique(key)
            out_doc = (u >> 31).astype(np.int64)
            out_fp = (u & p).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [ids.take(pa.array(out_doc)), pa.array(out_fp, pa.int64())],
                schema=pa.schema(
                    [pa.field("id", ids.type), pa.field("fingerprint", pa.int64())]
                ),
            )

    return fn


def _winnow_fingerprints_build(
    df: DataFrame, text_col: str, id_col: str, n: int, window: int
) -> DataFrame:
    sel = rebalance(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__t1_text")
    )
    id_type = sel.schema["id"].dataType.simpleString()
    return sel.mapInArrow(
        _winnow_kernel(n, window), f"id {id_type}, fingerprint long"
    )


def _winnow_fingerprints_catalyst(
    df: DataFrame, text_col: str, id_col: str, n: int, window: int
) -> DataFrame:
    """Pre-r17 pure-Catalyst construction — kept as the differential
    twin pinning the Arrow kernel's bit-exactness (tests), not used on
    any query path."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    k = F.size(words) - (n - 1)
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(0), F.greatest(k, F.lit(1)) - 1),
            lambda i: F.concat_ws(
                " ",
                *[F.try_element_at(words, (i + j + 1).cast("int")) for j in range(n)],
            ),
        ),
    ).otherwise(F.array(F.lit("")).cast("array<string>"))
    ordered = (
        rebalance(df.select(id_col, text_col))
        .select(F.col(id_col).alias("id"), F.posexplode(grams).alias("pos", "g"))
        .where(F.col("g") != "")
        .withColumn("h", poly_hash(F.col("g")))
    )
    w = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    return (
        ordered.withColumn("win_min", F.min("h").over(w))
        .where(F.col("pos") >= window - 1)  # only full windows select
        .select("id", F.col("win_min").alias("fingerprint"))
        .distinct()
    )


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    window: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints
    (a < b) — contiguous-overlap candidates. The join is a shuffled
    equi-join on the fingerprint; the pair count is a partial-aggregated
    groupBy of compact (id, id) keys. Returns (id_a, id_b, n_shared).
    """
    fp = winnow_fingerprints(df, text_col, id_col, n, window)
    a = fp.select(F.col("id").alias("id_a"), "fingerprint")
    b = fp.select(F.col("id").alias("id_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def incremental_dedup(
    new_df: DataFrame,
    seen_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    window: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Incremental near-dup flagging of a NEW batch against an already
    ingested corpus — the incremental-crawl shape. The accumulated side
    participates ONLY as its distinct winnowing-fingerprint set (in a
    real pipeline that set is the persisted index; here it derives from
    ``seen_df``): the new batch is fingerprinted once, candidates meet
    in a fingerprint equi-join, and no document text is ever compared
    cross-batch. A new doc is a duplicate when it shares at least
    ``min_shared`` distinct fingerprints with the seen set — the same
    contiguous-overlap evidence as :func:`winnow_overlap_pairs`.

    Scale story: the join ships (fingerprint, id) pairs only; the seen
    side is pre-distinct so its size is the index size, not the corpus
    size; the per-doc count is a partial-agg groupBy on the new ids.
    Returns (id, n_shared, is_dup) for every row of ``new_df``.
    """
    seen_fps = (
        winnow_fingerprints(seen_df, text_col, id_col, n, window)
        .select("fingerprint")
        .distinct()
    )
    return _flag_against_index(
        new_df, seen_fps, text_col, id_col, n, window, min_shared
    )


def _flag_against_index(
    new_df: DataFrame,
    seen_fps: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    window: int,
    min_shared: int,
) -> DataFrame:
    """Shared tail of the incremental-dedup shapes: fingerprint the new
    batch, meet the (already distinct) seen-fingerprint side in an
    equi-join, count shared evidence per new doc."""
    new_fps = winnow_fingerprints(new_df, text_col, id_col, n, window)
    shared = (
        new_fps.join(seen_fps, "fingerprint")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        new_df.select(F.col(id_col).alias("id"))
        .join(shared, "id", "left")
        .select(
            "id",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) >= min_shared).alias("is_dup"),
        )
    )


def build_dedup_index(
    seen_df: DataFrame,
    text_col: str,
    id_col: str,
    table: str,
    path: str,
    n: int = 3,
    window: int = 4,
    n_buckets: int = 32,
) -> None:
    """Persist the distinct winnowing-fingerprint set of an ingested
    corpus as a bucketed+sorted parquet table — the on-disk half of the
    real incremental-crawl contract (:func:`incremental_dedup` derives
    the same set from ``seen_df`` in-session; here it survives the
    session and is never recomputed).

    Bucketing by ``fingerprint`` pre-shuffles the index ONCE at write
    time: every later :func:`incremental_dedup_indexed` join reads the
    index with no exchange on the index side — at 100 TB the index is
    the big, stable side, and re-shuffling it per crawl batch is the
    cost this layout eliminates. Incremental maintenance appends new
    batches' fingerprints with ``mode="append"`` (per-bucket files
    accumulate; buckets stay aligned).
    """
    from tableone_pyspark_spark.sources.io import write_bucketed

    fps = (
        winnow_fingerprints(seen_df, text_col, id_col, n, window)
        .select("fingerprint")
        .distinct()
    )
    write_bucketed(fps, table, path, ["fingerprint"], n_buckets)


def incremental_dedup_indexed(
    new_df: DataFrame,
    index_table: str,
    text_col: str,
    id_col: str,
    n: int = 3,
    window: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """:func:`incremental_dedup` against a PERSISTED fingerprint index
    (:func:`build_dedup_index`): the seen corpus is never rescanned or
    re-fingerprinted — the join side is the bucketed on-disk table, so
    the only per-batch work is fingerprinting the new batch and one
    equi-join that shuffles ONLY the new side (the index reads
    exchange-free from its buckets). ``n``/``window`` must match the
    values the index was built with. Returns (id, n_shared, is_dup)
    for every row of ``new_df``.
    """
    seen_fps = new_df.sparkSession.table(index_table)
    # distinct() at build time; mode="append" maintenance can introduce
    # cross-batch repeats — de-dup defensively (bucket-local, no shuffle)
    return _flag_against_index(
        new_df, seen_fps.distinct(), text_col, id_col, n, window, min_shared
    )
