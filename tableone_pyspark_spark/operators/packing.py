"""Sequence packing: lay a corpus out as fixed-length training windows.

The GPT-style pretraining layout concatenates every document's tokens
in a fixed order and chunks the stream every ``max_tokens`` — each doc
therefore owns a global token OFFSET, and its window assignment is
pure arithmetic on that offset. The hard part at 100 TB is the offset
itself: a naive global-order window function plans as a SINGLE
partition (Spark has to see the whole stream in order), which is a
non-starter.

This operator computes the global prefix sum the distributed way:

  1. shard every doc by hashed key (deterministic, engine-independent);
  2. LOCAL cumulative sums per shard — the window partitions by shard,
     so all shards scan in parallel;
  3. per-shard totals (one row per shard) collect to the driver —
     ``n_shards`` scalars, not data — and an exclusive prefix over
     them gives each shard's global base offset;
  4. base offsets broadcast-join back; offset = base + local.

The concat order is (shard, key): deterministic, reproducible on any
engine — a single-node oracle reproduces it with one ORDER BY — while
the computation never materializes a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import split_bucket


def pack_sequences(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    max_tokens: int,
    n_shards: int = 64,
    salt: str = "pack-v1",
) -> DataFrame:
    """Assign every doc its place in the packed token stream.

    Returns ``(id, n_tokens, offset, seq_id, pos_in_seq, end_seq_id)``:
    ``offset`` is the doc's first token's position in the global
    stream, ``seq_id`` / ``pos_in_seq`` locate it inside its
    ``max_tokens`` window, and ``end_seq_id`` is the window of its
    last token (> seq_id when the doc straddles window boundaries).

    Scale shape: one hash shuffle on the shard id, per-shard window
    scans in parallel, an ``n_shards``-row driver collect, and a
    broadcast join of the base-offset table. No global sort, no
    single-partition window.
    """
    sharded = df.select(
        F.col(key_col).alias("id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        (split_bucket(F.col(key_col), salt) % n_shards).alias("_shard"),
    )
    w = Window.partitionBy("_shard").orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = sharded.withColumn(
        "_local_end", F.sum("n_tokens").over(w)
    )

    totals = {
        r["_shard"]: r["t"]
        for r in sharded.groupBy("_shard")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    bases, acc = [], 0
    for s in sorted(totals):
        bases.append((s, acc))
        acc += totals[s]
    base_df = local.sparkSession.createDataFrame(
        bases, ["_shard", "_base"]
    )

    out = local.join(F.broadcast(base_df), "_shard")
    offset = F.col("_base") + F.col("_local_end") - F.col("n_tokens")
    # empty doc: define its end window as its start window
    last = offset + F.greatest(F.col("n_tokens") - 1, F.lit(0))
    return out.select(
        "id",
        "n_tokens",
        offset.alias("offset"),
        F.floor(offset / max_tokens).alias("seq_id"),
        (offset % max_tokens).alias("pos_in_seq"),
        F.floor(last / max_tokens).alias("end_seq_id"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_words: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking — the context-window prep step
    for training/RAG: each document's whitespace tokens are split into
    ``chunk_words``-token windows advancing by ``chunk_words −
    overlap``, so consecutive chunks share ``overlap`` tokens and no
    token is dropped (the final, possibly short, window keeps the
    tail).

    Pure Catalyst: the window starts are a ``sequence`` over the token
    count, each chunk a ``slice`` + ``concat_ws`` — no UDFs, and the
    explode multiplies rows by ~n/stride with only (id, chunk) payloads
    downstream. Returns (<id_col>, chunk_id, n_tokens, chunk_text).
    """
    if overlap >= chunk_words:
        raise ValueError("overlap must be smaller than chunk_words")
    stride = chunk_words - overlap
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    # start positions 0, stride, 2·stride … covering every token; a doc
    # shorter than one chunk still emits its single (short) window
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.ceil((n - F.lit(chunk_words)) / F.lit(stride)), F.lit(0))
        * stride,
        F.lit(stride),
    )
    exploded = (
        df.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            F.posexplode(starts).alias("chunk_id", "start"),
            words.alias("__w"),
        )
    )
    piece = F.slice(F.col("__w"), F.col("start") + 1, chunk_words)
    return exploded.select(
        id_col,
        "chunk_id",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def webdataset_shards(
    df: DataFrame,
    key_col: str,
    payload_cols: dict[str, str],
    n_shards: int = 64,
    salt: str = "wds-v1",
) -> DataFrame:
    """WebDataset-style tar sharding as a PURE TRANSFORMATION: the
    multimodal training layout (one ``.tar`` per shard; each sample =
    consecutive members ``<key>.<ext>``) produced as (shard, tar
    bytes, n_samples) rows — no filesystem side effects, so the
    caller writes the binary column wherever the cluster's storage
    lives and the operator stays testable/deterministic.

    ``payload_cols``: {extension: column}, e.g. ``{"txt": "text",
    "json": "meta"}`` — string columns encode UTF-8, binary pass
    through; NULL payloads skip that member (WebDataset's optional-
    field convention). Samples shard by the same deterministic
    hash-bucket family the engine's splits use (``xxhash64(key,
    salt)``), and WITHIN a shard sort by key — so shard contents and
    member order (and therefore the tar BYTES, with zeroed mtime/
    uid/gid) are reproducible on any engine and any partitioning.

    Scale shape: one shuffle keyed by shard (the write layout's
    inherent movement), then one ``applyInPandas`` per shard builds
    the tar in memory — shards must fit an executor (pick n_shards
    accordingly: corpus_bytes / n_shards ≲ executor memory, same
    sizing rule as any tar/zip packaging job). Returns (shard,
    tar, n_samples)."""
    import io
    import tarfile

    import pandas as pd

    if not payload_cols:
        raise ValueError("payload_cols must name at least one member")
    if n_shards < 1:
        raise ValueError("n_shards must be positive")
    exts = sorted(payload_cols)
    key = F.col(key_col).cast("string")
    sel = [
        key.alias("_key"),
        (F.pmod(F.xxhash64(key, F.lit(salt)), F.lit(n_shards)))
        .cast("int")
        .alias("_shard"),
    ]
    for ext in exts:
        c = F.col(payload_cols[ext])
        sel.append(c.alias(f"_p_{ext}"))
    src = df.where(key.isNotNull()).select(*sel)

    schema = "shard int, tar binary, n_samples long"

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_key", kind="stable")
        dup = pdf["_key"].duplicated()
        if dup.any():
            # two members named <key>.<ext> in unspecified relative
            # order would silently corrupt WebDataset's consecutive-
            # members-per-sample grouping AND the byte-reproducibility
            # claim (ADVICE r9) — a duplicate key is a caller error
            raise ValueError(
                "webdataset_shards: duplicate key "
                f"{pdf['_key'][dup].iloc[0]!r} — keys must be unique "
                "(dedupe or suffix upstream)"
            )
        buf = io.BytesIO()
        n = 0
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, row in pdf.iterrows():
                wrote = False
                for ext in exts:
                    v = row[f"_p_{ext}"]
                    if v is None:
                        continue
                    if isinstance(v, str):
                        data = v.encode("utf-8")
                    elif isinstance(v, (bytes, bytearray)):
                        data = bytes(v)
                    else:
                        # bytes(5) would silently emit five NUL bytes —
                        # a numeric column here is a caller error
                        raise TypeError(
                            f"webdataset member .{ext} must be a string "
                            f"or binary column, got {type(v).__name__}"
                        )
                    info = tarfile.TarInfo(name=f"{row['_key']}.{ext}")
                    info.size = len(data)
                    info.mtime = 0  # reproducible bytes
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(data))
                    wrote = True
                if wrote:
                    n += 1
        return pd.DataFrame(
            {
                "shard": [int(pdf["_shard"].iloc[0])],
                "tar": [buf.getvalue()],
                "n_samples": [n],
            }
        )

    return src.groupBy("_shard").applyInPandas(build, schema)
