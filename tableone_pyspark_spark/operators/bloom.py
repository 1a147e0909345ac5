"""Distributed Bloom filter for corpus-scale dedup (the Dolma/CCNet
industrial pattern: build a compact probabilistic membership artifact
over a seen corpus once, probe new batches against it forever).

Why a Bloom filter when exact joins exist: the filter is an O(m)-bit
ARTIFACT — shippable, broadcastable, incrementally reusable — whose
probe cost is independent of the seen-corpus size. An equi-join
against the seen set (operators/terms.py incremental_dedup) is exact
but must read/shuffle the index every batch; the Bloom probe touches
only the new batch. False positives (tunable via bits-per-key) drop
NEW documents as "seen" — acceptable for crawl dedup, never for
correctness-critical joins; false negatives are impossible.

Spark-first build shape: each key sets ``n_hashes`` bits; bit
positions melt to (lane, bit) pairs where a lane is one int64 word of
the filter — the aggregation is ONE ``bit_or`` groupBy over at most
``m/64`` lanes (map-side combined: each partition contributes at most
one partial word per lane, so the shuffle is bounded by
lanes × partitions regardless of corpus size). The driver collects
only the lane words (m/64 int64s — the artifact itself, e.g. 2 MiB at
m = 2²⁴), never row data.

Hashing: double hashing (Kirsch-Mitzenmacher 2006) from two
independent cross-engine polynomial hashes — position_i =
(h1 + i·h2) mod m — so the whole construction is deterministic and
engine-reproducible.

No counterpart in the reference repo; extends the dedup family
(BASELINE.json north star) alongside exact/MinHash/SimHash/winnow/
span dedup.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tableone_pyspark_spark.functions.text import normalize_text, poly_hash


def _positions(key, m_bits: int, n_hashes: int):
    """n_hashes bit positions per key via Kirsch-Mitzenmacher double
    hashing over the two cross-engine poly hashes."""
    h1 = poly_hash(key, base=31)
    # odd step -> full period (Column `|` is logical OR; use bitwiseOR)
    h2 = poly_hash(key, base=131).bitwiseOR(F.lit(1).cast("long"))
    return F.array(
        *[((h1 + F.lit(i) * h2) % F.lit(m_bits)) for i in range(n_hashes)]
    )


def build_bloom(
    df: DataFrame,
    key_col,
    m_bits: int = 1 << 22,
    n_hashes: int = 5,
    normalize: bool = False,
) -> np.ndarray:
    """Build the filter over a key column (pass ``normalize=True`` to
    key on normalized text — the dedup-family convention). Returns the
    artifact: a uint64 numpy array of ``m_bits/64`` lane words.

    ONE melt + ONE bit_or groupBy; the driver receives only the lane
    words. m_bits must be a multiple of 64."""
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    if not 1 <= n_hashes <= 16:
        raise ValueError("n_hashes must be in 1..16")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    if normalize:
        key = normalize_text(key)
    pos = F.explode(_positions(key, m_bits, n_hashes)).alias("p")
    lanes = (
        df.select(pos)
        .select(
            (F.col("p") / 64).cast("long").alias("lane"),
            # F.shiftleft takes a Python int for numBits; the per-row
            # shift needs the SQL form
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("w"),
        )
        .groupBy("lane")
        .agg(F.bit_or("w").alias("w"))
        .collect()
    )
    out = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in lanes:
        out[int(r["lane"])] = np.uint64(r["w"] % (1 << 64))
    return out


def bloom_probe(
    df: DataFrame,
    bloom: np.ndarray,
    key_col,
    id_col: str,
    n_hashes: int = 5,
    normalize: bool = False,
) -> DataFrame:
    """(id, maybe_seen): True when EVERY hash bit is set (possible
    false positives at the filter's design rate, no false negatives).
    The artifact broadcasts inside the Arrow kernel closure; the probe
    reads only the new batch — seen-corpus size is irrelevant."""
    m_bits = int(bloom.shape[0]) * 64
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    if normalize:
        key = normalize_text(key)
    src = df.select(
        F.col(id_col).alias("id"),
        _positions(key, m_bits, n_hashes).alias("ps"),
    )
    blm = bloom  # captured; Spark broadcasts the closure once per task set

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            hit = []
            for ps in pdf["ps"]:
                p = np.asarray(ps, dtype=np.int64)
                lanes = blm[p >> 6]
                bits = (lanes >> (p & 63).astype(np.uint64)) & np.uint64(1)
                hit.append(bool(bits.all()))
            yield pd.DataFrame({"id": ids, "maybe_seen": hit})

    return src.mapInPandas(
        kernel,
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("maybe_seen", T.BooleanType()),
            ]
        ),
    )
