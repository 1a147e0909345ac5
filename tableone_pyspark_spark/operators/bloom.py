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
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tableone_pyspark_spark.functions.text import normalize_text, poly_hash


@dataclass(frozen=True)
class BloomFilter:
    """The artifact WITH its construction parameters — probing with
    mismatched n_hashes/normalize would silently produce false
    negatives, so the parameters travel with the bits."""

    bits: np.ndarray  # uint64 lane words, m_bits = 64 * len(bits)
    n_hashes: int
    normalize: bool

    @property
    def m_bits(self) -> int:
        return int(self.bits.shape[0]) * 64

    def union(self, other: "BloomFilter") -> "BloomFilter":
        """bloom(A ∪ B) == bloom(A) | bloom(B) — the incremental-crawl
        composition (parameters must match)."""
        if (
            self.bits.shape != other.bits.shape
            or self.n_hashes != other.n_hashes
            or self.normalize != other.normalize
        ):
            raise ValueError("cannot union Bloom filters with different parameters")
        return BloomFilter(self.bits | other.bits, self.n_hashes, self.normalize)


def _positions(key, m_bits: int, n_hashes: int):
    """n_hashes bit positions per key via Kirsch-Mitzenmacher double
    hashing over the two cross-engine poly hashes."""
    h1 = poly_hash(key, base=31)
    # odd step -> full period (Column `|` is logical OR; use bitwiseOR)
    h2 = poly_hash(key, base=131).bitwiseOR(F.lit(1).cast("long"))
    return F.array(
        *[((h1 + F.lit(i) * h2) % F.lit(m_bits)) for i in range(n_hashes)]
    )


def _horner_batch(texts, base: int, mod: int = (1 << 31) - 1) -> np.ndarray:
    """Batch-vectorized Horner fold: loop over the CHARACTER dimension
    with vector ops across the batch — identical values to the
    Catalyst fold / ``poly_hash_py`` for ALL text including the astral
    planes: Spark's ``split('')``/``ascii`` pair is codepoint-aware
    (split never separates surrogate halves; ascii returns the full
    codepoint — probed empirically on U+1D11E), so UTF-32 units here
    ARE the codes every engine folds (parity pinned incl. astral)."""
    n = len(texts)
    codes = [
        np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32) for t in texts
    ]
    L = max((len(c) for c in codes), default=0)
    M = np.zeros((n, L), dtype=np.int64)
    mask = np.zeros((n, L), dtype=bool)
    for i, c in enumerate(codes):
        M[i, : len(c)] = c
        mask[i, : len(c)] = True
    h = np.zeros(n, dtype=np.int64)
    for j in range(L):
        m = mask[:, j]
        h[m] = (h[m] * base + M[m, j]) % mod
    return h


def _positions_batch(texts, m_bits: int, n_hashes: int) -> np.ndarray:
    """(n, n_hashes) KM positions — vectorized twin of ``_positions``."""
    h1 = _horner_batch(texts, 31)
    h2 = _horner_batch(texts, 131) | 1
    return (h1[:, None] + np.arange(n_hashes)[None, :] * h2[:, None]) % m_bits


def build_bloom(
    df: DataFrame,
    key_col,
    m_bits: int = 1 << 22,
    n_hashes: int = 5,
    normalize: bool = False,
    hash_impl: str = "arrow",
) -> BloomFilter:
    """Build the filter over a key column (pass ``normalize=True`` to
    key on normalized text — the dedup-family convention). NULL keys
    are skipped (nothing to key on). Returns a :class:`BloomFilter`
    artifact (uint64 lanes + the parameters that built it).

    ONE melt + ONE bit_or groupBy; the driver receives only the lane
    words. m_bits must be a power of two (>= 64): the odd double-hash
    step h2|1 guarantees a full probe period only when gcd(h2, m) == 1,
    which an odd step gives for power-of-two m but not for e.g. m=192
    (step 3 cycles on a subgroup and silently inflates the fp rate).

    ``hash_impl``: 'arrow' (default) hashes inside a vectorized kernel
    and emits PER-BATCH partial lane words (the shuffle carries at
    most lanes × batches rows — even tighter than the melt);
    'catalyst' keeps the pure-Column fold — the cross-engine oracle
    reference. Bit-identical for all text incl. astral planes (parity
    pinned); Catalyst HOF folds evaluate interpreted per CHARACTER,
    measured ~8× slower on long document keys."""
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two >= 64")
    if not 1 <= n_hashes <= 16:
        raise ValueError("n_hashes must be in 1..16")
    if hash_impl not in ("arrow", "catalyst"):
        raise ValueError(f"hash_impl must be 'arrow' or 'catalyst', got {hash_impl!r}")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    if normalize:
        key = normalize_text(key)

    if hash_impl == "arrow":
        # deliberately NO rebalance() here (unlike the codec synths /
        # DSIR / PQ kernels): the batch Horner is fast enough that
        # round-robin-shuffling the text corpus costs more than the
        # spread saves — A/B at sf0.1 solo: 0.90 s -> 1.39 s WITH the
        # exchange (graded bloom_probe row, r8)
        src = df.select(key.cast("string").alias("k")).where(
            F.col("k").isNotNull()
        )

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    continue
                P = _positions_batch(list(pdf["k"]), m_bits, n_hashes)
                lanes = np.zeros(m_bits // 64, dtype=np.uint64)
                flat = P.reshape(-1)
                np.bitwise_or.at(
                    lanes, flat >> 6, np.uint64(1) << (flat & 63).astype(np.uint64)
                )
                nz = np.nonzero(lanes)[0]
                yield pd.DataFrame(
                    {"lane": nz.astype(np.int64),
                     "w": lanes[nz].astype(np.int64)}
                )

        partials = src.mapInPandas(kernel, "lane long, w long")
        rows = partials.groupBy("lane").agg(F.bit_or("w").alias("w")).collect()
    else:
        pos = F.explode(_positions(key, m_bits, n_hashes)).alias("p")
        rows = (
            df.where(key.isNotNull())
            .select(pos)
            .select(
                (F.col("p") / 64).cast("long").alias("lane"),
                # F.shiftleft takes a Python int for numBits; the per-row
                # shift needs the SQL form
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"
                ).alias("w"),
            )
            .groupBy("lane")
            .agg(F.bit_or("w").alias("w"))
            .collect()
        )
    out = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in rows:
        out[int(r["lane"])] = np.uint64(r["w"] % (1 << 64))
    return BloomFilter(out, n_hashes, normalize)


def bloom_probe(
    df: DataFrame,
    bloom: BloomFilter,
    key_col,
    id_col: str,
    hash_impl: str = "arrow",
) -> DataFrame:
    """(id, maybe_seen): True when EVERY hash bit is set (possible
    false positives at the filter's design rate, no false negatives —
    guaranteed because n_hashes/normalize come FROM the artifact, so a
    build/probe mismatch cannot happen). NULL keys probe False (the
    build skipped them). The id column passes through untouched (any
    type — string/UUID ids work like the rest of the dedup family).
    The artifact broadcasts inside the kernel closure; probe cost is
    independent of the seen-corpus size, and the kernel is fully
    vectorized (one gather per Arrow batch, not per row).
    ``hash_impl`` as in :func:`build_bloom` ('arrow' hashes inside the
    kernel; 'catalyst' keeps the Column fold — bit-identical for all
    text incl. astral planes, parity pinned)."""
    if hash_impl not in ("arrow", "catalyst"):
        raise ValueError(f"hash_impl must be 'arrow' or 'catalyst', got {hash_impl!r}")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    if bloom.normalize:
        key = normalize_text(key)
    blm = bloom.bits  # captured; broadcast once per task set
    kk = bloom.n_hashes
    mb = bloom.m_bits

    if hash_impl == "arrow":
        # no rebalance() — same A/B verdict as the build kernel above
        src = df.select(
            F.col(id_col).alias("id"), key.cast("string").alias("k")
        )
        id_field = src.schema["id"]

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                valid = pdf["k"].notna()
                hit = np.zeros(len(pdf), dtype=bool)
                if valid.any():
                    P = _positions_batch(list(pdf.loc[valid, "k"]), mb, kk)
                    bits = (blm[P >> 6] >> (P & 63).astype(np.uint64)) & np.uint64(1)
                    hit[valid.to_numpy()] = bits.all(axis=1)
                yield pd.DataFrame({"id": pdf["id"], "maybe_seen": hit})

    else:
        src = df.select(
            F.col(id_col).alias("id"),
            F.when(key.isNotNull(), _positions(key, mb, kk)).alias("ps"),
        )
        id_field = src.schema["id"]

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                valid = pdf["ps"].notna()
                hit = np.zeros(len(pdf), dtype=bool)
                if valid.any():
                    P = np.vstack(
                        [np.asarray(v, dtype=np.int64) for v in pdf.loc[valid, "ps"]]
                    ).reshape(-1, kk)
                    bits = (blm[P >> 6] >> (P & 63).astype(np.uint64)) & np.uint64(1)
                    hit[valid.to_numpy()] = bits.all(axis=1)
                yield pd.DataFrame({"id": pdf["id"], "maybe_seen": hit})

    return src.mapInPandas(
        kernel,
        T.StructType(
            [id_field, T.StructField("maybe_seen", T.BooleanType())]
        ),
    )


def poly_hash_py(s: str, base: int = 31, mod: int = (1 << 31) - 1) -> int:
    """Pure-Python twin of ``functions.text.poly_hash`` — IDENTICAL
    Horner arithmetic (``ord`` == Spark's ``ascii`` codepoint for the
    corpora this package targets), so kernel-side hashing (e.g. the
    streaming Bloom state) produces the same bits as the Catalyst
    build path."""
    h = 0
    for ch in s:
        h = (h * base + ord(ch)) % mod
    return h


def km_positions_py(key: str, m_bits: int, n_hashes: int) -> list[int]:
    """Kirsch-Mitzenmacher positions, Python twin of ``_positions``
    (same h1/h2 bases, same odd-step OR, same modulo)."""
    h1 = poly_hash_py(key, 31)
    h2 = poly_hash_py(key, 131) | 1
    return [(h1 + i * h2) % m_bits for i in range(n_hashes)]
