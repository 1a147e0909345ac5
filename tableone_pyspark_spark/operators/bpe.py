"""Distributed BPE tokenizer: train merges on a corpus, encode with
them (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
Rare Words with Subword Units" — the GPT-2/Llama tokenizer family).

Spark-first shapes with explicit 100 TB stories:

  * train_bpe — the classic efficiency trick made distributed: the
    corpus collapses to a DISTINCT-WORD frequency table in ONE shuffle
    (map-side combined), and every merge round then runs on word
    TYPES weighted by counts — vocab-sized work (10-100M rows at web
    scale), never corpus-sized. Per round: one adjacent-pair weighted
    count (posexplode + groupBy), one 1-row argmax collect (count
    DESC, pair ASC — the deterministic tie-break), one pure-Catalyst
    ``F.aggregate`` fold that applies the merge to each word's token
    array. ``localCheckpoint`` every few rounds truncates the plan
    lineage exactly like the connected-components loop in
    operators/dedup.py. Driver state is just the merge list
    (n_merges × 2 strings).
  * bpe_encode — Arrow-batched ``mapInPandas`` applying the ranked
    merge list per word (the standard greedy lowest-rank loop). This
    is the documented UDF case: per-word iterative merging with a
    data-dependent loop bound has no Catalyst expression; the kernel
    memoizes per distinct word within each batch, payloads never
    leave the executor.

Word model: whitespace tokens of the shared ``normalize_text``
(lowercase, collapsed whitespace), each word a character sequence with
a ``</w>`` end-of-word marker appended to its final character — the
original BPE convention, so "low" and "lowest" share the "low" prefix
but "w" vs "w</w>" distinguish word-final contexts.

Documented boundary: the marker is the literal string ``</w>``, so a
corpus word CONTAINING that substring (markup fragments that survive
normalization) can mint mid-word tokens string-equal to genuine
word-final ones, conflating their pair counts and making the
detokenization rule (replace ``</w>`` with a space) insert spurious
spaces for those words. The proper fix is byte-level BPE with a
reserved out-of-alphabet marker (GPT-2); at this operator's seam,
strip or escape ``</w>`` upstream if the corpus can contain it.

No counterpart in the reference repo (no text surface); extends the
LLM-pipeline operator family (BASELINE.json north star).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tableone_pyspark_spark.functions.text import normalize_text

EOW = "</w>"


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) — the one corpus-sized pass; everything after runs on
    word types."""
    return (
        df.select(
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(toks: array<string>, n): each word split into characters with
    the end-of-word marker fused onto the final one."""
    chars = F.split(F.col("word"), "")
    toks = F.concat(
        F.slice(chars, 1, F.size(chars) - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(EOW))),
    )
    return words.select(toks.alias("toks"), "n")


def _apply_merges(toks: F.Column, pairs: list[tuple[str, str]]) -> F.Column:
    """Replace every adjacent (a_i, b_i) in ``toks`` with a_i||b_i for
    a TOKEN-DISJOINT batch of pairs — one pure Catalyst left fold
    (greedy leftmost-first per pair, matching the reference
    algorithm). Disjointness (no element or product of one pair
    appears in another — enforced by the trainer's batch selection)
    makes the single simultaneous pass equal to applying the pairs
    sequentially in any order."""
    lits = [(F.lit(a), F.lit(b), F.lit(a + b)) for a, b in pairs]

    def step(acc: F.Column, t: F.Column) -> F.Column:
        last = F.element_at(acc, -1)
        tail = F.slice(acc, 1, F.size(acc) - 1)
        w = None
        for la, lb, lab in lits:
            cond = (F.size(acc) > 0) & (last == la) & (t == lb)
            repl = F.concat(tail, F.array(lab))
            w = F.when(cond, repl) if w is None else w.when(cond, repl)
        return w.otherwise(F.concat(acc, F.array(t)))

    return F.aggregate(toks, F.array().cast("array<string>"), step)


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_count: int = 1,
    checkpoint_every: int = 8,
    min_word_count: int = 1,
    batch_merges: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list (rank = position). Stops early when no pair
    reaches ``min_count``. Deterministic: argmax ties break on the
    lexicographically smallest (a, b).

    ``min_word_count`` is the 100 TB lever for large merge counts:
    training on the frequency-truncated word table (drop types rarer
    than the threshold) shrinks every round's frame to the Zipf head,
    which carries nearly all pair mass — merges change negligibly
    while per-round cost drops by the tail fraction.

    ``batch_merges`` is the SEQUENTIAL-ROUND lever: commit up to that
    many pairs per Spark round, greedily taken in rank order under a
    token-disjointness rule (no element or concatenation of one taken
    pair may appear in another), so the batch's pre-computed counts
    stay EXACT (disjoint merges can neither create nor destroy each
    other's occurrences) and one fold applies them all. DOCUMENTED
    DEVIATION from strict BPE when > 1: strict training recounts
    after every single merge and may rank a pair CREATED by the
    previous merge next, which a batch cannot see until its next
    round — tokenizations stay valid (encode/detokenize round-trips
    regardless), the merge ORDER may differ. Default 1 = strict
    (differential-pinned against a pure-Python reference); production
    vocabularies combine both levers: tens of thousands of merges in
    thousands of rounds instead of one round each."""
    if batch_merges < 1:
        raise ValueError("batch_merges must be >= 1")
    wc = word_counts(df, text_col)
    if min_word_count > 1:
        wc = wc.where(F.col("n") >= min_word_count)
    words = _initial_symbols(wc)
    words = words.persist()
    words.count()  # materialize once; each round re-persists
    merges: list[tuple[str, str]] = []
    prev_ckpt = None  # released when the next checkpoint lands
    try:
        r = 0
        while len(merges) < n_merges:
            pairs = (
                words.select(
                    "n",
                    F.posexplode(F.slice("toks", 1, F.size("toks") - 1)).alias(
                        "i", "a"
                    ),
                    F.col("toks"),
                )
                .select(
                    "n", "a", F.element_at("toks", F.col("i") + 2).alias("b")
                )
                .groupBy("a", "b")
                .agg(F.sum("n").alias("c"))
            )
            want = min(batch_merges, n_merges - len(merges))
            # over-fetch so disjointness skips still fill the batch;
            # the FIRST candidate never conflicts, so a non-empty
            # collect always yields a non-empty batch
            top = (
                pairs.orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
                .limit(want if want == 1 else want * 4 + 8)
                .collect()
            )
            taken: set[str] = set()
            batch: list[tuple[str, str]] = []
            for row in top:
                if row["c"] < min_count:
                    break
                a, b = row["a"], row["b"]
                if a in taken or b in taken or a + b in taken:
                    continue
                taken.update((a, b, a + b))
                batch.append((a, b))
                if len(batch) == want:
                    break
            if not batch:
                break
            merges.extend(batch)
            nxt = words.select(_apply_merges(F.col("toks"), batch).alias("toks"), "n")
            r += 1
            if r % checkpoint_every == 0:
                # truncate the lineage of r chained folds (same pattern
                # as the label-propagation loop in operators/dedup.py)
                nxt = nxt.localCheckpoint(eager=True)
                if prev_ckpt is not None:
                    # DataFrame.unpersist() is a no-op for checkpoint
                    # RDD blocks (the cache manager doesn't track
                    # LogicalRDD plans) — free the superseded
                    # checkpoint's blocks explicitly so a 30-50k-round
                    # production run doesn't pile them up between GCs
                    _release_checkpoint(prev_ckpt)
                prev_ckpt = nxt
            else:
                nxt = nxt.persist()
                nxt.count()
            words.unpersist()
            words = nxt
    finally:
        words.unpersist()
        if prev_ckpt is not None:
            # training is over: the last checkpoint's blocks go too
            _release_checkpoint(prev_ckpt)
    return merges


def _release_checkpoint(df: DataFrame) -> None:
    """Moved to ``plans.layout.release_checkpoint`` (shared with the
    PageRank loop); kept as a thin alias for this module's callers."""
    from tableone_pyspark_spark.plans.layout import release_checkpoint

    release_checkpoint(df)


def _encode_schema(id_field: T.StructField) -> T.StructType:
    """Output schema for :func:`bpe_encode`; the id column keeps the
    source dtype (string/UUID ids pass through untyped — the
    dedup-family convention, same as bloom_probe)."""
    return T.StructType(
        [
            T.StructField("id", id_field.dataType, id_field.nullable),
            T.StructField("n_words", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
        ]
    )


def _encode_word(word: str, rank: dict[tuple[str, str], int]) -> list[str]:
    """Reference greedy algorithm: repeatedly merge the lowest-rank
    adjacent pair (leftmost on rank ties) until none applies."""
    toks = list(word[:-1]) + [word[-1] + EOW] if word else []
    while len(toks) > 1:
        best = None
        best_rank = None
        for i in range(len(toks) - 1):
            r = rank.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        toks[best : best + 2] = [toks[best] + toks[best + 1]]
    return toks


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize each document with the trained merge list. Returns
    (id, n_words, n_tokens, tokens). The merge list broadcasts inside
    the closure (n_merges pairs — KBs); the kernel memoizes encodings
    per distinct word within each Arrow batch."""
    rank = {pair: i for i, pair in enumerate(merges)}
    src = df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("words"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            rows = []
            for i, words in zip(pdf["id"], pdf["words"]):
                toks: list[str] = []
                n_words = 0
                if words is None:  # NULL text: defined empty row, not
                    words = []     # a task-killing TypeError
                for w in words:
                    if not w:
                        continue
                    n_words += 1
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, rank)
                        cache[w] = enc
                    toks.extend(enc)
                rows.append((i, n_words, len(toks), toks))
            yield pd.DataFrame(
                rows, columns=["id", "n_words", "n_tokens", "tokens"]
            )

    return src.mapInPandas(kernel, _encode_schema(src.schema["id"]))
