"""Similarity search over embedding columns (array<float>).

Spark-first: dot products and norms are built-in higher-order array
functions (zip_with + aggregate) running inside codegen — no UDFs, no
Python. Two strategies:

  * brute-force top-k — exact; query side is small and broadcast, so
    the big side streams once with no shuffle. The 100 TB baseline.
  * LSH-bucketed (signed random projections) — candidates meet in
    hash buckets (equi-join on compact keys) and only candidates get
    exact scoring; trades recall for a ~bucket-fraction of the work.

The reference has no vector surface; these are north-star extensions
(BASELINE.json). Deterministic everywhere: projection planes derive
from xxhash64 of (plane, dim), not RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tableone_pyspark_spark.plans.layout import rebalance


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (JVM-side, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _seq_dot(A, B):
    """Row-wise dot in STRICT left-fold order — vectorized across rows,
    sequential across dims — so results are bit-identical to the
    Catalyst ``aggregate(zip_with(...))`` fold (and to a naive loop in
    any engine, e.g. the DuckDB oracle). numpy's ``.sum`` uses pairwise
    summation, which differs in the last ulp and can flip ROUND(x, 6)
    on ties."""
    import numpy as np

    acc = np.zeros(len(A), dtype=np.float64)
    for j in range(A.shape[1]):
        acc += A[:, j] * B[:, j]
    return acc


def _vstack(vecs):
    import numpy as np

    return np.vstack([np.asarray(x, dtype=np.float64) for x in vecs])


def dot_arrow():
    """Pandas-UDF dot product: one numpy batch op per Arrow batch in the
    candidate-rescore hot loop. Spark's higher-order functions
    (``aggregate``/``zip_with``/``transform``) evaluate interpreted —
    per element, per row — so the builtin ``dot`` costs ~100× more CPU
    per pair; dense batch linear algebra is the documented Pandas-UDF
    carve-out. Bit-identical to ``dot`` (see ``_seq_dot``)."""
    import pandas as pd

    def _dot(a, b):
        if a.empty:
            return pd.Series([], dtype="float64")
        return pd.Series(_seq_dot(_vstack(a), _vstack(b)))

    return F.pandas_udf(_dot, "double")


def unit_normalize_arrow():
    """Pandas-UDF unit normalization, bit-identical to
    ``unit_normalize`` (left-fold norm, IEEE double divide). The
    Catalyst version inlines the full norm expression into the
    ``transform`` lambda, re-evaluating it per ELEMENT — O(d²)
    interpreted work per vector; this is O(d) vectorized."""
    import pandas as pd

    def _norm(a):
        if a.empty:
            return pd.Series([], dtype=object)
        import numpy as np

        V = _vstack(a)
        n = np.sqrt(_seq_dot(V, V))
        return pd.Series(list(V / n[:, None]))

    return F.pandas_udf(_norm, "array<double>")


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def unit_normalize(a: Column) -> Column:
    """Scale to unit L2 norm — do this ONCE per vector before any
    pairwise stage; cosine then degenerates to a plain dot product
    (3× less array arithmetic in the O(N²)/O(candidates) inner loop)."""
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def _normed_corpus(
    vectors: DataFrame, id_col: str, vec_col: str, arrow: bool
) -> DataFrame:
    """Unit-normalized corpus (``_id``, ``n_vec``) — session-memoized +
    persisted per (corpus plan, params): every similarity consumer
    (brute/LSH top-k, near-dup pairs, recall gates) needs exactly this
    projection, and re-normalizing the corpus per query is pure waste.
    Consumers re-alias ``_id`` to their own id name (zero-cost
    projection over the persisted frame)."""
    from tableone_pyspark_spark.core.memo import memo_df, memo_key

    norm = unit_normalize_arrow() if arrow else unit_normalize
    key = memo_key(vectors, id_col, vec_col, bool(arrow), "normed-v1")
    return memo_df(
        "normed_corpus",
        key,
        lambda: rebalance(vectors.select(id_col, vec_col)).select(
            F.col(id_col).alias("_id"), norm(F.col(vec_col)).alias("n_vec")
        ),
    )


def _srp_bucket_index(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    tables: int,
    planes: int,
    norm_arrow: bool,
    bucket_arrow: bool,
) -> DataFrame:
    """Exploded multi-table SRP bucket index (``_id``, table, bucket)
    over the memoized normalized corpus — itself memoized + persisted:
    the bucket index is the LSH analogue of the IVF assignment, built
    once per corpus and probed by every LSH consumer."""
    from tableone_pyspark_spark.core.memo import memo_df, memo_key

    normed = _normed_corpus(vectors, id_col, vec_col, norm_arrow)
    key = memo_key(
        vectors, id_col, vec_col, dim, tables, planes,
        bool(norm_arrow), bool(bucket_arrow), "srp-v1",
    )
    return memo_df(
        "srp_buckets",
        key,
        lambda: normed.select(
            "_id",
            F.explode(
                _lsh_table_structs(F.col("n_vec"), dim, tables, planes, bucket_arrow)
            ).alias("tb"),
        ).select("_id", "tb.table", "tb.bucket"),
    )


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool = False,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` (small) is broadcast against ``vectors`` (huge): the
    join is a BroadcastNestedLoopJoin — one streaming pass over the big
    side, no shuffle of the vectors. Ranking is per-query with a
    window; ties break on neighbor id so results are deterministic.
    ``arrow=True`` runs normalize + dot as numpy batch kernels with
    bit-identical results (``_seq_dot``); default stays in-JVM because
    the BNLJ duplicates each vector per query — shipping those
    expanded pairs over Arrow costs more than the interpreted fold
    saves (measured 2×). Returns (query_id, neighbor_id, cos) with
    rank <= k.
    """
    norm = unit_normalize_arrow() if arrow else unit_normalize
    dotf = dot_arrow() if arrow else dot
    q = queries.select(
        F.col(id_col).alias("query_id"),
        norm(F.col(vec_col)).alias("q_vec"),
    )
    v = _normed_corpus(vectors, id_col, vec_col, arrow).select(
        F.col("_id").alias("neighbor_id"), "n_vec"
    )
    scored = (
        v.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(dotf(F.col("q_vec"), F.col("n_vec")), 6))
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _plane_weights(plane_id: int, dim: int) -> list[float]:
    """Deterministic ±1 weights for one projection plane, derived from
    md5(plane_id:d) — no RNG state, identical everywhere, computed once
    on the driver and shipped as a constant array literal (Catalyst
    folds it; nothing is recomputed per row)."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"{plane_id}:{d}".encode()).digest()
        out.append(1.0 if h[0] & 1 else -1.0)
    return out


def _plane_lit(plane_id: int, dim: int) -> Column:
    return F.array(*[F.lit(w) for w in _plane_weights(plane_id, dim)])


def srp_signature(vec: Column, dim: int, planes: int = 16, base: int = 0) -> Column:
    """Signed-random-projection LSH bucket id (one long): bit p is the
    sign of the projection onto constant plane ``base + p``."""
    sig = None
    for p in range(planes):
        proj = dot(vec, _plane_lit(base + p, dim))
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, p)
        sig = term if sig is None else sig.bitwiseOR(term)
    return sig


def _lsh_tables(vec: Column, dim: int, tables: int, planes: int) -> Column:
    """Array of (table, bucket) structs — one SRP bucket per hash table.
    Table t uses planes [t·planes, (t+1)·planes) of the constant-plane
    family, so tables are independent."""
    entries = []
    for t in range(tables):
        sig = srp_signature(vec, dim, planes, base=t * planes)
        entries.append(F.struct(F.lit(t).alias("table"), sig.alias("bucket")))
    return F.array(*entries)


def _srp_buckets_arrow(dim: int, tables: int, planes: int):
    """Arrow-vectorized SRP bucketing: ONE pandas UDF computes every
    table's bucket id as a (tables·planes × dim) numpy matmul per batch.

    Produces bit-identical buckets to the pure-Catalyst
    ``_lsh_tables`` path (same ``_plane_weights`` family, same sign
    convention — pinned by tests), but the plan carries a single
    compact UDF call instead of tables·planes expanded dot-product
    expression trees, whose whole-stage-codegen compile alone costs
    seconds. Dense linear algebra is the documented carve-out for
    Pandas UDFs (batch matmul is not expressible efficiently in
    builtin array functions). Returns array<long> indexed by table.
    """
    import numpy as np
    import pandas as pd

    W = np.array(
        [_plane_weights(t * planes + p, dim) for t in range(tables) for p in range(planes)]
    )  # (tables·planes, dim)
    pow2 = 1 << np.arange(planes, dtype=np.int64)

    def buckets(vecs):
        if vecs.empty:
            return pd.Series([], dtype=object)
        V = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (V @ W.T) > 0  # (n, tables·planes)
        B = bits.reshape(len(V), tables, planes).astype(np.int64) @ pow2
        return pd.Series(list(B))

    # positional form: the `from __future__ import annotations` in this
    # module would stringify pd.Series hints beyond the resolver's reach
    return F.pandas_udf(buckets, "array<long>")


def _lsh_table_structs(vec: Column, dim: int, tables: int, planes: int, arrow: bool) -> Column:
    """(table, bucket) struct array via either implementation."""
    if not arrow:
        return _lsh_tables(vec, dim, tables, planes)
    b = _srp_buckets_arrow(dim, tables, planes)(vec)
    return F.transform(
        b,
        lambda bucket, t: F.struct(t.alias("table"), bucket.alias("bucket")),
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    tables: int = 8,
    planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool = True,
) -> DataFrame:
    """Approximate top-k via multi-table SRP LSH: a candidate must share
    a bucket with the query in AT LEAST ONE of ``tables`` independent
    hash tables (the standard L-tables construction — single-table SRP
    has near-zero recall for the moderate-similarity neighbors real
    embedding corpora contain). Candidates get exact cosine re-scoring.

    Scale story: candidate generation is an equi-join on (table,
    bucket) — each vector appears ``tables`` times with a compact key;
    recall/cost trade via (tables, planes): more planes → smaller
    buckets (cheaper, lower recall); more tables → higher recall.
    Returns (query_id, neighbor_id, cos, rank) — rank <= k per query.
    """
    norm = unit_normalize_arrow() if arrow else unit_normalize
    dotf = dot_arrow() if arrow else dot
    normed = _normed_corpus(vectors, id_col, vec_col, arrow).select(
        F.col("_id").alias("neighbor_id"), "n_vec"
    )
    v = _srp_bucket_index(
        vectors, id_col, vec_col, dim, tables, planes, arrow, arrow
    ).select(F.col("_id").alias("neighbor_id"), "table", "bucket")
    q_normed = queries.select(
        F.col(id_col).alias("query_id"),
        norm(F.col(vec_col)).alias("q_vec"),
    )
    q = q_normed.select(
        "query_id",
        F.explode(_lsh_table_structs(F.col("q_vec"), dim, tables, planes, arrow)).alias("tb"),
    ).select("query_id", "tb.table", "tb.bucket")
    # candidate generation and dedup carry ONLY compact (query, neighbor)
    # id pairs — the vectors are joined back afterwards, so the distinct
    # shuffle moves 16-byte rows instead of kilobyte embedding payloads
    candidates = (
        v.join(F.broadcast(q), ["table", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        candidates.join(normed, "neighbor_id")
        .join(F.broadcast(q_normed), "query_id")
        .withColumn("cos", F.round(dotf(F.col("q_vec"), F.col("n_vec")), 6))
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def label_centroids(
    vectors: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid of an embedding column, long format
    (label, pos, centroid).

    posexplode → groupBy(label, pos) → avg is the idiomatic distributed
    centroid: partial aggregation collapses each map partition to at
    most |labels|·dim partial (sum, count) pairs before the shuffle, so
    the exchange is tiny regardless of row count — the same sufficient-
    statistics shape as the TableOne core. (A per-row array fold can't
    aggregate ACROSS rows; a pandas UDAF would leave codegen for no
    gain.)
    """
    return (
        vectors.select(label_col, F.posexplode(vec_col).alias("pos", "x"))
        .groupBy(label_col, "pos")
        .agg(F.round(F.avg("x"), 6).alias("centroid"))
    )


def quantize_int8_profile(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 quantization profile: scale =
    max|xᵢ|/127, qᵢ = floor(xᵢ/scale + 0.5) (round-half-up — identical
    rule in every engine), reporting reconstruction error and the
    quantized checksum WITHOUT materializing the int8 payload.

    The 4×-compression dry-run an embedding pipeline evaluates before
    re-encoding 100 TB of vectors: pure per-row Catalyst array math
    (no shuffle at all — the plan is scan → project), so it composes
    with any downstream write. Returns
    (id, scale, max_abs_err, sum_q) — sum_q pins the exact quantized
    values in aggregate, max_abs_err the fidelity.
    """
    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))) / F.lit(
        127.0
    )
    # all-zero vectors: divide by 1 instead of 0 (q = zeros, err = 0,
    # reported scale stays 0)
    div = F.when(scale > 0, scale).otherwise(F.lit(1.0))
    q = F.transform(v, lambda x: F.floor(x.cast("double") / div + F.lit(0.5)))
    err = F.array_max(
        F.zip_with(
            q, v, lambda qi, xi: F.abs(qi.cast("double") * scale - xi.cast("double"))
        )
    )
    sum_q = F.aggregate(q, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return vectors.select(
        F.col(id_col).alias("id"),
        F.round(scale, 6).alias("scale"),
        F.round(err, 6).alias("max_abs_err"),
        sum_q.alias("sum_q"),
    )


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool = False,
    strategy: str = "auto",
    dim: int = 64,
    tables: int = 8,
    planes: int = 4,
    brute_force_limit: int = 100_000,
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold.

    Two physical strategies, both applying the EXACT cosine predicate:

    * ``"brute"`` — O(N²) theta join (BroadcastNestedLoopJoin). Exact
      recall; only viable for bounded inputs (the verifier path).
    * ``"lsh"`` — SRP bucketing generates candidates via a shuffled
      EQUI-join on (table, bucket); only candidates are scored. The
      100 TB path: work scales with bucket occupancy, not N², at the
      cost of (tunable, multi-table) candidate recall. High-similarity
      pairs — the near-dup regime this operator exists for — collide
      with probability 1-(1-(1-θ/π)^planes)^tables per pair.
    * ``"auto"`` (default) — one metadata-cheap ``count()`` picks:
      brute force up to ``brute_force_limit`` rows, LSH above it, so
      the public default can never launch an unbounded cartesian.

    ``arrow`` defaults off for brute (the pair explosion would ship
    duplicated vectors across the Arrow boundary — in-JVM interpreted
    dot is ~10× faster there, measured); the LSH path always uses the
    Arrow bucket kernel (same measured carve-out as :func:`lsh_topk`).
    Returns (id_a, id_b, cos)."""
    if strategy == "auto":
        from tableone_pyspark_spark.core.memo import memo, memo_key

        n = memo("corpus_count", memo_key(vectors), lambda: vectors.count())
        strategy = "brute" if n <= brute_force_limit else "lsh"
    dotf = dot_arrow() if arrow else dot
    normed = _normed_corpus(vectors, id_col, vec_col, arrow).select(
        F.col("_id").alias("id_a"), F.col("n_vec").alias("va")
    )
    if strategy == "lsh":
        tb = _srp_bucket_index(
            vectors, id_col, vec_col, dim, tables, planes, arrow, True
        ).select(F.col("_id").alias("id_a"), "table", "bucket")
        # candidate shuffle carries only compact (id, id) pairs
        cand = (
            tb.join(
                tb.select(F.col("id_a").alias("id_b"), "table", "bucket"),
                ["table", "bucket"],
            )
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        pairs = cand.join(normed, "id_a").join(
            normed.select(F.col("id_a").alias("id_b"), F.col("va").alias("vb")),
            "id_b",
        )
    else:
        b = normed.select(F.col("id_a").alias("id_b"), F.col("va").alias("vb"))
        pairs = normed.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos", F.round(dotf(F.col("va"), F.col("vb")), 6))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
