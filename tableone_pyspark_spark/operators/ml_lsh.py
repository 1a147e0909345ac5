"""MLlib-backed approximate similarity operators — alternates to the
hand-rolled LSH in dedup.py / similarity.py, built on pyspark.ml
(MinHashLSH, BucketedRandomProjectionLSH, KMeans-IVF).

When to use which:
  * ``dedup.minhash_lsh_pairs`` (hand-rolled) — fully deterministic,
    oracle-friendly, no ML pipeline state.
  * these — battle-tested MLlib kernels with ``approxSimilarityJoin``'s
    optimized join planning; carry fitted-model state (seeded,
    reproducible). Both shapes shuffle only (key, bucket) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ml_minhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hash_tables: int = 8,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """Near-duplicate pairs via MLlib MinHashLSH over word-shingle
    vectors. Returns (id_a, id_b, jaccard) with exact Jaccard from the
    join's distance (distance = 1 − jaccard).
    """
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    from tableone_pyspark_spark.operators.dedup import word_shingles

    # cached: the vocabulary fit AND the transform both scan it.
    # CountVectorizer keeps the vocab on the driver — bounded by
    # vocabSize; for truly unbounded corpora switch to HashingTF
    # (stateless, at the cost of exact-Jaccard distances).
    shingle_sets = (
        word_shingles(df, text_col, id_col, n)
        .groupBy("id")
        .agg(F.collect_list("shingle").alias("shingles"))
        .cache()
    )
    cv = CountVectorizer(
        inputCol="shingles", outputCol="features", binary=True, minDF=1.0
    )
    model = cv.fit(shingle_sets)
    # MinHashLSH requires at least one non-zero entry
    feats = model.transform(shingle_sets).where(F.size("shingles") > 0)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    )
    mh_model = mh.fit(feats)
    joined = mh_model.approxSimilarityJoin(
        feats, feats, 1.0 - jaccard_threshold, distCol="dist"
    )
    return (
        joined.where(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            (F.lit(1.0) - F.col("dist")).alias("jaccard"),
        )
    )


def _to_mlvec(df: DataFrame, vec_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(
        "__mlvec", array_to_vector(F.col(vec_col).cast("array<double>"))
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: seeded KMeans partitions
    the corpus into ``n_centroids`` cells; each query scores only the
    ``n_probe`` cells whose centroids are nearest.

    Scale story: the fit is a one-time sampled KMeans; cell assignment
    is one streaming pass; the probe is an equi-join on cell id that
    touches ~n_probe/n_centroids of the corpus. Exact cosine re-scores
    survivors. Returns (query_id, neighbor_id, cos, rank).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.sql import Window

    from tableone_pyspark_spark.operators.similarity import dot, unit_normalize
    from tableone_pyspark_spark.plans.layout import rebalance

    v = _to_mlvec(rebalance(vectors.select(id_col, vec_col)), vec_col)
    km = KMeans(k=n_centroids, seed=42, featuresCol="__mlvec", predictionCol="cell")
    model = km.fit(v)

    assigned = model.transform(v).select(
        F.col(id_col).alias("neighbor_id"),
        unit_normalize(F.col(vec_col)).alias("n_vec"),
        "cell",
    )

    # centroid table is tiny: broadcast-join it against the queries and
    # keep each query's n_probe nearest cells
    centroids = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    cdf = queries.sparkSession.createDataFrame(centroids, "cell int, centroid array<double>")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        unit_normalize(F.col(vec_col)).alias("q_vec"),
        F.col(vec_col).cast("array<double>").alias("q_raw"),
    )
    probes = (
        q.crossJoin(F.broadcast(cdf))
        .withColumn(
            "dist2",
            F.aggregate(
                F.zip_with("q_raw", "centroid", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.asc("dist2"), F.asc("cell"))
            ),
        )
        .where(F.col("probe_rank") <= n_probe)
        .select("query_id", "q_vec", "cell")
    )

    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(dot(F.col("q_vec"), F.col("n_vec")), 6))
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
