"""Physical-layout helpers.

`rebalance` fixes the small-file / CPU-heavy mismatch: a 5 MB parquet
file arrives as ONE input split, so an expression-heavy per-row stage
(shingling, LSH signatures, hashing) runs on one core while 31 idle.
At real scale (100 TB → tens of thousands of splits) the input is
already wider than the cluster and the helper is a no-op — it only
adds a round-robin shuffle when the scan is narrower than the
available parallelism, where the shuffle of a few skinny rows is
orders of magnitude cheaper than the serialized compute it unblocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition to ``factor × defaultParallelism`` iff the
    DataFrame currently has fewer partitions than that target.

    Call it immediately before a CPU-bound per-row stage. Safe at any
    scale: wide inputs (the 100 TB case) skip the shuffle entirely.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # streaming DataFrames have no rdd
        return df
    if current >= target:
        return df
    return df.repartition(target)
