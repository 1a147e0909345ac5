"""General source/sink surface.

The reference never reads or writes files (its only source is a
caller-provided DataFrame — /root/reference/tableone_pyspark.py:20 —
and its only sink is the returned DataFrame); real pipelines need
typed, pruned, partition-aware IO, so this module provides it:

  * read_table  — parquet / csv / json with explicit schema support
    (schema inference is a full extra pass over csv/json at scale;
    always pass one in production).
  * write_table — partitioned writes (``partition_by`` enables
    partition pruning for downstream readers), bounded file sizes via
    ``maxRecordsPerFile``, and an opt-in ``single_file`` mode that
    coalesces at the SINK only (never mid-plan — a mid-plan
    coalesce(1) would serialize upstream stages, the reference's
    repartition(1) mistake at 13 sites, SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = ("parquet", "csv", "json", "orc")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Read ``path`` as ``fmt``. csv defaults to header=true.

    Column pruning and predicate pushdown reach the scan for
    parquet/orc automatically; for csv/json only column pruning
    applies, which is why columnar formats are the scale default.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; use one of {_FORMATS}")
    reader = spark.read
    if fmt == "csv":
        options.setdefault("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        # inference is an extra full scan — acceptable for small files,
        # pathological at scale; surface it rather than hiding it
        options.setdefault("inferSchema", "true")
    return reader.options(**options).format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int = 0,
    single_file: bool = False,
    **options,
) -> None:
    """Write ``df`` to ``path`` as ``fmt``.

    ``partition_by`` lays the data out hive-style so downstream readers
    prune partitions; ``max_records_per_file`` bounds output file size
    without a shuffle; ``single_file`` coalesces to one output file —
    only sensible for small results (a TableOne output, a report), and
    applied at the sink so upstream parallelism is untouched.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; use one of {_FORMATS}")
    if single_file:
        df = df.coalesce(1)
    writer = df.write.mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if max_records_per_file:
        options["maxRecordsPerFile"] = str(max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).format(fmt).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table (external, at
    ``path``) registered as ``table`` in the session catalog.

    Bucketing pre-shuffles ONCE at write time: two tables bucketed on
    the same key with the same bucket count join with NO exchange and
    (sorted buckets) no sort — the shuffle that dominates repeated
    large-table joins is paid a single time and amortized over every
    subsequent join/aggregation on that key. This is the co-location
    strategy for 100 TB fact-fact joins; verified shuffle-free by test.
    """
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )
