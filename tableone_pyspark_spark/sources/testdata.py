"""Parquet source layer for the testdata star schema.

One quirk needs handling: ``events.parquet`` has shipped with two
different physical types for ``ts`` across testdata generations:

  * legacy: INT64 TIMESTAMP(NANOS), which Spark's parquet reader
    rejects ([PARQUET_TYPE_ILLEGAL]; nanosecond timestamps are not a
    Spark SQL type). With ``spark.sql.legacy.parquet.nanosAsLong`` the
    column reads as a raw nanosecond count.
  * current: TIMESTAMP(MICROS) without timezone, which Spark reads as
    TIMESTAMP_NTZ.

Both are normalized to the same canonical projection:

  * ``ts``      — TimestampType at microsecond precision (session
                  timezone pinned to UTC so the instant equals the
                  file's naive wall-clock, matching DuckDB's reading),
  * ``ts_ns``   — int64 nanoseconds since epoch (lossless for the
                  legacy files; exact ×1000 of micros for current),
  * ``hour_id`` — epoch-hour bucket (tz-free, oracle-friendly).

All other tables load as-is. The schema probe reads only the parquet
footer (pyarrow), never row data.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

NS_PER_HOUR = 3_600_000_000_000
US_PER_HOUR = 3_600_000_000


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_ts_unit(sf_dir: str) -> str:
    """Physical unit of events.ts from the parquet footer: 'ns' | 'us'."""
    t = pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type
    s = str(t)
    if s.startswith("timestamp[ns") or s == "int64":
        return "ns"
    return "us"


def _pin_utc(spark: SparkSession) -> None:
    # The files carry naive (no-tz) wall-clock instants; DuckDB (the
    # oracle) reads them as-is. Pinning the session tz to UTC makes the
    # NTZ->timestamp cast instant-preserving on any host.
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{sf_dir}/events.parquet"
    _pin_utc(spark)
    if events_ts_unit(sf_dir) == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(path)
        # integer `div`, never float division: int64 nanos (~1.7e18)
        # exceed double's 53-bit exact-integer range, so x/1000 drifts
        # by ±1 µs
        return raw.select(
            F.col("event_id"),
            F.expr("timestamp_micros(ts div 1000)").alias("ts"),
            F.col("ts").alias("ts_ns"),
            F.expr(f"ts div {NS_PER_HOUR}").alias("hour_id"),
            F.col("user_id"),
            F.col("event_type"),
            F.col("value"),
            F.col("props"),
        )
    raw = spark.read.parquet(path)
    ts = F.col("ts").cast("timestamp")
    ts_us = F.unix_micros(ts)
    return raw.select(
        F.col("event_id"),
        ts.alias("ts"),
        (ts_us * F.lit(1000)).alias("ts_ns"),
        F.expr(f"unix_micros(cast(ts as timestamp)) div {US_PER_HOUR}").alias(
            "hour_id"
        ),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    )


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of :func:`load_events` (minus ts_ns/hour_id).

    The file-stream source needs an explicit schema, which must match
    the file's physical type — probed from the footer, same as the
    batch path. Canonical output columns: event_id, ts (TimestampType),
    user_id, event_type, value, props.
    """
    _pin_utc(spark)
    unit = events_ts_unit(sf_dir)
    ts_field = T.LongType() if unit == "ns" else T.TimestampNTZType()
    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_field),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ts = F.expr("timestamp_micros(ts div 1000)")
    else:
        ts = F.col("ts").cast("timestamp")
    return (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        # the file stream source wants a directory; select just the
        # events file out of the sf dir with a glob
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
        .select(
            F.col("event_id"),
            ts.alias("ts"),
            F.col("user_id"),
            F.col("event_type"),
            F.col("value"),
            F.col("props"),
        )
    )
