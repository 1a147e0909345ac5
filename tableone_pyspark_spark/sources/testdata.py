"""Parquet source layer for the testdata star schema.

One quirk needs handling: ``events.parquet`` stores ``ts`` as INT64
TIMESTAMP(NANOS), which Spark's parquet reader rejects
([PARQUET_TYPE_ILLEGAL]; nanosecond timestamps are not a Spark SQL
type). With ``spark.sql.legacy.parquet.nanosAsLong`` the column reads
as a raw nanosecond count, from which we derive:

  * ``ts``      — TimestampType at microsecond precision (instant-
                  preserving; nanos truncated),
  * ``ts_ns``   — the original int64 nanoseconds (lossless),
  * ``hour_id`` — epoch-hour bucket (tz-free, oracle-friendly).

All other tables load as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

NS_PER_HOUR = 3_600_000_000_000


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    # integer `div`, never float division: int64 nanos (~1.7e18) exceed
    # double's 53-bit exact-integer range, so x/1000 drifts by ±1 µs
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
