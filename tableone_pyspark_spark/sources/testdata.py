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
    return raw.select(
        "event_id",
        F.timestamp_micros((F.col("ts") / 1000).cast("long")).alias("ts"),
        F.col("ts").alias("ts_ns"),
        F.floor(F.col("ts") / F.lit(NS_PER_HOUR)).cast("long").alias("hour_id"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
