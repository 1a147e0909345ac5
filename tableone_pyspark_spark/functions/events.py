"""Event-stream analytics: JSON property extraction and time bucketing.

Batch operators over the ``events`` table (north-star extension;
the reference has no JSON/timestamp surface). All pure Catalyst
expressions — from_json / regexp extraction / date_trunc — so the same
plan runs over 100 TB of event logs with full predicate pushdown.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of the `props` JSON string in the testdata events table
PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


def props_k(c: Column) -> Column:
    """Extract the integer property ``k`` from the props JSON.

    Uses from_json (typed, tolerant of whitespace/ordering). A
    regexp-based fallback would be equivalent on this data; from_json
    is the idiomatic Spark path.
    """
    return F.from_json(c, PROPS_SCHEMA)["k"]


def hourly_type_stats(events: DataFrame) -> DataFrame:
    """Per (event_type, hour): count, avg value, sum value, avg k.

    One hash aggregation; the hour comes from date_trunc so partition
    pruning on a date-partitioned source still applies.
    """
    return (
        events.select(
            F.col("event_type"),
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("value"),
            props_k(F.col("props")).alias("k"),
        )
        .groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


def type_value_stats(events: DataFrame) -> DataFrame:
    """Per event_type: n, avg/min/max of value, avg of props.k."""
    return (
        events.select("event_type", "value", props_k(F.col("props")).alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )
