"""Tests for the events source, JSON stats, and streaming TableOne
(batch/stream equivalence of sufficient statistics)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tableone_pyspark_spark.functions import events as evf
from tableone_pyspark_spark.sources.testdata import load_events
from tableone_pyspark_spark.streaming.stream_stats import (
    run_stream_over_parquet,
    windowed_sufficient_stats,
)

from conftest import approx

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_events(spark, SF)


def test_events_schema(events):
    types = dict(events.dtypes)
    assert types["ts"] == "timestamp"
    assert types["ts_ns"] == "bigint"
    assert types["hour_id"] == "bigint"
    # hour_id consistent with the nanosecond timestamp (integer div —
    # float division is off by ±1 at int64-nanosecond magnitudes)
    bad = events.where(
        F.col("hour_id") != F.expr("ts_ns div 3600000000000")
    ).count()
    assert bad == 0


def test_props_k_extraction(spark):
    df = spark.createDataFrame(
        [('{"k": 87}',), ('{"k":3}',), ("{}",), (None,)], "props string"
    )
    rows = df.select(evf.props_k(F.col("props")).alias("k")).collect()
    assert [r["k"] for r in rows] == [87, 3, None, None]


def test_type_value_stats(events):
    rows = {r["event_type"]: r for r in evf.type_value_stats(events).collect()}
    assert set(rows) == {"click", "error", "purchase", "signup", "view"}
    total = sum(r["n"] for r in rows.values())
    assert total == events.count()


def test_stream_equals_batch(spark, events):
    import pyspark.sql.types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(SF)
        .select(
            F.timestamp_micros((F.col("ts") / 1000).cast("long")).alias("ts"),
            "event_type",
            "value",
        )
    )
    out = windowed_sufficient_stats(stream)
    assert out.isStreaming
    qry = (
        out.writeStream.format("memory")
        .queryName("t_stream_eq_batch")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    qry.awaitTermination()
    streamed = {
        (r["window_start"], r["event_type"]): r
        for r in spark.table("t_stream_eq_batch").collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): r
        for r in windowed_sufficient_stats(events.select("ts", "event_type", "value")).collect()
    }
    assert streamed.keys() == batch.keys()
    for k in batch:
        assert streamed[k]["n"] == batch[k]["n"]
        assert approx(streamed[k]["mean_value"], batch[k]["mean_value"], tol=1e-9)
        assert approx(streamed[k]["stddev_value"], batch[k]["stddev_value"], tol=1e-6)
