"""read_table/write_table: format round-trips, partitioned layout with
pruning, single-file sink."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tableone_pyspark_spark.sources.io import read_table, write_table


def _nation(spark):
    return spark.read.parquet("/root/testdata/sf0.001/nation.parquet")


def test_roundtrip_formats(spark, tmp_path):
    n = _nation(spark)
    for fmt in ("parquet", "csv", "json", "orc"):
        p = str(tmp_path / fmt)
        write_table(n, p, fmt=fmt)
        back = read_table(spark, p, fmt=fmt, schema=n.schema)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, n.collect()))


def test_partitioned_write_prunes(spark, tmp_path):
    n = _nation(spark)
    p = str(tmp_path / "part")
    write_table(n, p, partition_by=["n_regionkey"])
    # hive-style layout on disk
    assert any(d.startswith("n_regionkey=") for d in os.listdir(p))
    back = read_table(spark, p).where(F.col("n_regionkey") == 1)
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter reaches the scan (pruning, not a post-filter)
    assert "PartitionFilters" in plan and "n_regionkey" in plan.split("PartitionFilters")[1][:200]
    assert back.count() == n.where(F.col("n_regionkey") == 1).count()


def test_single_file_sink(spark, tmp_path):
    n = _nation(spark)
    p = str(tmp_path / "single")
    write_table(n, p, single_file=True)
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(files) == 1


def test_bad_format_rejected(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        read_table(spark, "/tmp/x", fmt="avro")
    with pytest.raises(ValueError):
        write_table(_nation(spark), str(tmp_path / "x"), fmt="xml")


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge-join with no
    Exchange on either side (the write-time shuffle is amortized)."""
    from tableone_pyspark_spark.sources.io import write_bucketed

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(orders, "t_bk_orders", str(tmp_path / "o"), ["o_orderkey"], 8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_bk_lineitem", str(tmp_path / "l"), ["o_orderkey"], 8,
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_bk_orders").join(spark.table("t_bk_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == li.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_bk_orders")
        spark.sql("DROP TABLE IF EXISTS t_bk_lineitem")
