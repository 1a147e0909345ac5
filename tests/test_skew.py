"""Skew-mitigation helpers: result parity with the unsalted plans, and
the plan shapes that make them scale (salt in the first-stage keys)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tableone_pyspark_spark.plans.skew import salted_collect_set, salted_join


def test_salted_collect_set_parity(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plain = {
        r["l_returnflag"]: sorted(r["values"])
        for r in li.groupBy("l_returnflag")
        .agg(F.collect_set("l_linestatus").alias("values"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: sorted(r["values"])
        for r in salted_collect_set(li, ["l_returnflag"], "l_linestatus", n_salt=8).collect()
    }
    assert plain == salted


def test_salted_collect_set_two_stage_plan(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = salted_collect_set(li, ["l_returnflag"], "l_linestatus", n_salt=8)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # stage-1 aggregation must group on the salt (that's the skew spread)
    assert "__t1_salt__" in plan


def test_salted_join_parity(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .count()
    )
    o = orders.withColumnRenamed("o_custkey", "c_custkey")
    salted = (
        salted_join(o, cust, ["c_custkey"], n_salt=4)
        .groupBy("c_mktsegment")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_parity(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    # left join keeps unmatched left rows exactly once
    some = cust.where(F.col("c_custkey") % 3 == 0)
    plain = orders.join(some, "c_custkey", "left").count()
    salted = salted_join(orders, some, ["c_custkey"], n_salt=4, how="left").count()
    assert plain == salted
