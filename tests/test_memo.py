"""Session memo: hit/miss identity, invalidation, storage hygiene,
and input-snapshot staleness (ADVICE r3: mutable paths must not serve
stale artifacts; key=None must not leak persisted frames)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from tableone_pyspark_spark.core.memo import (
    memo,
    memo_clear,
    memo_df,
    memo_key,
)


def test_memo_df_hit_then_clear_unpersists(spark):
    d = spark.range(100).withColumn("x", F.col("id") * 2)
    key = memo_key(d, "t1")
    builds = []

    def build():
        builds.append(1)
        return d.groupBy((F.col("id") % 10).alias("g")).count()

    a = memo_df("test_artifact", key, build)
    b = memo_df("test_artifact", key, build)
    assert a is b and len(builds) == 1
    assert a.storageLevel != StorageLevel.NONE  # persisted on build
    assert memo_clear("test_artifact") == 1
    assert a.storageLevel == StorageLevel.NONE  # released
    c = memo_df("test_artifact", key, build)  # rebuilds after clear
    assert len(builds) == 2
    memo_clear("test_artifact")
    assert c.storageLevel == StorageLevel.NONE


def test_memo_key_none_bypasses_and_does_not_persist(spark):
    d = spark.range(10)
    out1 = memo_df("test_nokey", None, lambda: d.select("id"))
    out2 = memo_df("test_nokey", None, lambda: d.select("id"))
    assert out1 is not out2  # no caching
    assert out1.storageLevel == StorageLevel.NONE  # and no storage leak
    assert memo("test_nokey", None, lambda: 7) == 7


def test_memo_key_misses_when_input_files_change(spark, tmp_path):
    """Same path + same plan => same semanticHash, but an APPEND under
    the path must miss: the key includes the resolved file listing."""
    p = str(tmp_path / "mut")
    spark.range(5).write.parquet(p)
    k1 = memo_key(spark.read.parquet(p), "x")
    spark.range(5, 9).write.mode("append").parquet(p)
    k2 = memo_key(spark.read.parquet(p), "x")
    assert k1 is not None and k2 is not None
    assert k1 != k2


def test_memo_clear_scoped_by_tag(spark):
    d = spark.range(3)
    memo("test_tag_a", memo_key(d, 1), lambda: "A")
    memo("test_tag_b", memo_key(d, 1), lambda: "B")
    assert memo_clear("test_tag_a") == 1
    # tag_b survives a scoped clear
    assert memo("test_tag_b", memo_key(d, 1), lambda: "REBUILT") == "B"
    assert memo_clear() >= 1


def test_memo_key_same_name_overwrite_is_documented_stale_hit(spark, tmp_path):
    """The documented residual hole (core/memo.py module docstring):
    a byte-level overwrite of an existing file under the SAME name
    produces an IDENTICAL key — a stale HIT, by design, because no
    parquet writer rewrites in place and chasing mtimes would add a
    filesystem stat per query. This test pins the documented behavior
    and the documented escape hatch (memo_clear)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = str(tmp_path / "same" / "part-0.parquet")
    (tmp_path / "same").mkdir()
    pq.write_table(pa.table({"id": [1, 2, 3]}), f)
    d1 = spark.read.parquet(f)
    k1 = memo_key(d1, "x")
    got = memo("test_overwrite", k1, lambda: d1.count())
    assert got == 3

    # overwrite IN PLACE: same file name, different bytes
    pq.write_table(pa.table({"id": [1, 2, 3, 4, 5]}), f)
    d2 = spark.read.parquet(f)
    k2 = memo_key(d2, "x")
    assert k2 == k1  # same name -> same key: the documented stale hit
    assert memo("test_overwrite", k2, lambda: d2.count()) == 3  # stale

    # the documented hatch: clear, then the rebuild sees the new bytes
    memo_clear("test_overwrite")
    assert memo("test_overwrite", k2, lambda: d2.count()) == 5
