"""Small-file compaction (sources/compact.py): FFD plan bounds,
execute correctness (row-identical, file-count reduction, untouched
files byte-identical), and the honest boundaries (hive layout,
existing destination, single-small-file no-op)."""

from __future__ import annotations

import hashlib
import os

import pytest

from pyspark.sql import functions as F

from tableone_pyspark_spark.sources.compact import (
    compact_parquet,
    list_data_files,
    plan_compaction,
)


def _md5(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()


@pytest.fixture()
def messy(spark, tmp_path):
    """A flat parquet dir with ~24 tiny files and one bigger file."""
    p = str(tmp_path / "messy")
    spark.range(0, 2400).withColumn("v", F.col("id") * 2).repartition(
        24
    ).write.parquet(p)
    # one deliberately larger file appended
    spark.range(10_000, 60_000).withColumn(
        "v", F.col("id") * 2
    ).coalesce(1).write.mode("append").parquet(p)
    return p


def test_plan_ffd_bounds(spark, messy):
    files = list_data_files(spark, messy)
    assert len(files) == 25
    big = max(b for _, b in files)
    target = big  # the big file sits right at/above the threshold cut
    plan = plan_compaction(spark, messy, target_bytes=target, small_threshold=0.9)
    sizes = dict(files)
    # every bin respects the target bound
    for members in plan.bins:
        assert sum(sizes[m] for m in members) <= target
        assert members  # no empty bins
    # bins + untouched = all files exactly once
    seen = [m for ms in plan.bins for m in ms] + plan.untouched
    assert sorted(seen) == sorted(p for p, _ in files)
    # the big file is untouched, the tiny ones all packed
    assert len(plan.untouched) == 1 and sizes[plan.untouched[0]] == big
    # FFD can't beat the volume lower bound and shouldn't exceed 24
    small_total = plan.small_bytes
    assert len(plan.bins) >= -(-small_total // target)
    assert len(plan.bins) < 24


def test_compact_round_trip(spark, messy, tmp_path):
    files = list_data_files(spark, messy)
    target = max(b for _, b in files)  # big file sits above the cut
    dst = str(tmp_path / "compacted")
    report = compact_parquet(
        spark, messy, dst, target_bytes=target, small_threshold=0.9
    )
    # the tiny files pack into bins; the big file is untouched
    assert report["n_input_files"] == 25
    assert report["n_bins"] >= 1
    assert report["n_output_files"] == report["n_bins"] + 1
    assert report["n_output_files"] < 25
    # data identical
    a = spark.read.parquet(messy).orderBy("id").collect()
    b = spark.read.parquet(dst).orderBy("id").collect()
    assert a == b
    # the untouched big file is a byte-for-byte copy
    plan = plan_compaction(
        spark, messy, target_bytes=target, small_threshold=0.9
    )
    src_big = plan.untouched[0].replace("file:", "")
    name = os.path.basename(src_big)
    assert _md5(src_big) == _md5(os.path.join(dst, name))


def test_boundaries(spark, tmp_path):
    # hive layout raises
    p = str(tmp_path / "hive")
    spark.range(100).withColumn("k", F.col("id") % 2).write.partitionBy(
        "k"
    ).parquet(p)
    with pytest.raises(ValueError, match="hive-partitioned"):
        plan_compaction(spark, p)
    # single small file: nothing to compact, everything untouched
    p2 = str(tmp_path / "single")
    spark.range(10).coalesce(1).write.parquet(p2)
    plan = plan_compaction(spark, p2)
    assert plan.bins == [] and len(plan.untouched) == 1
    # destination must not exist
    p3 = str(tmp_path / "multi")
    spark.range(100).repartition(4).write.parquet(p3)
    dst = str(tmp_path / "exists")
    os.makedirs(dst)
    with pytest.raises(ValueError, match="already exists"):
        compact_parquet(spark, p3, dst)
    # missing source
    with pytest.raises(ValueError, match="no such path"):
        list_data_files(spark, str(tmp_path / "nope"))
    # validation
    with pytest.raises(ValueError, match="target_bytes"):
        plan_compaction(spark, p3, target_bytes=0)
    with pytest.raises(ValueError, match="small_threshold"):
        plan_compaction(spark, p3, small_threshold=1.5)
    # two smalls that can't pair-fit: singleton bins demote to
    # untouched (no pointless lone re-encode — self-review r10)
    files = list_data_files(spark, p3)
    mx = max(b for _, b in files)
    plan = plan_compaction(
        spark, p3, target_bytes=int(mx * 1.5), small_threshold=1.0
    )
    for members in plan.bins:
        assert len(members) > 1
    assert sorted(
        [m for ms in plan.bins for m in ms] + plan.untouched
    ) == sorted(p for p, _ in files)

def test_atomic_commit_via_temp(spark, tmp_path):
    """ADVICE r10: output is staged in <dst>._compact_tmp and renamed
    on success — a leftover temp from a dead run is cleared by the
    retry, and no temp survives a successful commit."""
    src = str(tmp_path / "src")
    spark.range(600).repartition(6).write.parquet(src)
    dst = str(tmp_path / "out")
    tmp = dst + "._compact_tmp"
    # simulate a previous attempt that died mid-write: OUR temp carries
    # the owner marker and is cleared by the retry
    os.makedirs(tmp)
    with open(os.path.join(tmp, "._compact_owner"), "wb"):
        pass
    with open(os.path.join(tmp, "part-junk.parquet"), "wb") as f:
        f.write(b"half-written garbage")
    report = compact_parquet(spark, src, dst, target_bytes=1 << 20)
    assert report["n_output_files"] >= 1
    assert not os.path.exists(tmp)  # temp cleared and renamed away
    # the junk did not leak into the committed output
    assert spark.read.parquet(dst).count() == 600
    names = {os.path.basename(p) for p, _ in list_data_files(spark, dst)}
    assert "part-junk.parquet" not in names
    assert not os.path.exists(os.path.join(dst, "._compact_owner"))

    # a directory someone else parked at the reserved name is NEVER
    # deleted (self-review r11: bound the retry's blast radius to our
    # own leftovers)
    dst2 = str(tmp_path / "out2")
    foreign = dst2 + "._compact_tmp"
    os.makedirs(foreign)
    with open(os.path.join(foreign, "precious.txt"), "w") as f:
        f.write("not ours")
    with pytest.raises(ValueError, match="refusing to delete"):
        compact_parquet(spark, src, dst2, target_bytes=1 << 20)
    assert os.path.exists(os.path.join(foreign, "precious.txt"))


def test_write_target_sized(spark, tmp_path):
    import pytest as _pytest

    from tableone_pyspark_spark.sources.compact import (
        estimate_encoded_row_bytes,
        write_target_sized,
    )

    df = spark.range(0, 50_000).withColumn(
        "payload", F.concat(F.lit("x" * 40), F.col("id").cast("string"))
    )
    # estimate sanity: tens of bytes per row for a long + short string
    est = estimate_encoded_row_bytes(df)
    assert 1.0 < est < 500.0
    dst = str(tmp_path / "sized")
    target = 64 * 1024
    rep = write_target_sized(df.coalesce(1), dst, target_bytes=target)
    assert rep["rows_per_file"] >= 1
    files = list_data_files(spark, dst)
    assert len(files) > 1  # the cap actually split the single task
    # every file within the writer's documented ~2x tolerance of the
    # target (the last file may be arbitrarily small)
    sizes = sorted(b for _, b in files)
    for b in sizes[:-1] if len(sizes) > 1 else sizes:
        assert b <= 2 * target
    big = [b for b in sizes if b > target / 4]
    assert big  # and files are not pathologically tiny either
    # round trip
    assert spark.read.parquet(dst).count() == 50_000
    # validation
    with _pytest.raises(ValueError, match="target_bytes"):
        write_target_sized(df, str(tmp_path / "zz"), target_bytes=0)
    empty = spark.createDataFrame([], "id long")
    with _pytest.raises(ValueError, match="empty"):
        estimate_encoded_row_bytes(empty)
