"""X138: the tablelog Python DataSource — batch time travel with
deletion vectors applied, and the streaming source whose offsets are
table versions (exactly-once append delivery, non-append guards)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tableone_pyspark_spark.sources import tablelog as tl
from tableone_pyspark_spark.sources.stream_source import TablelogDataSource


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(TablelogDataSource)
    return spark


def test_batch_read_time_travel_and_dv(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "src_tbl")
    df = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    tl.commit(spark, df.repartition(3), t)                      # v0
    tl.commit(spark, spark.createDataFrame([(100, 200)], "k long, v long"), t)  # v1
    tl.delete_rows(spark, t, F.col("k") % 5 == 0)               # v2

    # latest: deletion vectors applied
    got = spark.read.format("tablelog").load(t)
    assert got.count() == 40  # 51 - 11 multiples of 5 (0,5,...,45 and 100)
    assert got.where(F.col("k") % 5 == 0).count() == 0
    assert set(got.columns) == {"k", "v"}
    # parity with the JVM-side reader
    jvm_side = tl.read_version(spark, t)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, jvm_side.collect()))
    # time travel to v0
    v0 = spark.read.format("tablelog").option("version", 0).load(t)
    assert v0.count() == 50
    with pytest.raises(Exception, match="version 9"):
        spark.read.format("tablelog").option("version", 9).load(t).collect()


def test_streaming_source_versions_are_offsets(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "stream_src")
    ck = str(tmp_path / "ck")
    tl.commit(spark, spark.range(0, 5).select(F.col("id").alias("k")), t)   # v0
    tl.commit(spark, spark.range(5, 9).select(F.col("id").alias("k")), t)   # v1

    out = str(tmp_path / "out")

    def drain():
        # a FILE sink: the memory sink refuses checkpoint recovery,
        # and recovery is exactly what this test pins
        q = (
            spark.readStream.format("tablelog").load(t)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return sorted(r["k"] for r in spark.read.parquet(out).collect())

    assert drain() == list(range(9))
    # a new append delivers ONLY the new rows on restart (offsets
    # resume from the checkpoint — exactly-once per version)
    tl.commit(spark, spark.range(9, 12).select(F.col("id").alias("k")), t)  # v2
    assert drain() == list(range(12))
    # draining again with no new versions delivers nothing new
    assert drain() == list(range(12))


def test_streaming_source_non_append_guards(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "guard_src")
    tl.commit(spark, spark.range(5).select(F.col("id").alias("k")), t)      # v0
    tl.delete_rows(spark, t, F.col("k") == 0)                                # v1
    tl.commit(spark, spark.range(5, 7).select(F.col("id").alias("k")), t)   # v2

    def drain(name, ck, **opts):
        reader = spark.readStream.format("tablelog")
        for kk, vv in opts.items():
            reader = reader.option(kk, vv)
        q = (
            reader.load(t)
            .writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return sorted(r["k"] for r in spark.table(name).collect())

    # default: the delete version fails the stream loudly
    with pytest.raises(Exception, match="deletion"):
        drain("g1", "ck1")
    # ignore_deletes skips it; appended rows still flow
    assert drain("g2", "ck2", ignore_deletes="true") == [0, 1, 2, 3, 4, 5, 6]

    tl.commit(spark, spark.range(7, 8).select(F.col("id").alias("k")), t, mode="overwrite")  # v3
    with pytest.raises(Exception, match="overwrite"):
        drain("g3", "ck3", ignore_deletes="true")
    # ignore_changes RE-DELIVERS the overwrite's files (Delta's
    # ignoreChanges at-least-once contract) — never a silent skip
    assert drain("g4", "ck4", ignore_changes="true") == [0, 1, 2, 3, 4, 5, 6, 7]


def test_stream_source_review_fixes(registered, tmp_path):
    """Self-review r12 (each confirmed live before the fix): an empty
    version batch-reads as an empty frame; time travel plans with the
    REQUESTED version's schema; an overwrite-created v0 streams as the
    initial snapshot; starting_version skips vacuumed history."""
    spark = registered

    # (1) empty version: fully-deleted then optimized table
    t = str(tmp_path / "empty_tbl")
    tl.commit(spark, spark.range(5).select(F.col("id").alias("k")), t)
    tl.delete_rows(spark, t, F.lit(True))
    tl.optimize(spark, t)  # publishes files=[]
    out = spark.read.format("tablelog").load(t)
    assert out.count() == 0 and out.columns == ["k"]

    # (2) schema-changing overwrite: v0 (k long) vs v1 (s string)
    t2 = str(tmp_path / "schema_tbl")
    tl.commit(spark, spark.range(4).select(F.col("id").alias("k")), t2)
    tl.commit(
        spark,
        spark.createDataFrame([("x",)], "s string"),
        t2,
        mode="overwrite",
    )
    v0 = spark.read.format("tablelog").option("version", 0).load(t2)
    assert v0.columns == ["k"] and v0.count() == 4
    assert spark.read.format("tablelog").load(t2).columns == ["s"]

    # (3) overwrite-created v0 is the initial snapshot: streams fine
    t3 = str(tmp_path / "ow0_tbl")
    tl.commit(
        spark,
        spark.range(3).select(F.col("id").alias("k")),
        t3,
        mode="overwrite",
    )
    tl.commit(spark, spark.range(3, 5).select(F.col("id").alias("k")), t3)
    out3 = str(tmp_path / "out3")
    q = (
        spark.readStream.format("tablelog").load(t3)
        .writeStream.format("parquet").option("path", out3)
        .option("checkpointLocation", str(tmp_path / "ck_ow0"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert sorted(r["k"] for r in spark.read.parquet(out3).collect()) == [
        0, 1, 2, 3, 4,
    ]

    # (4) starting_version: begin past the (conceptually vacuumed) v0
    t4 = str(tmp_path / "sv_tbl")
    tl.commit(spark, spark.range(0, 3).select(F.col("id").alias("k")), t4)
    tl.commit(spark, spark.range(3, 6).select(F.col("id").alias("k")), t4)
    out4 = str(tmp_path / "out4")
    q = (
        spark.readStream.format("tablelog")
        .option("starting_version", "1")
        .load(t4)
        .writeStream.format("parquet").option("path", out4)
        .option("checkpointLocation", str(tmp_path / "ck_sv"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert sorted(r["k"] for r in spark.read.parquet(out4).collect()) == [
        3, 4, 5,
    ]


def test_stream_source_advice_r12(registered, tmp_path):
    """ADVICE r12: (1) a delivered version whose schema differs from
    the stream's pinned output schema fails fast with a clear error,
    not a raw pyarrow KeyError; (2) the executor read path and DV
    resolution go through pyarrow's FileSystem layer, so scheme://
    paths work (exercised via file://, the from_uri branch)."""
    spark = registered

    # (1) starting_version before a schema-changing overwrite
    t = str(tmp_path / "sch_chg")
    tl.commit(spark, spark.range(3).select(F.col("id").alias("k")), t)  # v0
    tl.commit(
        spark,
        spark.createDataFrame([("x",)], "s string"),
        t,
        mode="overwrite",
    )  # v1: different schema
    q = (
        spark.readStream.format("tablelog")
        .option("ignore_changes", "true")
        .option("starting_version", "0")
        .load(t)
        .writeStream.format("memory").queryName("sch_chg")
        .option("checkpointLocation", str(tmp_path / "ck_sch"))
        .trigger(availableNow=True).start()
    )
    with pytest.raises(Exception, match="schema changed at version 0"):
        q.awaitTermination()

    # (2) scheme:// paths through the pyarrow FS layer
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tableone_pyspark_spark.sources.stream_source import (
        _FilePartition,
        _dv_positions,
        _read_file,
    )

    p = tmp_path / "one.parquet"
    pq.write_table(pa.table({"k": [1, 2, 3, 4]}), str(p))
    part = _FilePartition("file://" + str(p), [1])  # row index 1 deleted
    from pyspark.sql.types import LongType, StructField, StructType

    k_schema = StructType([StructField("k", LongType(), True)]).json()
    got = [
        v
        for b in _read_file(part, ["k"], k_schema)
        for v in b.column("k").to_pylist()
    ]
    assert got == [1, 3, 4]

    dvp = tmp_path / "dv.parquet"
    pq.write_table(
        pa.table({"file_path": ["file:" + str(p)], "row_index": [2]}),
        str(dvp),
    )
    assert _dv_positions(["file://" + str(dvp)]) == {str(p): [2]}


def test_stream_first_batch_uses_checkpoint(registered, tmp_path):
    """X139: a fresh stream's first batch plans from the latest
    checkpoint's compact rows + tail docs (O(versions since
    checkpoint)), delivers exactly the same rows, and the pinned-
    schema guard still fires for versions covered by the checkpoint."""
    import tableone_pyspark_spark.sources.stream_source as ss

    spark = registered
    t = str(tmp_path / "ck_stream")
    for v in range(13):  # auto checkpoint at v10
        tl.commit(
            spark,
            spark.range(v * 3, v * 3 + 3).select(F.col("id").alias("k")),
            t,
        )
    assert tl.latest_checkpoint_version(spark, t) == 10

    # end-to-end delivery correctness through the real worker path
    out = str(tmp_path / "out_ck")
    q = (
        spark.readStream.format("tablelog").load(t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck_ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == list(
        range(39)
    )

    # the O(versions-since-checkpoint) claim, pinned IN-PROCESS: the
    # planning worker runs in a separate Python process, so a
    # monkeypatch around the writeStream drain counts nothing (review
    # r13 — the original assertion was vacuous over an empty list);
    # drive the reader directly instead
    doc_reads = []
    orig = ss._doc

    def counting(table, version):
        doc_reads.append(version)
        return orig(table, version)

    ss._doc = counting
    try:
        r = ss._TablelogStreamReader(t, False, False, None)
        cur = tl.current_version(spark, t)
        parts = r.partitions({"version": -1}, {"version": cur})
    finally:
        ss._doc = orig
    assert len(parts) > 0
    planning_reads = [v for v in doc_reads if v <= 10]
    assert planning_reads == [], sorted(set(doc_reads))
    assert doc_reads, "no doc reads at all — counting seam broken"
    # and the same plan WITHOUT the checkpoint delivers identical files
    orig_listing = ss._log_listing
    doc_reads.clear()
    ss._doc = counting
    try:
        ss._log_listing = lambda tb: (orig_listing(tb)[0], [])
        r2 = ss._TablelogStreamReader(t, False, False, None)
        parts2 = r2.partitions({"version": -1}, {"version": cur})
    finally:
        ss._doc = orig
        ss._log_listing = orig_listing
    assert sorted(p.path for p in parts) == sorted(p.path for p in parts2)
    assert min(doc_reads) == 0  # the full walk really went to the root

    # the schema guard fires for a version INSIDE the checkpoint range
    t2 = str(tmp_path / "ck_schema")
    for v in range(9):
        tl.commit(
            spark,
            spark.range(v, v + 1).select(F.col("id").alias("k")),
            t2,
        )
    tl.commit(
        spark,
        spark.createDataFrame([("x",)], "s string"),
        t2,
        mode="overwrite",
    )  # v9
    tl.commit(
        spark, spark.createDataFrame([("y",)], "s string"), t2
    )  # v10 -> auto checkpoint covering the schema change
    assert tl.latest_checkpoint_version(spark, t2) == 10
    q = (
        spark.readStream.format("tablelog")
        .option("ignore_changes", "true")
        .option("starting_version", "0")
        .load(t2)
        .writeStream.format("memory").queryName("ck_schema_sink")
        .option("checkpointLocation", str(tmp_path / "ck_sch2"))
        .trigger(availableNow=True).start()
    )
    with pytest.raises(Exception, match="schema changed at version 0"):
        q.awaitTermination()


def test_stream_shape_ignores_nested_nullability(registered, tmp_path):
    """Review r13 (verified live pre-fix): parquet read-back widens
    NESTED nullability too; the writer's append check (simpleString
    shapes) accepts it, so the stream's pinned-schema guard must as
    well — the old json-level type compare spuriously failed the
    stream with 'schema changed at version 1' over a legal log."""
    from pyspark.sql.types import LongType, StructField, StructType

    spark = registered
    schema = StructType(
        [
            StructField("k", LongType(), False),
            StructField(
                "s",
                StructType([StructField("a", LongType(), False)]),
                True,
            ),
        ]
    )
    t = str(tmp_path / "nested_tbl")
    df = spark.createDataFrame([(1, (10,)), (2, (20,))], schema)
    tl.commit(spark, df, t)                                    # v0
    tl.commit(spark, tl.read_version(spark, t), t)             # v1: the
    # table's own output — nested nullability widened, writer accepts
    out = str(tmp_path / "out_nested")
    q = (
        spark.readStream.format("tablelog").load(t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck_nested"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 4
    assert sorted(r["s"]["a"] for r in got.collect()) == [10, 10, 20, 20]


def test_change_feed_stream(registered, tmp_path):
    """X140: .option("read_changes") streams the change feed —
    appends as 'insert' rows, deletion-vector versions as 'delete'
    rows re-read by position (only the NEW vectors' positions),
    exactly-once across checkpoint restarts; a keyless overwrite
    mid-stream delivers the pre-overwrite LIVE view as 'delete' rows
    plus its files as 'insert' rows (X146, Delta's remove-all/add-all
    derivation) — rows already retracted by earlier vectors must NOT
    retract twice — and still serves as the initial snapshot when a
    fresh stream STARTS at it; batch read_changes and column
    collisions are refused."""
    spark = registered
    t = str(tmp_path / "cdf_tbl")
    tl.commit(spark, spark.range(0, 6).select(F.col("id").alias("k")), t)   # v0
    tl.commit(spark, spark.range(6, 10).select(F.col("id").alias("k")), t)  # v1
    tl.delete_rows(spark, t, F.col("k") % 3 == 0)  # v2: 0, 3, 6, 9

    out = str(tmp_path / "cdf_out")

    def drain():
        q = (
            spark.readStream.format("tablelog")
            .option("read_changes", "true").load(t)
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", str(tmp_path / "cdf_ck"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return {
            (r["k"], r["_change_type"], r["_commit_version"])
            for r in spark.read.parquet(out).collect()
        }

    expect = (
        {(k, "insert", 0) for k in range(6)}
        | {(k, "insert", 1) for k in range(6, 10)}
        | {(k, "delete", 2) for k in (0, 3, 6, 9)}
    )
    assert drain() == expect

    # a second delete delivers ONLY its new vectors' positions
    tl.delete_rows(spark, t, F.col("k") == 4)  # v3
    expect |= {(4, "delete", 3)}
    assert drain() == expect

    # a keyless overwrite mid-stream streams as retract-all +
    # insert-all (X146): the delete side is the pre-overwrite live
    # view ONLY — 0/3/6/9 (v2) and 4 (v3) were already retracted by
    # their vectors and must not retract twice
    tl.commit(
        spark,
        spark.range(100, 103).select(F.col("id").alias("k")),
        t,
        mode="overwrite",
    )  # v4
    expect |= {(k, "delete", 4) for k in (1, 2, 5, 7, 8)}
    expect |= {(k, "insert", 4) for k in (100, 101, 102)}
    assert drain() == expect

    # a FRESH feed starting AT the overwrite treats it as the snapshot
    out2 = str(tmp_path / "cdf_out2")
    q = (
        spark.readStream.format("tablelog")
        .option("read_changes", "true")
        .option("starting_version", "4")
        .load(t)
        .writeStream.format("parquet").option("path", out2)
        .option("checkpointLocation", str(tmp_path / "cdf_ck2"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert {
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in spark.read.parquet(out2).collect()
    } == {(k, "insert", 4) for k in (100, 101, 102)}

    # batch read_changes refused; reserved-column collision refused
    with pytest.raises(Exception, match="read_changes"):
        spark.read.format("tablelog").option(
            "read_changes", "true"
        ).load(t).collect()
    t2 = str(tmp_path / "cdf_clash")
    tl.commit(
        spark,
        spark.range(1).select(
            F.col("id").alias("k"), F.lit("x").alias("_change_type")
        ),
        t2,
    )
    with pytest.raises(Exception, match="_change_type"):
        spark.readStream.format("tablelog").option(
            "read_changes", "true"
        ).load(t2)


def test_change_feed_overwrite_edge_cases(registered, tmp_path):
    """X146 edges: a RESTORE-published overwrite (vectors riding the
    overwrite doc) must mask its own dv on the INSERT side — rows
    deleted at the restore target must not resurrect in the feed —
    while its delete side is the full pre-restore live view; and a
    schema-changing overwrite still fails the feed loudly (its delete
    side has no expression in the stream's pinned schema)."""
    spark = registered
    t = str(tmp_path / "cdf_ow_tbl")
    tl.commit(spark, spark.range(0, 10).select(F.col("id").alias("k")), t)  # v0
    tl.delete_rows(spark, t, F.col("k") % 2 == 0)                           # v1
    tl.commit(
        spark,
        spark.range(100, 103).select(F.col("id").alias("k")),
        t,
        mode="overwrite",
    )                                                                       # v2
    tl.restore(spark, t, 1)  # v3: overwrite re-publishing v1 files + dv

    out = str(tmp_path / "cdf_ow_out")
    q = (
        spark.readStream.format("tablelog")
        .option("read_changes", "true").load(t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", str(tmp_path / "cdf_ow_ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == (
        {(k, "insert", 0) for k in range(10)}
        | {(k, "delete", 1) for k in (0, 2, 4, 6, 8)}
        # v2 overwrite: retract v1's live view, insert the new files
        | {(k, "delete", 2) for k in (1, 3, 5, 7, 9)}
        | {(k, "insert", 2) for k in (100, 101, 102)}
        # v3 restore: retract v2's live view; the re-published files
        # insert MASKED by the restored vectors (odd keys only)
        | {(k, "delete", 3) for k in (100, 101, 102)}
        | {(k, "insert", 3) for k in (1, 3, 5, 7, 9)}
    )
    # the feed's net state equals the live table (MV-consumer view)
    inserted = {k for k, c, _ in got if c == "insert"}
    # every key is deleted at most once per insert; net = live view
    net: dict[int, int] = {}
    for k, c, _ in got:
        net[k] = net.get(k, 0) + (1 if c == "insert" else -1)
    assert {k for k, n in net.items() if n > 0} == {1, 3, 5, 7, 9}
    assert inserted == set(range(10)) | {100, 101, 102}

    # an ADDITIVE schema-changing overwrite now DELIVERS on a
    # restarted feed (X152): the new stream pins the evolved schema;
    # the delete side (the previous live view, which predates the new
    # column) NULL-fills it — the value readers actually see
    tl.commit(
        spark,
        spark.range(5).select(
            F.col("id").alias("k"), F.lit("x").alias("extra")
        ),
        t,
        mode="overwrite",
    )  # v4
    q = (
        spark.readStream.format("tablelog")
        .option("read_changes", "true").load(t)
        .writeStream.format("parquet")
        .option("path", out)  # the file sink's log is checkpoint-keyed
        .option("checkpointLocation", str(tmp_path / "cdf_ow_ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got4 = {
        (r["k"], r["extra"], r["_change_type"], r["_commit_version"])
        for r in spark.read.option("mergeSchema", "true")
        .parquet(out).collect()
        if r["_commit_version"] == 4
    }
    assert got4 == (
        {(k, None, "delete", 4) for k in (1, 3, 5, 7, 9)}
        | {(k, "x", "insert", 4) for k in range(5)}
    )
    # a NON-additive change (the dropped 'extra') still refuses: the
    # v4 state carries a column the restarted stream's pinned schema
    # (k only) lacks — its delete side is inexpressible
    tl.commit(
        spark, spark.range(3).select(F.col("id").alias("k")), t,
        mode="overwrite",
    )  # v5: drops 'extra'
    with pytest.raises(Exception, match="schema"):
        q = (
            spark.readStream.format("tablelog")
            .option("read_changes", "true").load(t)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "cdf_ow_out3"))
            .option("checkpointLocation", str(tmp_path / "cdf_ow_ck"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()


def test_stream_from_clone_honors_deletion_vectors(registered, tmp_path):
    """Review r13 (correctness): a shallow CLONE's v0 is the one
    version whose files carry vectors naming themselves — both the
    append stream's initial snapshot and the change feed's v0 'insert'
    delivery must mask them, or deleted rows resurrect in streams
    while batch reads exclude them."""
    spark = registered
    src = str(tmp_path / "cl_src")
    dst = str(tmp_path / "cl_dst")
    tl.commit(spark, spark.range(8).select(F.col("id").alias("k")), src)
    tl.delete_rows(spark, src, F.col("k") % 2 == 0)  # deletes 0,2,4,6
    tl.clone(spark, src, dst)
    live = [1, 3, 5, 7]

    # append stream: initial snapshot == batch read
    out = str(tmp_path / "cl_out")
    q = (
        spark.readStream.format("tablelog").load(dst)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", str(tmp_path / "cl_ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == live

    # change feed: v0 'insert' rows are the LIVE rows only
    out2 = str(tmp_path / "cl_out2")
    q = (
        spark.readStream.format("tablelog")
        .option("read_changes", "true").load(dst)
        .writeStream.format("parquet").option("path", out2)
        .option("checkpointLocation", str(tmp_path / "cl_ck2"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = {
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in spark.read.parquet(out2).collect()
    }
    assert rows == {(k, "insert", 0) for k in live}

    # and the clone's v0 row in a later checkpoint carries the dv list
    # so checkpoint-planned snapshots stay masked too
    for v in range(1, 11):
        tl.commit(
            spark,
            spark.range(100 + v, 101 + v).select(F.col("id").alias("k")),
            dst,
        )
    ck = tl._read_json(spark, tl._checkpoint_path(dst, 10))
    assert ck["history"][0].get("dv"), "clone v0 dv missing from checkpoint"
    out3 = str(tmp_path / "cl_out3")
    q = (
        spark.readStream.format("tablelog").load(dst)
        .writeStream.format("parquet").option("path", out3)
        .option("checkpointLocation", str(tmp_path / "cl_ck3"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(r["k"] for r in spark.read.parquet(out3).collect())
    assert got == live + [100 + v for v in range(1, 11)]


def test_starting_timestamp_stream(registered, tmp_path):
    """Delta's startingTimestamp: the stream's first delivered version
    resolves through version_at — commits at-or-after the instant
    (exact-stamp commits INCLUDED), before-first-commit = from the
    beginning, both-options raises."""
    spark = registered
    t = str(tmp_path / "sts_tbl")
    tl.commit(spark, spark.range(0, 3).select(F.col("id").alias("k")), t)   # v0
    tl.commit(spark, spark.range(3, 6).select(F.col("id").alias("k")), t)   # v1
    tl.commit(spark, spark.range(6, 9).select(F.col("id").alias("k")), t)   # v2
    marks = [tl._version_doc(spark, t, v)["committed_at"] for v in range(3)]

    def drain(out, ck, ts):
        q = (
            spark.readStream.format("tablelog")
            .option("starting_timestamp", repr(ts)).load(t)
            .writeStream.format("parquet").option("path", str(tmp_path / out))
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return sorted(
            r["k"] for r in spark.read.parquet(str(tmp_path / out)).collect()
        )

    # between v0 and v1: deliver v1 onward
    mid = (marks[0] + marks[1]) / 2
    assert drain("o1", "c1", mid) == [3, 4, 5, 6, 7, 8]
    # exactly at v1's stamp: v1 INCLUDED (at-or-after)
    assert drain("o2", "c2", marks[1]) == [3, 4, 5, 6, 7, 8]
    # before the first commit: everything
    assert drain("o3", "c3", marks[0] - 10) == list(range(9))
    # both options refuse (streamReader is constructed at START, so
    # the raise surfaces from the query, not from load())
    with pytest.raises(Exception, match="not both"):
        q = (
            spark.readStream.format("tablelog")
            .option("starting_timestamp", repr(marks[1]))
            .option("starting_version", "1").load(t)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "o4"))
            .option("checkpointLocation", str(tmp_path / "c4"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()


def test_cdf_stream_update_labels(registered, tmp_path):
    """r15 — ``.option('update_labels', 'true')``: the change-feed
    STREAM delivers an update-merge as update_preimage/
    update_postimage (fresh inserts stay 'insert'); without the
    option the delete/insert pair form is unchanged."""
    spark = registered
    t = str(tmp_path / "ul_tbl")
    tl.commit(
        spark,
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(4)], "k long, s string"
        ),
        t,
    )
    tl.merge_rows(
        spark, t,
        spark.createDataFrame(
            [(1, "upd1"), (50, "new")], "k long, s string"
        ),
        ["k"],
    )

    def drain(opts: dict, name: str):
        r = spark.readStream.format("tablelog").option(
            "read_changes", "true"
        )
        for kk, vv in opts.items():
            r = r.option(kk, vv)
        q = (
            r.load(t)
            .writeStream.format("memory").queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return {
            (row["k"], row["s"], row["_change_type"],
             row["_commit_version"])
            for row in spark.sql(f"SELECT * FROM {name}").collect()
        }

    labeled = drain({"update_labels": "true"}, "ul_on")
    assert (1, "v1", "update_preimage", 1) in labeled
    assert (1, "upd1", "update_postimage", 1) in labeled
    assert (50, "new", "insert", 1) in labeled
    assert {c for _, _, c, v in labeled if v == 0} == {"insert"}

    plain = drain({}, "ul_off")
    assert (1, "v1", "delete", 1) in plain
    assert (1, "upd1", "insert", 1) in plain
    assert not any("update" in c for _, _, c, _ in plain)


def test_subset_delivery_gated_by_pin_version(registered, tmp_path):
    """Review r15: the additive-subset delivery rule applies only to
    versions AT OR BELOW the version whose schema the stream pinned —
    a column-DROPPING overwrite committed after stream start must
    raise (delivering it would fabricate NULLs and misreport a schema
    change as data), while pre-start history still NULL-fills."""
    spark = registered
    t = str(tmp_path / "pin_tbl")
    tl.commit(
        spark,
        spark.createDataFrame([(1, "a")], "k long, v string"),
        t,
    )  # v0
    from tableone_pyspark_spark.sources.stream_source import (
        _TablelogCdfStreamReader,
        _TablelogStreamReader,
    )

    r = _TablelogStreamReader(t, False, True, None)   # pins (k, v) @ v0
    rc = _TablelogCdfStreamReader(t, None)
    # a later overwrite DROPS v — its shape is a subset of the pinned
    # one, but it is NOT pre-evolution history
    tl.commit(spark, spark.createDataFrame([(2,)], "k long"), t,
              mode="overwrite")  # v1
    with pytest.raises(ValueError, match="schema changed at version 1"):
        r.partitions({"version": -1}, {"version": 1})
    with pytest.raises(ValueError, match="schema changed at version 1"):
        rc.partitions({"version": -1}, {"version": 1})
    # a reader pinned AFTER the drop delivers v1 and NULL-fills v0?
    # No — v0 carries a column the new pinned shape LACKS: refused,
    # exactly the pre-existing non-additive contract
    r2 = _TablelogStreamReader(t, False, True, None)  # pins (k) @ v1
    with pytest.raises(ValueError, match="schema changed at version 0"):
        r2.partitions({"version": -1}, {"version": 1})
    assert r2.partitions({"version": 0}, {"version": 1})  # v1 alone ok
