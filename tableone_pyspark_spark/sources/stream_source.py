"""The commit log as a Spark DATA SOURCE — ``spark.read.format
("tablelog")`` and ``spark.readStream.format("tablelog")`` — built on
Spark 4's Python DataSource API (pyspark.sql.datasource). This is the
missing half of the streaming story: :func:`~tableone_pyspark_spark.\
sources.tablelog.streaming_commit` streams INTO a versioned table;
this source streams OUT of one (the Delta streaming-source idea —
table versions ARE the stream offsets, so a downstream job resumes
exactly where its checkpoint left off and each append version is
delivered exactly once).

    batch  : .option("version", N) time-travels; deletion vectors are
             applied per file (positions resolved at planning time)
    stream : offsets = {"version": N}; each micro-batch reads the
             files APPENDED in (start, end] — one InputPartition per
             file, executor-side pyarrow reads yielding Arrow record
             batches (never a driver-side row funnel)
             non-append versions fail the stream by default (their
             rows were already delivered — re-reading would
             double-count); opt out per Delta's knobs:
             .option("ignore_deletes", "true") skips deletion-vector
             versions, .option("ignore_changes", "true") additionally
             skips overwrites (downstream must tolerate missed
             rewrites — same contract as Delta's ignoreChanges)

Honest boundary: the source resolves the log and reads parquet
through pyarrow's FileSystem layer (local paths and any
``scheme://`` pyarrow supports — local/s3/hdfs builds vary), NOT the
JVM Hadoop FileSystem the writer side uses; for a plain JVM-side
batch read of a version, :func:`~tableone_pyspark_spark.sources.\
tablelog.read_version` remains the fast path (native parquet scan).
The value here is the STREAMING offset tracking and the uniform
source API.

No counterpart in the reference repo; composes X125/X129/X137.
"""

from __future__ import annotations

import json
from urllib.parse import unquote, urlparse

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


def _local_path(p: str) -> str:
    """Strip a file:/ scheme down to the plain path; leave other
    schemes for pyarrow's from_uri."""
    if p.startswith("file:"):
        return unquote(urlparse(p).path)
    return p


def _pa_fs(path: str):
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), _local_path(path)


def _current_version(table: str) -> int | None:
    from pyarrow import fs as pafs

    fsys, p = _pa_fs(table)
    sel = pafs.FileSelector(f"{p}/_log", allow_not_found=True)
    best = None
    for fi in fsys.get_file_info(sel):
        name = fi.base_name
        if name.startswith("v") and name.endswith(".json"):
            try:
                n = int(name[1:-5])
            except ValueError:
                continue
            best = n if best is None else max(best, n)
    return best


def _doc(table: str, version: int) -> dict:
    fsys, p = _pa_fs(table)
    with fsys.open_input_file(f"{p}/_log/v{version}.json") as f:
        return json.loads(f.read().decode("utf-8"))


def _norm(p: str) -> str:
    return unquote(urlparse(p).path) or p


def _dv_positions(dv_files: list[str]) -> dict[str, list[int]]:
    """path-normalized file -> sorted deleted row positions. Resolved
    ONCE at planning time on the driver — vectors are small by
    construction (positions, not rows)."""
    import pyarrow.parquet as pq

    out: dict[str, set[int]] = {}
    for f in dv_files:
        t = pq.read_table(_local_path(f), columns=["file_path", "row_index"])
        for fp, ri in zip(
            t.column("file_path").to_pylist(),
            t.column("row_index").to_pylist(),
        ):
            out.setdefault(_norm(fp), set()).add(int(ri))
    return {k: sorted(v) for k, v in out.items()}


class _FilePartition(InputPartition):
    def __init__(self, path: str, deleted: list[int]):
        self.path = path
        self.deleted = deleted


def _read_file(partition: _FilePartition, field_names: list[str]):
    """Executor-side: one parquet file -> Arrow record batches in the
    table's column order, with deletion-vector positions masked out
    by their global row index."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(_local_path(partition.path))
    deleted = set(partition.deleted)
    offset = 0
    for batch in pf.iter_batches():
        n = batch.num_rows
        if deleted:
            keep = [
                i for i in range(n) if (offset + i) not in deleted
            ]
            if len(keep) < n:
                batch = batch.take(pa.array(keep, type=pa.int64()))
        offset += n
        yield pa.RecordBatch.from_arrays(
            [batch.column(name) for name in field_names],
            names=field_names,
        )


class _TablelogBatchReader(DataSourceReader):
    def __init__(self, table: str, version: int | None):
        cur = _current_version(table)
        if cur is None:
            raise ValueError(f"no such versioned table: {table}")
        v = cur if version is None else version
        if not 0 <= v <= cur:
            raise ValueError(f"version {v} not in [0, {cur}] for {table}")
        doc = _doc(table, v)
        self._files = doc["files"]
        self._dv = _dv_positions(doc.get("dv") or [])
        self._names = [
            f["name"] for f in json.loads(doc["schema"])["fields"]
        ]

    def partitions(self):
        return [
            _FilePartition(f, self._dv.get(_norm(f), []))
            for f in self._files
        ]

    def read(self, partition):
        yield from _read_file(partition, self._names)


class _TablelogStreamReader(DataSourceStreamReader):
    def __init__(self, table: str, ignore_deletes: bool, ignore_changes: bool):
        self._table = table
        self._ignore_deletes = ignore_deletes or ignore_changes
        self._ignore_changes = ignore_changes
        cur = _current_version(table)
        if cur is None:
            raise ValueError(f"no such versioned table: {table}")
        self._names = [
            f["name"] for f in json.loads(_doc(table, cur)["schema"])["fields"]
        ]

    def initialOffset(self):
        return {"version": -1}

    def latestOffset(self):
        cur = _current_version(self._table)
        return {"version": -1 if cur is None else cur}

    def partitions(self, start, end):
        parts: list[_FilePartition] = []
        prev_files: set[str] | None = None
        for v in range(start["version"] + 1, end["version"] + 1):
            doc = _doc(self._table, v)
            mode = doc["mode"]
            if mode == "append":
                if prev_files is None:
                    prev_files = (
                        set(_doc(self._table, v - 1)["files"])
                        if v > 0
                        else set()
                    )
                parts += [
                    # appended files carry no vectors at their own
                    # version — deletes arrive as LATER versions
                    _FilePartition(f, [])
                    for f in doc["files"]
                    if f not in prev_files
                ]
            elif mode == "delete":
                if not self._ignore_deletes:
                    raise ValueError(
                        f"version {v} of {self._table} is a deletion — "
                        "already-delivered rows cannot be retracted "
                        "from an append stream; read the change feed "
                        "(table_changes) for retractions, or set "
                        ".option('ignore_deletes', 'true')"
                    )
            else:
                if not self._ignore_changes:
                    raise ValueError(
                        f"version {v} of {self._table} is an overwrite "
                        "— its rows were already delivered; consume "
                        "table_changes for updates, or set "
                        ".option('ignore_changes', 'true') to skip "
                        "rewrites entirely"
                    )
            prev_files = set(doc["files"])
        return parts

    def read(self, partition):
        yield from _read_file(partition, self._names)

    def commit(self, end):
        pass  # offsets are durable in the query checkpoint


class TablelogDataSource(DataSource):
    """``spark.dataSource.register(TablelogDataSource)`` then
    ``spark.read.format("tablelog").load(path)`` /
    ``spark.readStream.format("tablelog").load(path)``."""

    @classmethod
    def name(cls):
        return "tablelog"

    def _table(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "the tablelog source needs the table path — "
                ".load('<table>') or .option('path', ...)"
            )
        return path

    def schema(self):
        cur = _current_version(self._table())
        if cur is None:
            raise ValueError(f"no such versioned table: {self._table()}")
        return StructType.fromJson(json.loads(_doc(self._table(), cur)["schema"]))

    def reader(self, schema):
        v = self.options.get("version")
        return _TablelogBatchReader(
            self._table(), None if v is None else int(v)
        )

    def streamReader(self, schema):
        def flag(name: str) -> bool:
            return str(self.options.get(name, "false")).lower() == "true"

        return _TablelogStreamReader(
            self._table(), flag("ignore_deletes"), flag("ignore_changes")
        )
