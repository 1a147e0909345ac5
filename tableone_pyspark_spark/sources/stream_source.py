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
             non-append versions fail the stream by default; opt
             out per Delta's knobs: .option("ignore_deletes", "true")
             skips deletion-vector versions (nothing new to deliver —
             Delta's ignoreDeletes), .option("ignore_changes",
             "true") additionally RE-DELIVERS overwrite versions'
             files (at-least-once: downstream sees duplicates of
             unchanged rows — Delta's ignoreChanges contract; rows an
             upsert newly inserted are never silently lost);
             .option("starting_version", N | "latest") picks the
             first delivered version (the vacuumed-history escape
             hatch — Delta's startingVersion); version 0 is the
             initial snapshot whatever its mode;
             .option("starting_timestamp", TS) resolves the first
             delivered version through X145's version_at instead
             (Delta's startingTimestamp: commits at-or-after TS;
             before-first-commit = from the beginning; mutually
             exclusive with starting_version), resolved ONCE at
             reader construction so a restart replays the WAL'd
             range, never a re-resolution against a moved log
    changes: .option("read_changes", "true") streams the CHANGE FEED
             instead (X140, Delta's readChangeFeed): appends as
             'insert' rows, deletion-vector versions as 'delete' rows
             re-read by position from the original files, MERGE
             versions as the exact delete+insert pair (X144), and
             keyless overwrites as the previous live view retracted +
             the new files inserted (X146 — Delta's remove-all/
             add-all derivation), stamped with _change_type /
             _commit_version — the retraction feed an incremental
             aggregate consumes; only a SCHEMA-CHANGING overwrite
             refuses (its delete side has no expression in the
             stream's pinned schema)

Honest boundary: the source resolves the log and reads parquet
through pyarrow's FileSystem layer (local paths and any
``scheme://`` pyarrow supports — local/s3/hdfs builds vary), NOT the
JVM Hadoop FileSystem the writer side uses; for a plain JVM-side
batch read of a version, :func:`~tableone_pyspark_spark.sources.\
tablelog.read_version` remains the fast path (native parquet scan).
The value here is the STREAMING offset tracking and the uniform
source API.

Second honest boundary (r15, investigated and measured): NO
per-batch admission control (Delta's maxFilesPerTrigger /
maxBytesPerTrigger) — a fresh stream over a long backlog plans it as
ONE batch. The Python DataSource API cannot express it safely:
``latestOffset()`` receives no start offset (the JVM side owns
SupportsAdmissionControl's ``(start, limit)`` signature and does not
forward it), the availableNow wrapper pins the end offset from the
FIRST latestOffset call before the reader has learned any engine
state, and a reader-side pacing cursor misjudged on restart would
return an offset BELOW the WAL's committed one — the engine then
plans a backward batch and re-delivers committed versions
(duplicates). The driver-funneling SimpleDataSourceStreamReader DOES
carry the needed read(start) shape but ships every row through the
driver — unacceptable at scale. Until the Python API forwards the
start offset, pace a backlog explicitly with
``.option("starting_version", N)`` checkpoints per slice.

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

# pure-Python, pyspark-free — safe in planning workers with no JVM
from tableone_pyspark_spark.sources.log_delta import version_delta


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


def _log_listing(table: str) -> tuple[int | None, list[int]]:
    """ONE _log/ listing returning (current version, sorted checkpoint
    versions) — the shared parse for both maxima (review r13: four
    near-identical listing loops, and a LIST per lookup is the
    expensive primitive on object stores)."""
    from pyarrow import fs as pafs

    fsys, p = _pa_fs(table)
    sel = pafs.FileSelector(f"{p}/_log", allow_not_found=True)
    best = None
    cks: list[int] = []
    for fi in fsys.get_file_info(sel):
        name = fi.base_name
        if name.startswith("_checkpoint_v") and name.endswith(".json"):
            try:
                cks.append(int(name[len("_checkpoint_v"):-5]))
            except ValueError:
                continue
        elif name.startswith("v") and name.endswith(".json"):
            try:
                n = int(name[1:-5])
            except ValueError:
                continue
            best = n if best is None else max(best, n)
    return best, sorted(cks)


def _current_version(table: str) -> int | None:
    return _log_listing(table)[0]


#: X160 — this DataSource's supported reader features; byte-parity
#: with tablelog.READER_FEATURES (kept local: planning workers must
#: stay pyspark-free; test_column_mapping pins the equality). A doc
#: requiring more refuses loudly instead of misreading (e.g.
#: NULL-filling a renamed column).
_READER_FEATURES = frozenset({"colmap", "dv", "widen"})


def _doc(table: str, version: int) -> dict:
    fsys, p = _pa_fs(table)
    with fsys.open_input_file(f"{p}/_log/v{version}.json") as f:
        doc = json.loads(f.read().decode("utf-8"))
    missing = set(doc.get("reader_requires") or []) - _READER_FEATURES
    if missing:
        raise ValueError(
            f"version {version} of {table} requires reader features "
            f"{sorted(missing)} this build does not support — upgrade "
            "the library before reading this table"
        )
    return doc


def _latest_checkpoint(table: str, max_version: int) -> int | None:
    """Greatest checkpointed version <= max_version (X139)."""
    cks = [n for n in _log_listing(table)[1] if n <= max_version]
    return cks[-1] if cks else None


def _checkpoint_doc(table: str, version: int) -> dict:
    fsys, p = _pa_fs(table)
    with fsys.open_input_file(
        f"{p}/_log/_checkpoint_v{version}.json"
    ) as f:
        return json.loads(f.read().decode("utf-8"))


def _norm(p: str) -> str:
    return unquote(urlparse(p).path) or p


def _version_at(table: str, ts_raw: str) -> int:
    """X145 — the pyarrow-side twin of ``tablelog.version_at``:
    greatest version with committed_at <= ts, newest-first scan.
    ``ts_raw`` is the DataSource option string — epoch seconds or an
    ISO-8601 timestamp."""
    try:
        ts = float(ts_raw)
    except ValueError:
        from datetime import datetime

        ts = datetime.fromisoformat(ts_raw).timestamp()
    cur = _current_version(table)
    if cur is None:
        raise ValueError(f"no such versioned table: {table}")
    for v in range(cur, -1, -1):
        if _doc(table, v)["committed_at"] <= ts:
            return v
    raise ValueError(
        f"timestamp {ts_raw} is before {table}'s first commit"
    )


def _widened(schema_json: str) -> StructType:
    """The doc's schema with nullability WIDENED to true at every
    nesting level — the declared READ schema. Parquet read-back widens
    nullability (the writer's own append contract ignores it), and a
    merge/append can land NULLs in a column an early commit recorded
    as non-nullable: declaring that stale non-nullability to Spark
    makes the Arrow accessor throw 'Value at index is null' mid-read
    (review r14, reproduced live on a merged NULL key). Delta/parquet
    sources read everything as nullable for the same reason."""
    from pyspark.sql.types import ArrayType, MapType

    def widen(dt):
        if isinstance(dt, StructType):
            return StructType(
                [
                    type(f)(f.name, widen(f.dataType), True, f.metadata)
                    for f in dt.fields
                ]
            )
        if isinstance(dt, ArrayType):
            return ArrayType(widen(dt.elementType), True)
        if isinstance(dt, MapType):
            return MapType(widen(dt.keyType), widen(dt.valueType), True)
        return dt

    return widen(StructType.fromJson(json.loads(schema_json)))


def _shape(schema_json: str) -> list[tuple]:
    """(name, simpleString-type) pairs — the writer side's
    _schema_shape contract EXACTLY, with nullability ignored at every
    nesting level (a json-level type compare embeds nested
    nullability, which parquet read-back widens: it spuriously failed
    streams over logs the writer itself accepts — review r13).
    pyspark.sql.types is pure Python, importable on planning paths
    with no JVM."""
    from pyspark.sql.types import StructType

    st = StructType.fromJson(json.loads(schema_json))
    return [(f.name, f.dataType.simpleString()) for f in st.fields]


#: X163 — simpleString widenings, byte-parity with
#: tablelog._WIDENINGS (kept local: planning workers must stay
#: pyspark-free; test_type_widening pins the equality)
_TYPE_WIDENINGS = {
    "tinyint": ("smallint", "int", "bigint", "double"),
    "smallint": ("int", "bigint", "double"),
    "int": ("bigint", "double"),
    "float": ("double",),
}


def _shape_deliverable(delivered: list[tuple], pinned: list[tuple]) -> bool:
    """Whether a version with shape ``delivered`` can be expressed in
    a stream pinned to shape ``pinned``: identical, an ADDITIVE-
    EVOLUTION SUBSET — every delivered column exists in the pinned
    shape at the same type (X152; the executor readers NULL-fill the
    missing evolved columns) — or NARROWER along a lossless widening
    (X163; the executor readers cast the arrow batches up). A version
    carrying columns the pinned shape lacks, or an incompatibly
    retyped column, is NOT deliverable — the stream must be restarted
    at the change (the output schema cannot grow mid-stream)."""
    p = dict(pinned)
    return all(
        p.get(n) == t or p.get(n) in _TYPE_WIDENINGS.get(t, ())
        for n, t in delivered
    )


def _dv_position_map(
    dv_files: list[str], normalize: bool
) -> dict[str, list[int]]:
    """file -> sorted deleted row positions (one parse loop for both
    key forms — review r13). Resolved ONCE at planning time on the
    driver — vectors are small by construction (positions, not
    rows)."""
    import pyarrow.parquet as pq

    out: dict[str, set[int]] = {}
    for f in dv_files:
        # resolve through the same pyarrow FileSystem layer the log
        # reads use — a bare local-path read broke every non-file:
        # scheme the module claims to support (ADVICE r12)
        fsys, p = _pa_fs(f)
        t = pq.read_table(
            p, filesystem=fsys, columns=["file_path", "row_index"]
        )
        for fp, ri in zip(
            t.column("file_path").to_pylist(),
            t.column("row_index").to_pylist(),
        ):
            out.setdefault(_norm(fp) if normalize else fp, set()).add(
                int(ri)
            )
    return {k: sorted(v) for k, v in out.items()}


def _dv_positions(dv_files: list[str]) -> dict[str, list[int]]:
    """path-normalized keys — for masking delivered files."""
    return _dv_position_map(dv_files, normalize=True)


class _FilePartition(InputPartition):
    def __init__(self, path: str, deleted: list[int]):
        self.path = path
        self.deleted = deleted


class _CdfPartition(InputPartition):
    """One change-feed read unit (X140): a parquet file plus either
    ``positions=None`` (every row — an insert delivery) or the sorted
    row positions to SELECT (a delete delivery reads exactly the rows
    the version's new vectors named), stamped with the change type and
    commit version."""

    def __init__(
        self,
        path: str,
        positions: list[int] | None,
        change_type: str,
        version: int,
        exclude: list[int] | None = None,
    ):
        self.path = path
        self.positions = positions
        self.change_type = change_type
        self.version = version
        # positions to MASK OUT of an all-rows delivery (a cloned
        # v0's snapshot must not resurrect DV-deleted rows)
        self.exclude = exclude


def _arrow_types(schema_json: str) -> dict:
    """name -> arrow type for the declared read schema — what the
    executor readers NULL-fill a column missing from a PRE-EVOLUTION
    file with (X152). Pure-Python pyspark type mapping, no JVM;
    memoized per schema json — a thousand-file batch must not re-parse
    the schema per partition (review r15)."""
    return dict(_arrow_types_cached(schema_json))


import functools


@functools.lru_cache(maxsize=64)
def _arrow_types_cached(schema_json: str):
    import json as _json

    from pyspark.sql.pandas.types import to_arrow_type
    from pyspark.sql.types import StructType

    st = StructType.fromJson(_json.loads(schema_json))
    return tuple((f.name, to_arrow_type(f.dataType)) for f in st.fields)


#: X163 — the lossless arrow up-casts mirroring
#: tablelog._WIDENINGS (pyarrow type str() spellings: float32 prints
#: 'float', float64 prints 'double')
_ARROW_WIDENINGS = {
    "int8": ("int16", "int32", "int64", "double"),
    "int16": ("int32", "int64", "double"),
    "int32": ("int64", "double"),
    "float": ("double",),
}


def _column_or_nulls(batch, name: str, types: dict, src: str | None = None):
    """The batch's column under its PHYSICAL name (``src``, X157 —
    defaults to the logical ``name`` for unmapped tables), or an
    all-null column of the declared type when the file predates an
    additive evolution. A file storing a type NARROWER than the
    declared one casts UP (X163 type widening — lossless by the
    widening matrix); any other mismatch raises loudly — a pinned
    stream whose table widened after the pin must restart at the
    widening version, never silently down-cast."""
    import pyarrow as pa

    src = name if src is None else src
    if src in batch.schema.names:
        col = batch.column(src)
        want = types[name]
        if col.type != want:
            ct, wt = str(col.type), str(want)
            if wt in _ARROW_WIDENINGS.get(ct, ()):
                return col.cast(want)  # X163: narrow file, wide schema
            if ct in _ARROW_WIDENINGS.get(wt, ()):
                # the FILE is wider than the pinned schema — a silent
                # down-cast would truncate; only a stream pinned
                # before a type widening can get here
                raise ValueError(
                    f"column {name!r}: file stores {col.type} but the "
                    f"pinned schema expects {want} — the table's type "
                    "widened after this stream pinned its schema; "
                    "restart the stream at the widening version"
                )
            # any other difference (nested nullability flags, etc.):
            # hand the column through unchanged — the arrow→JVM
            # conversion has been the authority on these long before
            # X163 and widening never changes nesting
        return col
    return pa.nulls(batch.num_rows, type=types[name])


def _read_file(
    partition: _FilePartition,
    field_names: list[str],
    schema_json: str,
    colmap: dict | None = None,
):
    """Executor-side: one parquet file -> Arrow record batches in the
    table's column order, with deletion-vector positions masked out
    by their global row index. The (sorted) positions are bisected
    against each batch's row range, so batches the vector does not
    touch pass through untouched and hit batches build their keep
    mask in numpy — no per-row Python loop (self-review r12). Columns
    the file predates (additive evolution, X152) are NULL-filled at
    the declared type."""
    from bisect import bisect_left, bisect_right

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if partition is None:
        # pyspark substitutes [None] for an empty partitions() list
        # and still calls read (self-review r12 — the empty-version
        # read crashed here)
        return
    types = _arrow_types(schema_json)
    cm = colmap or {}

    # open through the pyarrow FileSystem layer (the log-resolution
    # path already does) so s3:// / hdfs:// tables read on executors
    # too — a bare local-path ParquetFile broke every non-file:
    # scheme the module claims to support (ADVICE r12)
    fsys, p = _pa_fs(partition.path)
    with fsys.open_input_file(p) as fh:
        pf = pq.ParquetFile(fh)
        deleted = partition.deleted  # sorted
        offset = 0
        for batch in pf.iter_batches():
            n = batch.num_rows
            if deleted:
                lo = bisect_left(deleted, offset)
                hi = bisect_right(deleted, offset + n - 1)
                if hi > lo:
                    mask = np.ones(n, dtype=bool)
                    mask[np.asarray(deleted[lo:hi]) - offset] = False
                    batch = batch.take(
                        pa.array(np.flatnonzero(mask), type=pa.int64())
                    )
            offset += n
            yield pa.RecordBatch.from_arrays(
                [
                    _column_or_nulls(batch, name, types, cm.get(name))
                    for name in field_names
                ],
                names=field_names,
            )


def _read_file_cdf(
    partition: _CdfPartition,
    field_names: list[str],
    schema_json: str,
    colmap: dict | None = None,
):
    """Executor-side change-feed read: the file's rows (or exactly the
    named positions), with ``_change_type`` / ``_commit_version``
    constants appended per batch. Pre-evolution files NULL-fill the
    evolved columns (X152), like :func:`_read_file`."""
    from bisect import bisect_left, bisect_right

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if partition is None:
        return
    types = _arrow_types(schema_json)
    cm = colmap or {}
    fsys, p = _pa_fs(partition.path)
    with fsys.open_input_file(p) as fh:
        pf = pq.ParquetFile(fh)
        positions = partition.positions  # sorted, or None = all rows
        exclude = partition.exclude  # sorted mask-outs, or None
        offset = 0
        for batch in pf.iter_batches():
            n = batch.num_rows
            if positions is not None:
                lo = bisect_left(positions, offset)
                hi = bisect_right(positions, offset + n - 1)
                if hi <= lo:
                    offset += n
                    continue
                idx = np.asarray(positions[lo:hi]) - offset
                batch = batch.take(pa.array(idx, type=pa.int64()))
            elif exclude:
                lo = bisect_left(exclude, offset)
                hi = bisect_right(exclude, offset + n - 1)
                if hi > lo:
                    mask = np.ones(n, dtype=bool)
                    mask[np.asarray(exclude[lo:hi]) - offset] = False
                    batch = batch.take(
                        pa.array(np.flatnonzero(mask), type=pa.int64())
                    )
            offset += n
            k = batch.num_rows
            yield pa.RecordBatch.from_arrays(
                [
                    _column_or_nulls(batch, name, types, cm.get(name))
                    for name in field_names
                ]
                + [
                    pa.array([partition.change_type] * k, type=pa.string()),
                    pa.array([partition.version] * k, type=pa.int64()),
                ],
                names=field_names + ["_change_type", "_commit_version"],
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
        self._schema_json = doc["schema"]
        self._names = [
            f["name"] for f in json.loads(doc["schema"])["fields"]
        ]
        # X157 column mapping: files store PHYSICAL names; this doc's
        # sparse map restores the logical ones at read time
        self._colmap = doc.get("colmap") or {}

    def partitions(self):
        return [
            _FilePartition(f, self._dv.get(_norm(f), []))
            for f in self._files
        ]

    def read(self, partition):
        yield from _read_file(
            partition, self._names, self._schema_json, self._colmap
        )


class _TablelogStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        table: str,
        ignore_deletes: bool,
        ignore_changes: bool,
        starting_version,
    ):
        self._table = table
        self._ignore_deletes = ignore_deletes or ignore_changes
        self._ignore_changes = ignore_changes
        cur = _current_version(table)
        if cur is None:
            raise ValueError(f"no such versioned table: {table}")
        if starting_version is None:
            self._start = 0
        elif str(starting_version).lower() == "latest":
            # deliver only versions committed AFTER the stream starts
            self._start = cur + 1
        else:
            self._start = int(starting_version)
            if self._start < 0:
                raise ValueError(
                    f"starting_version must be >= 0 or 'latest', got "
                    f"{starting_version}"
                )
        pin_doc = _doc(table, cur)
        schema_json = pin_doc["schema"]
        self._schema_json = schema_json
        # X157: the pinned version's column mapping — physical names
        # never change, so it reads every deliverable version's files
        # (versions whose LOGICAL shape differs, e.g. pre-rename ones,
        # are refused by the shape gate below, Delta-parity)
        self._colmap = pin_doc.get("colmap") or {}
        #: the version whose schema this stream pinned: versions AT OR
        #: BELOW it may deliver additive-SUBSET shapes (pre-evolution
        #: files legitimately lack the added columns — NULL-fill);
        #: versions AFTER it must match the pinned shape EXACTLY — a
        #: later column-dropping overwrite delivering fabricated NULLs
        #: would misreport a schema change as data (review r15)
        self._pin_version = cur
        self._names = [
            f["name"] for f in json.loads(schema_json)["fields"]
        ]
        # the output schema is pinned at stream start; a delivered
        # version whose files carry a DIFFERENT shape (possible with
        # ignore_changes across a schema-changing overwrite, or a
        # starting_version before one) must fail fast with a clear
        # error, not a raw pyarrow KeyError in read() (ADVICE r12)
        self._shape = _shape(schema_json)

    def initialOffset(self):
        # first delivered version = starting_version — the escape
        # hatch for vacuumed tables whose early data files are gone
        # (self-review r12; Delta's startingVersion)
        return {"version": self._start - 1}

    def latestOffset(self):
        cur = _current_version(self._table)
        return {"version": -1 if cur is None else cur}

    def _version_rows(self, lo: int, hi: int) -> list[dict]:
        """One dict per version in [lo, hi] — version, mode, shape,
        new_files (what an append delivery ships), dv_new (the NEW
        vector files of a delete version — the change feed's delete
        delivery), dv0 (version 0's attached vectors: a shallow CLONE
        is the one writer whose v0 files carry vectors naming
        themselves, review r13) — from the latest checkpoint's compact
        history rows (X139) where they cover the range head,
        per-version docs for the tail. A fresh stream's first batch is
        O(versions since checkpoint), not O(versions); a torn /
        absent / gap-y checkpoint silently degrades to the full doc
        walk."""
        rows: list[dict] = []
        doc_lo = lo
        prev_files: set[str] | None = None
        prev_dv: set[str] = set()
        # consult checkpoints only when the range is long (a fresh
        # stream's first batch) — the steady-state one-version batch
        # must not pay an extra LIST per micro-batch (review r13)
        ck = _latest_checkpoint(self._table, hi) if hi - lo >= 2 else None
        if ck is not None and ck >= lo:
            try:
                ckdoc = _checkpoint_doc(self._table, ck)
                hist = {r["version"]: r for r in ckdoc["history"]}
                shapes = ckdoc.get("shapes") or []
                head = []
                for v in range(lo, ck + 1):
                    # KeyError -> doc walk (also covers a
                    # CHECKPOINT_HISTORY-bounded doc whose retained
                    # window starts above lo)
                    r = hist[v]
                    # deduped shape_id (r14) or inline shape (pre-r14
                    # docs); these fields were produced at checkpoint-
                    # write time by the SAME version_delta the doc
                    # walk below calls (sources/log_delta.py) — this
                    # decode only copies, it derives nothing
                    raw_shape = (
                        r["shape"] if "shape" in r else shapes[r["shape_id"]]
                    )
                    head.append(
                        {
                            "version": v,
                            "mode": r["mode"],
                            "shape": [tuple(x) for x in raw_shape],
                            "new_files": list(r["new_files"]),
                            "dv_new": list(r.get("dv_new") or []),
                            "dv0": list(r.get("dv") or []),
                        }
                    )
                rows = head
                prev_files = set(ckdoc["files"])
                prev_dv = set(ckdoc.get("dv") or [])
                doc_lo = ck + 1
            except Exception:  # noqa: BLE001 — advisory accelerator
                rows, prev_files, prev_dv, doc_lo = [], None, set(), lo
        for v in range(doc_lo, hi + 1):
            doc = _doc(self._table, v)
            if prev_files is None:
                if v > 0:
                    pdoc = _doc(self._table, v - 1)
                    prev_files = set(pdoc["files"])
                    prev_dv = set(pdoc.get("dv") or [])
                else:
                    prev_files = set()
            dv = doc.get("dv") or []
            # the ONE mode-to-delta derivation, shared with
            # tablelog.write_checkpoint (sources/log_delta.py, ADVICE
            # r13) — overwrite = whole file list (restore-over-shared-
            # files), delete = new vectors only, append = prev-diff,
            # dv0 = the snapshot-masking vectors of a cloned/restored
            # version
            new, dv_new, dv0 = version_delta(
                v, doc["mode"], doc["files"], dv, prev_files, prev_dv
            )
            rows.append(
                {
                    "version": v,
                    "mode": doc["mode"],
                    "shape": _shape(doc["schema"]),
                    "new_files": new,
                    "dv_new": dv_new,
                    "dv0": dv0,
                }
            )
            prev_files = set(doc["files"])
            prev_dv = set(dv)
        return rows

    def partitions(self, start, end):
        parts: list[_FilePartition] = []
        rows = self._version_rows(
            start["version"] + 1, end["version"]
        )
        for row in rows:
            v, mode, shape = row["version"], row["mode"], row["shape"]
            # v0 of a shallow CLONE carries vectors naming its own
            # files (the one writer that does — review r13): mask the
            # snapshot delivery or deleted rows resurrect in the
            # stream while batch reads exclude them
            if row["dv0"]:
                pos = _dv_positions(row["dv0"])
                new_files = [
                    (f, pos.get(_norm(f), [])) for f in row["new_files"]
                ]
            else:
                new_files = [(f, []) for f in row["new_files"]]
            if not (
                _shape_deliverable(shape, self._shape)
                if v <= self._pin_version
                else shape == self._shape
            ):
                raise ValueError(
                    f"schema changed at version {v} of {self._table} — "
                    "the stream's output schema pins to the CURRENT "
                    "version at start (pre-evolution versions NULL-"
                    "fill additively-added columns; anything else is "
                    "inexpressible). Start a NEW stream (a fresh "
                    "checkpointLocation — the existing checkpoint's "
                    "offsets resume before the change and would hit "
                    "this again) with .option('starting_version', N) "
                    "at or after the schema change, i.e. the first "
                    "version whose schema fits the current one "
                    "(ADVICE r12)"
                )
            # appended/rewritten files carry no vectors at their own
            # version — deletes arrive as LATER versions
            if mode == "append" or v == 0:
                # version 0 is the table's INITIAL snapshot whatever
                # its mode — nothing was delivered before it, so its
                # files are all-new (self-review r12, confirmed live:
                # an overwrite-created v0 either failed the stream or
                # was silently dropped under ignore_changes)
                parts += [_FilePartition(f, d) for f, d in new_files]
            elif mode == "delete":
                if not self._ignore_deletes:
                    raise ValueError(
                        f"version {v} of {self._table} is a deletion — "
                        "already-delivered rows cannot be retracted "
                        "from an append stream; read the change feed "
                        "(table_changes) for retractions, or set "
                        ".option('ignore_deletes', 'true')"
                    )
            elif mode == "merge":
                # X144: a merge retracts matched rows (the vector) AND
                # appends postimages/inserts. The retraction cannot be
                # expressed in an append stream; under ignore_deletes
                # the NEW files are delivered (at-least-once: an
                # updated row's already-delivered preimage is followed
                # by its postimage — the Delta ignoreChanges contract;
                # the change feed delivers the exact delete+insert
                # pair instead)
                if not self._ignore_deletes:
                    raise ValueError(
                        f"version {v} of {self._table} is a merge — "
                        "its retractions cannot be expressed in an "
                        "append stream; read the change feed "
                        "(read_changes) for the delete+insert pairs, "
                        "or set .option('ignore_deletes', 'true') to "
                        "deliver only the appended rows (at-least-"
                        "once for updated rows)"
                    )
                parts += [_FilePartition(f, d) for f, d in new_files]
            else:
                if not self._ignore_changes:
                    raise ValueError(
                        f"version {v} of {self._table} is an overwrite "
                        "— consume table_changes for row-level "
                        "updates, or set .option('ignore_changes', "
                        "'true') to RE-DELIVER its files (at-least-"
                        "once: downstream sees duplicates of "
                        "unchanged rows, the Delta ignoreChanges "
                        "contract)"
                    )
                # Delta's ignoreChanges semantics: the rewrite's files
                # are DELIVERED (duplicates downstream), never
                # silently skipped — skipping would lose the rows an
                # upsert-overwrite newly inserted (self-review r12)
                parts += [_FilePartition(f, d) for f, d in new_files]
        return parts

    def read(self, partition):
        yield from _read_file(
            partition, self._names, self._schema_json, self._colmap
        )

    def commit(self, end):
        pass  # offsets are durable in the query checkpoint


def _dv_positions_raw(dv_files: list[str]) -> dict[str, list[int]]:
    """RAW file_path keys — they keep their scheme so the change-feed
    reader can re-open them."""
    return _dv_position_map(dv_files, normalize=False)


class _TablelogCdfStreamReader(_TablelogStreamReader):
    """X140 — the change feed AS a stream (Delta's readChangeFeed):
    ``.option("read_changes", "true")`` delivers row-level changes
    with ``_change_type`` ('insert' / 'delete') and
    ``_commit_version`` columns, offsets = table versions.

      append version  : its new files as 'insert' rows
      delete version  : exactly the rows the version's NEW deletion
                        vectors named, re-read from the original
                        files by position, as 'delete' rows — the
                        retraction feed an incremental aggregate
                        (sources/mv.py) consumes
      version 0       : the initial snapshot as 'insert' whatever its
                        mode (the Delta CDF starting-version rule)
      overwrite       : the previous version's LIVE VIEW as 'delete'
                        rows plus the new file list as 'insert' rows
                        (X146 — Delta's derivation for remove-all/
                        add-all versions, no CDC files needed); a
                        schema-changing overwrite still refuses (its
                        delete side has no expression in the pinned
                        schema), and an overwrite AT the explicit
                        starting_version is the initial snapshot.

    Parity vs Delta CDF: MERGE streams exact row-level pre/postimages
    (X144), blind overwrites stream as retract-all + insert-all
    (X146) — the full Delta change-type surface.
    ``.option("update_labels", "true")`` (r15) delivers update-merge
    rows with Delta's 'update_preimage'/'update_postimage' labels;
    the default keeps the 'delete'/'insert' retract/assert pair form
    the mv consumer folds. Exactly-once per version via the query
    checkpoint, exactly like the append reader."""

    def __init__(self, table: str, starting_version, update_labels=False):
        super().__init__(table, False, False, starting_version)
        #: r15 — ``.option("update_labels", "true")``: merge versions
        #: whose doc recorded postimage files deliver Delta's
        #: update_preimage/update_postimage change types instead of
        #: delete/insert pairs (default off — the mv consumer folds
        #: the retract/assert pair form)
        self._update_labels = bool(update_labels)
        # the output schema gains two columns; a colliding data column
        # must be refused HERE too — DataSource.schema() is skipped
        # when the user supplies an explicit schema (review r13)
        clash = {"_change_type", "_commit_version"} & set(self._names)
        if clash:
            raise ValueError(
                f"table columns {sorted(clash)} collide with the "
                "change-feed output columns — rename them first"
            )
        # overwrite-as-initial-snapshot is only stable for an EXPLICIT
        # numeric starting_version: self._start from 'latest' is
        # re-resolved per reader construction (review r13)
        self._snapshot_at = (
            int(starting_version)
            if starting_version is not None
            and str(starting_version).lower() != "latest"
            else None
        )

    def partitions(self, start, end):
        parts: list[_CdfPartition] = []
        rows = self._version_rows(
            start["version"] + 1, end["version"]
        )  # checkpoint-accelerated, like the append reader (review r13)
        for row in rows:
            v, mode = row["version"], row["mode"]
            if not (
                _shape_deliverable(row["shape"], self._shape)
                if v <= self._pin_version
                else row["shape"] == self._shape
            ):
                raise ValueError(
                    f"schema changed at version {v} of {self._table} — "
                    "the change-feed stream's output schema pins to "
                    "the CURRENT version at start (pre-evolution "
                    "versions NULL-fill additively-added columns); "
                    "start a NEW stream (fresh checkpointLocation) "
                    "with .option('starting_version', N) at or after "
                    "the schema change"
                )
            # an overwrite AT an EXPLICIT starting_version is the
            # stream's initial snapshot (the restart path the error
            # below points at); 'latest' deliberately does not qualify
            # — the reader is reconstructed on every restart and
            # 'latest' would re-resolve against the moved log, making
            # the same WAL'd range flip from accepted to rejected
            # (review r13). Overwrite files live in a fresh data dir,
            # so the new-files diff delivers every file.
            if (
                mode == "append"
                or v == 0
                or (mode == "overwrite" and v == self._snapshot_at)
            ):
                if row["dv0"]:
                    # a cloned v0 carries vectors naming its own files
                    # — the snapshot must not resurrect deleted rows
                    pos = _dv_positions(row["dv0"])
                    parts += [
                        _CdfPartition(
                            f, None, "insert", v,
                            exclude=pos.get(_norm(f), []),
                        )
                        for f in row["new_files"]
                    ]
                else:
                    parts += [
                        _CdfPartition(f, None, "insert", v)
                        for f in row["new_files"]
                    ]
            elif mode == "delete":
                parts += [
                    _CdfPartition(path, pos, "delete", v)
                    for path, pos in sorted(
                        _dv_positions_raw(row["dv_new"]).items()
                    )
                ]
            elif mode == "merge":
                # X144: the DV-backed MERGE streams as the exact
                # delete+insert pair in ONE version — the matched
                # preimages by position, then the appended postimage/
                # insert files (the keyed-upsert half of the feed;
                # X146 below covers the keyless-overwrite half).
                # update_labels (r15): an UPDATE-merge whose doc
                # recorded its postimage files upgrades to Delta's
                # update_preimage/update_postimage change types — ONE
                # extra metadata-doc read per merge version, only
                # when the option is on (pre-r15 docs keep the pair
                # form; the metadata is simply absent).
                del_type, post_set = "delete", set()
                if self._update_labels:
                    mm = _doc(self._table, v).get("merge") or {}
                    if (
                        mm.get("when_matched") == "update"
                        and "files_post" in mm
                    ):
                        del_type = "update_preimage"
                        post_set = set(mm["files_post"])
                parts += [
                    _CdfPartition(path, pos, del_type, v)
                    for path, pos in sorted(
                        _dv_positions_raw(row["dv_new"]).items()
                    )
                ]
                parts += [
                    _CdfPartition(
                        f,
                        None,
                        "update_postimage" if f in post_set else "insert",
                        v,
                    )
                    for f in row["new_files"]
                ]
            else:
                # X146: Delta's CDF derivation for a KEYLESS overwrite
                # — when a version only removes files and only adds
                # files, both change sides are derivable from the log
                # alone: the remove side IS the previous version's
                # live view (its files minus its vector-named
                # positions — rows already retracted by earlier delete
                # versions must not retract twice), delivered as
                # 'delete' rows; the add side is the whole new file
                # list (version_delta's overwrite rule) as 'insert'
                # rows, masking the version's own carried vectors (a
                # restore-published overwrite must not resurrect
                # rows deleted at the restore target). The previous
                # doc is ONE metadata read per overwrite version —
                # not a derivation site, so the log_delta unification
                # holds (the retraction is the prev doc verbatim,
                # never a diff). Keyed upserts still route better
                # through merge_rows (exact per-row preimages); this
                # path is the blind INSERT OVERWRITE case.
                pdoc = _doc(self._table, v - 1)
                if not (
                    _shape_deliverable(
                        _shape(pdoc["schema"]), self._shape
                    )
                    if v - 1 <= self._pin_version
                    else _shape(pdoc["schema"]) == self._shape
                ):
                    raise ValueError(
                        f"version {v} of {self._table} is a "
                        "schema-changing overwrite — its delete side "
                        "is not expressible in the stream's pinned "
                        "schema; start a NEW stream (fresh "
                        "checkpointLocation) with "
                        f".option('starting_version', {v}) at the "
                        "schema change"
                    )
                prev_pos = _dv_positions(pdoc.get("dv") or [])
                parts += [
                    _CdfPartition(
                        f, None, "delete", v,
                        exclude=prev_pos.get(_norm(f), []),
                    )
                    for f in sorted(pdoc["files"])
                ]
                ins_pos = (
                    _dv_positions(row["dv0"]) if row["dv0"] else {}
                )
                parts += [
                    _CdfPartition(
                        f, None, "insert", v,
                        exclude=ins_pos.get(_norm(f), []),
                    )
                    for f in row["new_files"]
                ]
        return parts

    def read(self, partition):
        yield from _read_file_cdf(
            partition, self._names, self._schema_json, self._colmap
        )


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

    def _flag(self, name: str) -> bool:
        return str(self.options.get(name, "false")).lower() == "true"

    def _resolve_version(self, cur: int) -> int:
        """version / timestamp option -> the version to read (X145:
        .option('timestamp', <epoch|ISO>) is Delta's TIMESTAMP AS OF;
        mutually exclusive with version)."""
        v = self.options.get("version")
        ts = self.options.get("timestamp")
        if v is not None and ts is not None:
            raise ValueError(
                "pass .option('version', N) OR .option('timestamp', "
                "TS), not both"
            )
        if ts is not None:
            return _version_at(self._table(), ts)
        return cur if v is None else int(v)

    def schema(self):
        cur = _current_version(self._table())
        if cur is None:
            raise ValueError(f"no such versioned table: {self._table()}")
        v = self._resolve_version(cur)
        if not 0 <= v <= cur:
            raise ValueError(
                f"version {v} not in [0, {cur}] for {self._table()}"
            )
        # the REQUESTED version's schema — planning with the current
        # one would misbind time travel across a schema-changing
        # overwrite (self-review r12, confirmed live) — nullability
        # widened like any parquet read (review r14: a stale
        # non-nullable field + a later NULL = Arrow NPE mid-read)
        st = _widened(_doc(self._table(), v)["schema"])
        if self._flag("read_changes"):
            from pyspark.sql.types import LongType, StringType

            clash = {"_change_type", "_commit_version"} & set(
                st.fieldNames()
            )
            if clash:
                raise ValueError(
                    f"table columns {sorted(clash)} collide with the "
                    "change-feed output columns — rename them first"
                )
            st = st.add("_change_type", StringType()).add(
                "_commit_version", LongType()
            )
        return st

    def reader(self, schema):
        if self._flag("read_changes"):
            raise ValueError(
                "read_changes is a STREAMING option "
                "(spark.readStream.format('tablelog')); for batch CDC "
                "use tablelog.table_changes(keys=...)"
            )
        cur = _current_version(self._table())
        if cur is None:
            raise ValueError(f"no such versioned table: {self._table()}")
        if (
            self.options.get("version") is None
            and self.options.get("timestamp") is None
        ):
            v = None
        else:
            v = self._resolve_version(cur)
        return _TablelogBatchReader(self._table(), v)

    def _starting_version(self):
        """starting_version, or starting_timestamp resolved through
        X145's version_at (Delta's startingTimestamp): the FIRST
        version committed at-or-after the instant — a stream from
        'yesterday 09:00' replays exactly the commits since then.
        Resolution happens ONCE here at reader construction; the WAL
        then pins offsets, so a restart cannot re-resolve against a
        moved log (the 'latest' re-resolution hazard, review r13)."""
        sv = self.options.get("starting_version")
        ts = self.options.get("starting_timestamp")
        if sv is not None and ts is not None:
            raise ValueError(
                "pass .option('starting_version', N) OR "
                ".option('starting_timestamp', TS), not both"
            )
        if ts is None:
            return sv
        # version_at gives the version CURRENT at ts (greatest
        # committed_at <= ts); Delta's startingTimestamp delivers
        # commits AT-OR-AFTER the instant, so start one later —
        # EXCEPT a commit stamped exactly at ts, which at-or-after
        # includes (checked explicitly; float-second stamps make the
        # tie measure-zero but the boundary must not be off-by-one).
        # A ts before the first commit means "from the beginning"
        # (version_at raises there; a FUTURE ts resolves to latest,
        # so the stream starts with only new commits — Delta's rule).
        try:
            v = _version_at(self._table(), ts)
        except ValueError:
            return 0
        try:
            exact = float(ts)
        except ValueError:
            from datetime import datetime

            exact = datetime.fromisoformat(str(ts)).timestamp()
        if _doc(self._table(), v)["committed_at"] == exact:
            return v
        return v + 1

    def streamReader(self, schema):
        if self._flag("read_changes"):
            return _TablelogCdfStreamReader(
                self._table(),
                self._starting_version(),
                update_labels=self._flag("update_labels"),
            )
        return _TablelogStreamReader(
            self._table(),
            self._flag("ignore_deletes"),
            self._flag("ignore_changes"),
            self._starting_version(),
        )
