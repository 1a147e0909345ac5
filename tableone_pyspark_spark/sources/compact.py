"""Small-file compaction — the lakehouse maintenance operation (Delta
``OPTIMIZE`` / Iceberg ``rewrite_data_files``-style bin-packing) a
100 TB table needs after streaming or fine-grained-partition writes:
thousands of KB-sized parquet files make every scan pay per-file
open/footer costs and starve the scheduler with tiny splits.

    plan    : list the leaf data files, split at
              ``small_threshold × target_bytes`` — files already big
              enough are left UNTOUCHED (copied byte-for-byte, no
              recompute/recompress) — and first-fit-decreasing
              bin-pack the small ones into rewrite groups ≤ target
    execute : one tiny coalesce(1) job per group appends one output
              file per bin; untouched files are copied via the Hadoop
              FileSystem API (works local/HDFS/S3A alike)

Driver-side work is metadata-sized (file names + lengths); the data
itself moves executor-side per group. Plain flat layouts only:
hive-partitioned inputs (``key=value`` directories) raise — compact
each leaf partition directory individually, which is also what keeps
each bin's rows inside one partition.

No counterpart in the reference repo; extends the storage-layout
family (write_table's maxRecordsPerFile, write_bucketed co-location,
write_zordered clustering) with the repair half.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class CompactionPlan:
    """``bins``: rewrite groups (list of file-path lists, each group's
    byte total ≤ target); ``untouched``: files kept as-is;
    ``small_bytes``/``total_bytes``: accounting for the report."""

    bins: list[list[str]]
    untouched: list[str]
    small_bytes: int
    total_bytes: int


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf), p, jvm, conf


def _default_fs_is_local(spark: SparkSession) -> bool:
    # memoized per session: scheme-less paths resolve against
    # fs.defaultFS, so only a file: default makes them driver-local
    cached = getattr(spark, "_t1_default_fs_local", None)
    if cached is None:
        conf = spark._jsc.hadoopConfiguration()
        d = conf.get("fs.defaultFS") or "file:///"
        cached = d.startswith("file:")
        spark._t1_default_fs_local = cached
    return cached


def as_local(spark: SparkSession, path: str) -> str | None:
    """The driver-visible local-filesystem path for ``path`` when it
    PROVABLY lives there (explicit ``file:`` scheme, or scheme-less
    with a ``file:`` default FS), else None — callers then fall back
    to the Hadoop FS API unchanged. Every metadata read through py4j
    costs tens of ms in JVM round-trips (guide §5: the driver should
    do no avoidable work), and a commit-log walk makes dozens; direct
    ``os`` calls are ~100× cheaper. HDFS/object-store paths always
    return None — the optimization never changes WHERE bytes come
    from, only which client reads them."""
    if path.startswith("file:"):
        from urllib.parse import unquote, urlparse

        return unquote(urlparse(path).path) or None
    head = path.split("/", 1)[0]
    if "://" in path or ":" in head:
        return None
    return path if _default_fs_is_local(spark) else None


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every visible leaf data file under ``path``
    (recursive; `_`/`.`-prefixed bookkeeping files skipped). A
    ``key=value`` directory raises — hive layouts compact per leaf.
    Provably-local paths walk via ``os.scandir`` (the Hadoop
    LocalFileSystem round-trips py4j per directory); remote schemes
    keep the FS API. Both walks return Hadoop-style ``file:`` URIs for
    local files so downstream path handling is identical."""
    lp = as_local(spark, path)
    if lp is not None:
        import os

        if not os.path.exists(lp):
            raise ValueError(f"no such path: {path}")
        out: list[tuple[str, int]] = []
        stack = [lp]
        while stack:
            cur = stack.pop()
            with os.scandir(cur) as it:
                for de in it:
                    name = de.name
                    if name.startswith("_") or name.startswith("."):
                        continue
                    if de.is_dir(follow_symlinks=True):
                        if "=" in name:
                            raise ValueError(
                                f"hive-partitioned layout ({name}/): "
                                "compact each leaf partition directory "
                                "individually"
                            )
                        stack.append(de.path)
                    else:
                        out.append(
                            (
                                "file:" + os.path.abspath(de.path),
                                de.stat(follow_symlinks=True).st_size,
                            )
                        )
        return sorted(out)
    fs, root, jvm, _ = _fs_and_path(spark, path)
    if not fs.exists(root):
        raise ValueError(f"no such path: {path}")
    out = []
    stack = [root]
    while stack:
        cur = stack.pop()
        for st in fs.listStatus(cur):
            name = st.getPath().getName()
            if name.startswith("_") or name.startswith("."):
                continue
            if st.isDirectory():
                if "=" in name:
                    raise ValueError(
                        f"hive-partitioned layout ({name}/): compact each "
                        "leaf partition directory individually"
                    )
                stack.append(st.getPath())
            else:
                out.append((st.getPath().toString(), int(st.getLen())))
    return sorted(out)


def plan_compaction(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    small_threshold: float = 0.5,
) -> CompactionPlan:
    """First-fit-decreasing bin packing of the files smaller than
    ``small_threshold × target_bytes``; larger files stay untouched.
    A single leftover small file still gets its own bin only when
    there are ≥ 2 small files overall (one small file alone cannot be
    compacted further — it goes out untouched)."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    if not 0.0 < small_threshold <= 1.0:
        raise ValueError(
            f"small_threshold must be in (0, 1], got {small_threshold}"
        )
    files = list_data_files(spark, path)
    cut = small_threshold * target_bytes
    small = [(p, b) for p, b in files if b < cut]
    untouched = [p for p, b in files if b >= cut]
    if len(small) < 2:
        return CompactionPlan(
            bins=[],
            untouched=[p for p, _ in files],
            small_bytes=sum(b for _, b in small),
            total_bytes=sum(b for _, b in files),
        )
    # first-fit-decreasing: sort by size desc, drop each file into the
    # first bin it fits; metadata-sized work (file counts, not data)
    small.sort(key=lambda t: (-t[1], t[0]))
    bins: list[tuple[list[str], int]] = []
    for p, b in small:
        for i, (members, used) in enumerate(bins):
            if used + b <= target_bytes:
                members.append(p)
                bins[i] = (members, used + b)
                break
        else:
            bins.append(([p], b))
    # a singleton bin would re-encode one file for zero file-count
    # gain (and destroy its stats) — demote it to untouched
    # (self-review r10)
    packed = [members for members, _ in bins if len(members) > 1]
    untouched += [m for members, _ in bins if len(members) == 1 for m in members]
    return CompactionPlan(
        bins=packed,
        untouched=sorted(untouched),
        small_bytes=sum(b for _, b in small),
        total_bytes=sum(b for _, b in files),
    )


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    small_threshold: float = 0.5,
) -> dict:
    """Execute a compaction of the flat parquet dataset at
    ``src_path`` into ``dst_path``: each planned bin is read and
    written as ONE output file (a tiny per-bin job; rows re-encoded),
    untouched files are byte-for-byte FileSystem copies (no
    recompute, their encoding/stats survive). Returns the report dict
    ``{n_input_files, n_output_files, n_bins, bytes}``. ``dst_path``
    must not already exist (a half-written destination must never be
    silently appended into).

    Atomicity: everything is written into a ``<dst>._compact_tmp``
    sibling and RENAMED onto ``dst_path`` only after the last copy
    succeeds, so a mid-run failure leaves no partial destination a
    retry could mistake for complete output, and the retry itself
    clears any leftover temp (ADVICE r10). The rename is atomic on
    local/HDFS; object stores (S3A) fake it with a copy — there,
    treat the presence of ``dst_path`` itself as the commit marker."""
    plan = plan_compaction(spark, src_path, target_bytes, small_threshold)
    fs, dst, jvm, conf = _fs_and_path(spark, dst_path)
    if fs.exists(dst):
        raise ValueError(f"destination already exists: {dst_path}")
    basenames = [p.rsplit("/", 1)[-1] for p in plan.untouched]
    if len(set(basenames)) != len(basenames):
        raise ValueError(
            "untouched files from different subdirectories share a "
            "basename — flatten the layout first"
        )
    Path = jvm.org.apache.hadoop.fs.Path
    tmp_path = dst_path.rstrip("/") + "._compact_tmp"
    tmp = Path(tmp_path)
    marker = Path(tmp_path, "._compact_owner")
    if fs.exists(tmp):
        # only clear a temp THIS function left behind (the marker is
        # written first thing below) — never a directory someone else
        # parked at the reserved name (self-review r11). A live
        # concurrent run's temp also carries the marker; compaction of
        # one dataset is single-writer by contract, same as the
        # dst-exists guard.
        if not fs.exists(marker):
            raise ValueError(
                f"{tmp_path} exists but is not a compact_parquet "
                "staging directory — refusing to delete it"
            )
        fs.delete(tmp, True)
    fs.mkdirs(tmp)
    fs.create(marker, True).close()
    for members in plan.bins:
        (
            spark.read.parquet(*members)
            .coalesce(1)
            .write.mode("append")
            .parquet(tmp_path)
        )
    FileUtil = jvm.org.apache.hadoop.fs.FileUtil
    for p in plan.untouched:
        sp = Path(p)
        # 7-arg overload: (deleteSource=False, overwrite=False) — the
        # 6-arg form defaults overwrite=TRUE, which would let any
        # basename collision with a just-written bin output silently
        # destroy it (self-review r10)
        FileUtil.copy(
            sp.getFileSystem(conf), sp, fs, Path(tmp_path, sp.getName()),
            False, False, conf,
        )
    if not fs.rename(tmp, dst):
        raise IOError(
            f"could not commit {tmp_path} -> {dst_path} (rename failed)"
        )
    # the marker must survive UNTIL the rename: deleting it first
    # would strand a marker-less temp on a crash-in-between, which the
    # retry then refuses to clear (cross-batch review r11). Post-commit
    # it is dot-prefixed bookkeeping readers skip; removing it is
    # best-effort cosmetics.
    fs.delete(Path(dst_path, "._compact_owner"), False)
    n_out = len(list_data_files(spark, dst_path))
    return {
        "n_input_files": len(plan.untouched)
        + sum(len(m) for m in plan.bins),
        "n_output_files": n_out,
        "n_bins": len(plan.bins),
        "bytes": plan.total_bytes,
    }


def estimate_encoded_row_bytes(
    df, sample_rows: int = 2048, compression: str = "snappy"
) -> float:
    """Parquet-encoded bytes per row, estimated from a driver-side
    sample encoded IN MEMORY with pyarrow (no filesystem temp, no
    extra Spark write job): collect ``limit(sample_rows)``, encode to
    a BytesIO parquet file, divide. The sample is artifact-sized; the
    estimate inherits the sample's value distribution (dictionary/RLE
    make encoded size data-dependent — this is an ESTIMATE, the ±2×
    file-size tolerance every target-sized writer lives with)."""
    import io as _io

    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = df.limit(sample_rows).toPandas()
    if len(pdf) == 0:
        raise ValueError("cannot estimate row size of an empty DataFrame")
    buf = _io.BytesIO()
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        buf,
        compression=compression,
    )
    return buf.tell() / len(pdf)


def write_target_sized(
    df,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sample_rows: int = 2048,
    mode: str = "overwrite",
    **options,
) -> dict:
    """The PREVENTIVE half of compaction: write ``df`` as parquet with
    ``maxRecordsPerFile`` derived from a sampled encoded-bytes-per-row
    estimate, so output files land near ``target_bytes`` WITHOUT a
    post-hoc rewrite (``compact_parquet`` remains the repair for data
    already fragmented). ``maxRecordsPerFile`` caps file size with no
    shuffle — a task producing less than the cap still writes one
    smaller file, so upstream partitioning should be coarse enough
    (repartition to ~total/target tasks first when the input is very
    wide). Returns {rows_per_file, est_row_bytes}."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    per_row = estimate_encoded_row_bytes(df, sample_rows)
    rows_per_file = max(1, int(target_bytes / per_row))
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", str(rows_per_file))
        .options(**options)
        .parquet(path)
    )
    return {"rows_per_file": rows_per_file, "est_row_bytes": per_row}
