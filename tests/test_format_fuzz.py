"""r17 model-based differential fuzz (the X131/colmap-fuzz cadence
applied to this round's kernels): seeded random sequences of
append / widen (X163) / narrow-append / DV-delete / merge (X144) /
incremental optimize (X161, clustered marker or X164 min_file_bytes)
/ restore (X143) against a driver-side dict model — after EVERY op,
``read_version`` must equal the model exactly, and a final
time-travel sweep must reproduce each version's snapshot at that
version's own declared types. The optimize ops are content no-ops
for the model, so any carry bug (a clustered file wrongly dropped, a
DV-touched file wrongly carried, stats/marker drift) surfaces as a
row diff immediately after.

Float columns use k.0/k.5 values only — exactly representable in
float32, so the float→double widening promotion is value-exact by
construction and the model never needs a tolerance.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tableone_pyspark_spark.sources import tablelog as tl


def _schema(cols: dict[str, str]) -> str:
    return ", ".join(f"{c} {t}" for c, t in cols.items())


NARROW = {"bigint": "int", "double": "float"}


@pytest.mark.parametrize("seed", [11, 42])
def test_format_differential_fuzz(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = str(tmp_path / f"fmt_fuzz_{seed}")
    clustered = seed % 2 == 0  # even: persisted CLUSTER BY policy
    # declared types; key stays long, a/b may widen
    types: dict[str, str] = {"k": "bigint", "a": "int", "b": "float"}
    next_key = [0]

    def mkrows(n, use: dict[str, str]):
        rows = []
        for _ in range(n):
            r = {"k": next_key[0]}
            next_key[0] += 1
            r["a"] = rng.randint(0, 10**9 if use["a"] == "bigint" else 99)
            r["b"] = float(rng.randint(0, 99)) + rng.choice([0.0, 0.5])
            rows.append(r)
        return rows

    def commit_rows(rows, use, **kw):
        df = spark.createDataFrame(
            [(r["k"], r["a"], r["b"]) for r in rows], _schema(use)
        )
        tl.commit(spark, df.repartition(2), t, **kw)

    model: dict[int, dict] = {}
    snapshots: list = []

    rows = mkrows(4, types)
    commit_rows(rows, types, stats_cols=["k"])
    for r in rows:
        model[r["k"]] = dict(r)
    if clustered:
        tl.set_property(spark, t, "cluster.by", "k")

    def check(op):
        got = {
            r["k"]: {"k": r["k"], "a": r["a"], "b": r["b"]}
            for r in tl.read_version(spark, t).collect()
        }
        assert got == model, (seed, op, got, model)
        snapshots.append(
            (
                tl.current_version(spark, t),
                {k: dict(m) for k, m in model.items()},
            )
        )

    check("init")
    for step in range(14):
        op = rng.choice(
            ["append", "widen", "narrow", "delete", "merge",
             "optimize", "restore"]
        )
        if op == "append":
            rows = mkrows(3, types)
            commit_rows(rows, types)
            for r in rows:
                model[r["k"]] = dict(r)
        elif op == "widen":
            widenable = [
                c for c, ty in types.items()
                if c != "k" and ty in ("int", "float")
            ]
            if not widenable:
                continue
            c = rng.choice(widenable)
            types[c] = {"int": "bigint", "float": "double"}[types[c]]
            rows = mkrows(2, types)
            commit_rows(rows, types, merge_schema=True)
            for r in rows:
                model[r["k"]] = dict(r)
        elif op == "narrow":
            # write with the ORIGINAL narrow types after a widening:
            # accepted under merge_schema, cast up at write (X163)
            use = {c: NARROW.get(ty, ty) for c, ty in types.items()}
            use["k"] = "bigint"
            if use == types:
                continue
            rows = mkrows(2, use)
            commit_rows(rows, use, merge_schema=True)
            for r in rows:
                model[r["k"]] = dict(r)
        elif op == "delete":
            if not model:
                continue
            p = rng.choice([3, 5, 7])
            rem = rng.randrange(p)
            tl.delete_rows(spark, t, F.col("k") % p == rem)
            model = {k: m for k, m in model.items() if k % p != rem}
        elif op == "merge":
            keys = sorted(model)
            upd = rng.sample(keys, min(2, len(keys))) if keys else []
            fresh = mkrows(1, types)
            src_rows = []
            for k in upd:
                r = {
                    "k": k,
                    "a": rng.randint(0, 99),
                    "b": float(rng.randint(0, 99)),
                }
                src_rows.append(r)
            src_rows += fresh
            src = spark.createDataFrame(
                [(r["k"], r["a"], r["b"]) for r in src_rows],
                _schema(types),
            )
            tl.merge_rows(spark, t, src, keys=["k"])
            for r in src_rows:
                model[r["k"]] = dict(r)
        elif op == "optimize":
            if clustered:
                tl.optimize(spark, t, target_bytes=1 << 20)
            else:
                tl.optimize(
                    spark, t, target_bytes=1 << 20,
                    min_file_bytes=4096,
                )
        elif op == "restore":
            if len(snapshots) < 2:
                continue
            v, snap = rng.choice(snapshots[:-1])
            tl.restore(spark, t, v)
            model = {k: dict(m) for k, m in snap.items()}
            # the restored version's declared types may be narrower —
            # the CURRENT head republishes them; track via the doc
            shape = dict(
                tl._schema_shape(
                    tl._version_doc(
                        spark, t, tl.current_version(spark, t)
                    )["schema"]
                )
            )
            types = {c: shape[c] for c in ("k", "a", "b")}
        check(op)

    # time-travel sweep: every snapshot reproduces at its own version
    for v, snap in snapshots:
        got = {
            r["k"]: {"k": r["k"], "a": r["a"], "b": r["b"]}
            for r in tl.read_version(spark, t, v).collect()
        }
        assert got == snap, (seed, v, got, snap)
