"""Oracle output-type convention guard (VERDICT r3 #7).

Three grading incidents across rounds 1-3 (``revenue_by_nation`` twice,
then ``resize_stats``/``pack_sequences``) shared one root cause: a DuckDB
oracle emitting a numeric type the driver's value hasher does not
canonicalize (DECIMAL, HUGEINT from ``list_sum``/windowed ``sum``
widening).  The convention is that every oracle output column must be one
of the driver-safe types below; this test DESCRIBEs all 90 oracles so a
new offender fails in pytest instead of costing a grading round.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Types the driver's hasher canonicalizes identically on both engines.
# Notably absent: DECIMAL(p,s) and HUGEINT/INT128.
SAFE_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT",
    "VARCHAR", "BOOLEAN",
    "DATE", "TIMESTAMP", "TIMESTAMP WITH TIME ZONE",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield c
    c.close()


def test_every_oracle_emits_only_driver_safe_types(con):
    offenders = []
    for name, sql in entry.oracle_sql().items():
        desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        for col, typ, *_ in desc:
            if typ not in SAFE_TYPES:
                offenders.append((name, col, typ))
    assert not offenders, (
        "oracle columns with driver-unsafe types (cast to BIGINT/DOUBLE): "
        f"{offenders}"
    )


def test_every_query_has_an_oracle_or_is_documented():
    qs = set(entry.queries())
    os_ = set(entry.oracle_sql())
    # every oracle key must be a real query
    assert os_ <= qs, f"orphan oracles: {sorted(os_ - qs)}"
