"""PII detection and redaction for training-data curation.

A corpus destined for model training must have contact information
stripped before anything else touches it, and the scrub has to run at
full scan speed: these are pure Catalyst regex expressions (JVM-side,
whole-stage codegen — no UDFs), so detection + redaction is a
projection over the 100 TB table with zero shuffle.

Patterns are restricted to syntax with identical semantics in Java
regex (Spark) and RE2 (DuckDB) — no lookaround, no backreferences —
so every operator is oracle-checkable.

North-star extension per BASELINE.json; the reference has no string
analytics at all (tableone_pyspark.py works on numeric/categorical
clinical columns only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: detection/redaction classes, applied in this order. Order matters
#: for redaction only: emails go first so their dotted domains can't
#: be half-eaten by the ipv4 pattern.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — charset form, no lookaround
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    # international phone as 2-3-3-4 digit groups (TPC-H c_phone shape)
    "phone": "\\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\\b",
    # dotted-quad IP
    "ipv4": "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
}


def pii_count(text: Column, kind: str) -> Column:
    """Number of ``kind`` matches in ``text`` (kind ∈ PII_PATTERNS)."""
    return F.regexp_count(text, F.lit(PII_PATTERNS[kind]))


def redact_pii(text: Column, kinds: tuple[str, ...] = tuple(PII_PATTERNS)) -> Column:
    """Replace every PII match with a ``<KIND>`` placeholder.

    Sequential replace in PII_PATTERNS order; each pattern sees the
    previous pattern's placeholders (angle brackets match no class, so
    passes never cascade).
    """
    out = text
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def pii_profile(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document PII profile: match counts per class + redacted size.

    Columns: ``id, n_email, n_phone, n_ipv4, n_pii, orig_len,
    redacted_len``. Counts are measured on the original text (so
    overlapping classes each report their own view); ``redacted_len``
    is the length after the ordered redaction pass.

    Pure projection — no shuffle, codegen'd end-to-end; at 100 TB this
    runs at parquet-scan speed and the scan reads only (id, text).
    """
    t = F.col(text_col)
    counts = {k: pii_count(t, k).alias(f"n_{k}") for k in PII_PATTERNS}
    return df.select(
        F.col(id_col).alias("id"),
        *counts.values(),
        sum(
            (pii_count(t, k) for k in PII_PATTERNS), F.lit(0)
        ).alias("n_pii"),
        F.length(t).alias("orig_len"),
        F.length(redact_pii(t)).alias("redacted_len"),
    )
