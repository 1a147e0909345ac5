"""Unicode normalization functions (functions/unicode.py): pinned
against the standard's published equivalences (UAX #15 / the Unicode
case-folding table), the DuckDB nfc_normalize twin for NFC, and the
dedup use-case that motivates the module. All non-ASCII fixture text
is written as escapes so the normalization FORM under test is
unambiguous in the source."""

from __future__ import annotations

from pyspark.sql import functions as F

from tableone_pyspark_spark.functions.unicode import (
    nfc,
    nfkc,
    nfkc_casefold,
    robust_key,
)

COMPOSED = "caf\u00e9"  # e-acute as one codepoint
DECOMPOSED = "cafe\u0301"  # e + combining acute


def test_nfc_canonical_equivalence(spark):
    df = spark.createDataFrame(
        [(1, COMPOSED), (2, DECOMPOSED), (3, None), (4, "plain")],
        "id long, t string",
    )
    got = {
        r["id"]: r["n"]
        for r in df.select("id", nfc(F.col("t")).alias("n")).collect()
    }
    assert got[1] == got[2] == COMPOSED  # canonically equivalent unify
    assert got[3] is None
    assert got[4] == "plain"
    # the DuckDB oracle twin agrees byte-for-byte (the r11 grading seam)
    import duckdb

    want = duckdb.connect().execute(
        "select nfc_normalize(?)", [DECOMPOSED]
    ).fetchone()[0]
    assert got[2] == want


def test_nfkc_compatibility_folds(spark):
    rows = [
        (1, "\ufb01le"),       # fi ligature -> file
        (2, "\uff12\uff10"),  # full-width 2 0 -> 20
        (3, "x\u00b2"),        # superscript two -> x2
        (4, "\u2163"),         # Roman numeral four -> IV
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r["id"]: r["n"]
        for r in df.select("id", nfkc(F.col("t")).alias("n")).collect()
    }
    assert got[1] == "file"
    assert got[2] == "20"
    assert got[3] == "x2"
    assert got[4] == "IV"


def test_casefold_beyond_lower(spark):
    rows = [(1, "STRASSE"), (2, "stra\u00dfe"), (3, "\u0130stanbul")]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r["id"]: r["n"]
        for r in df.select("id", nfkc_casefold(F.col("t")).alias("n")).collect()
    }
    # eszett -> ss: casefold unifies what lower() cannot
    assert got[1] == got[2] == "strasse"
    # dotted capital I folds to i + combining dot (the documented
    # U+0130/lower() hazard from the html.py ADVICE r9 fix)
    assert got[3] == "i\u0307stanbul"


def test_robust_key_dedups_presentation_variants(spark):
    variants = [
        (1, "The  Caf\u00e9   MENU"),          # composed, messy runs
        (2, "the cafe\u0301 menu"),            # decomposed, lowercase
        (3, "The\u3000Caf\u00e9\u3000MENU"), # ideographic spaces
        (4, "\ufb01ne"),                       # unrelated text (fine)
    ]
    df = spark.createDataFrame(variants, "id long, t string")
    got = {
        r["id"]: r["k"]
        for r in df.select("id", robust_key(F.col("t")).alias("k")).collect()
    }
    # NFKC folds U+3000 IDEOGRAPHIC SPACE to U+0020, so the standard
    # whitespace collapse catches it too
    assert got[1] == got[2] == got[3] == "the caf\u00e9 menu"
    assert got[4] == "fine"
    # CRLF vs LF copies of a doc unify (robust_key's class is
    # deliberately wider than normalize_text's oracle-parity class)
    crlf = spark.createDataFrame(
        [(1, "line1\r\nline2"), (2, "line1\nline2")], "id long, t string"
    )
    keys = {
        r["id"]: r["k"]
        for r in crlf.select("id", robust_key(F.col("t")).alias("k")).collect()
    }
    assert keys[1] == keys[2] == "line1 line2"
    # the motivating dedup: exact grouping on the key unifies 1-3
    n = (
        df.groupBy(robust_key(F.col("t")).alias("k"))
        .count()
        .where(F.col("count") == 3)
        .count()
    )
    assert n == 1
