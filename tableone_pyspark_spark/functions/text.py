"""Text-analysis column functions for large-scale document pipelines.

All functions build pure Catalyst column expressions (JVM-side,
whole-stage codegen — no UDFs), so they run at full speed over a
100 TB `documents` table. Regex patterns are restricted to syntax with
identical semantics in Java regex (Spark) and RE2 (DuckDB) so each
operator is oracle-checkable.

Operators (north-star extensions per BASELINE.json; no equivalent in
the reference, which has no string analytics at all):
  * token / word / char counting (whitespace + BPE-ish regex)
  * quality scoring (length, punctuation, stopword, alpha ratios)
  * language ID (marker-word + CJK-codepoint heuristic)
  * document fingerprinting (normalized-text xxhash64)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish pre-tokenization: letter runs, single digits, or single
#: non-space punctuation — approximates byte-pair-encoder input units
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n]"

#: whitespace-delimited word
WORD_RE = "[^ \\t\\n]+"

#: punctuation / symbols (not alphanumeric, not whitespace)
PUNCT_RE = "[^A-Za-z0-9 \\t\\n]"

#: small English stopword set used for the stopword ratio
STOPWORDS = ["the", "and", "of", "to", "is", "in", "a", "that", "it", "for"]
STOPWORD_RE = "\\b(" + "|".join(STOPWORDS) + ")\\b"

#: language marker words; scored per language then arg-maxed.
#: zh is detected first by CJK codepoints (no spaces to tokenize).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "you", "with"],
    "es": ["el", "la", "los", "las", "que", "una", "para"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "fr": ["le", "les", "est", "une", "dans", "pour", "vous"],
}
#: \x{...} escape form — identical syntax in Java regex and RE2/DuckDB
CJK_RE = "[\\x{4e00}-\\x{9fff}]"


def word_count(c: Column) -> Column:
    """Whitespace-token count."""
    return F.regexp_count(c, F.lit(WORD_RE))


def token_count(c: Column) -> Column:
    """BPE-ish token count — a fast, deterministic proxy for LLM token
    budgeting (letter runs + digits + punctuation marks)."""
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE))


def char_count(c: Column) -> Column:
    return F.length(c)


def punct_ratio(c: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    return F.regexp_count(c, F.lit(PUNCT_RE)) / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(c: Column) -> Column:
    """English stopword tokens / words (0 for empty)."""
    hits = F.regexp_count(F.lower(c), F.lit(STOPWORD_RE))
    return hits / F.greatest(word_count(c), F.lit(1))


def alpha_ratio(c: Column) -> Column:
    return F.regexp_count(c, F.lit("[A-Za-z]")) / F.greatest(F.length(c), F.lit(1))


def quality_score(c: Column) -> Column:
    """Heuristic document quality in [0, 1]: rewards mid-length docs,
    alphabetic content and natural stopword density; penalizes
    punctuation walls. Deterministic and SQL-expressible."""
    length_term = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    sw = stopword_ratio(c)
    sw_term = F.least(sw / F.lit(0.3), F.lit(1.0))
    return (
        F.lit(0.3) * length_term
        + F.lit(0.3) * alpha_ratio(c)
        + F.lit(0.3) * sw_term
        + F.lit(0.1) * (F.lit(1.0) - F.least(punct_ratio(c) * 3, F.lit(1.0)))
    )


def lang_scores(c: Column) -> dict[str, Column]:
    """Per-language marker-hit counts (plus CJK codepoint count)."""
    low = F.lower(c)
    out = {"zh": F.regexp_count(c, F.lit(CJK_RE))}
    for lang, words in LANG_MARKERS.items():
        pat = "\\b(" + "|".join(words) + ")\\b"
        out[lang] = F.regexp_count(low, F.lit(pat))
    return out


def lang_id(c: Column) -> Column:
    """Arg-max language over :func:`lang_scores` with a fixed
    tie-break order (zh > en > es > de > fr), so results are identical
    across engines."""
    s = lang_scores(c)
    return (
        F.when(s["zh"] >= 1, F.lit("zh"))
        .when((s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]), F.lit("en"))
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]), F.lit("es"))
        .when(s["de"] >= s["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def normalize_text(c: Column) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(c), "[ \\t\\n]+", " "))


def fingerprint(c: Column) -> Column:
    """64-bit content fingerprint of the normalized text (xxhash64 —
    engine-specific values; use for grouping, not cross-engine compare)."""
    return F.xxhash64(normalize_text(c))


def poly_hash(c: Column, base: int = 31, mod: int = (1 << 31) - 1) -> Column:
    """Polynomial (Rabin-Karp) Horner fold ``acc = (acc·base + code) %
    mod`` over the character codes of ``c`` (no normalization). The
    value is defined by pure arithmetic any engine reproduces exactly —
    the cross-engine-checkable alternative to xxhash64. ``mod`` < 2³¹
    keeps every intermediate below 2⁶³ (no overflow under ANSI). Pure
    Catalyst fold; use for grouping/content-addressing, not
    cryptographic integrity."""
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


def rolling_fingerprint(c: Column, base: int = 31, mod: int = (1 << 31) - 1) -> Column:
    """:func:`poly_hash` of the normalized text — the oracle-checkable
    document fingerprint (vs :func:`fingerprint`'s engine-specific
    xxhash64); the rolling structure extends to windowed substring
    hashing."""
    return poly_hash(normalize_text(c), base, mod)
