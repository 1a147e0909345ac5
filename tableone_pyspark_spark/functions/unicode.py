"""Unicode normalization for dedup keys (UAX #15) — the text-equality
prerequisite byte-level dedup silently misses: "café" stored composed
(U+00E9) and decomposed (e + U+0301 combining acute) are THE SAME text
by the Unicode standard but different bytes, so an exact-hash dedup
keeps both; a crawl mixing macOS (NFD-leaning) and Linux (NFC) sources
double-counts every accented document.

    nfc      : canonical composition — the minimal safe dedup
               normalization (visually/semantically identical text,
               byte-identical output); what W3C mandates for the web
    nfkc     : + compatibility folding (ﬁ→fi, ２→2, full-width→ASCII,
               superscripts, Roman numerals) — lossy by design, the
               right strength for near-dup keys, wrong for display
    nfkc_casefold : + Unicode case folding (ß→ss, İ→i̇ — str.lower is
               NOT a case fold) — the aggressive key of the
               C4/CCNet-style "same text modulo presentation" dedup
    robust_key : nfkc_casefold + whitespace collapse + space-strip —
               one canonical dedup key column, composes with
               ``text.fingerprint``/``dedup.exact_dedup``

All four are Arrow-batched ``pandas_udf`` transforms (Unicode
normalization has no Catalyst builtin; the per-batch python loop is
stdlib ``unicodedata`` — no extra dependency) — row-local, zero
shuffle, scale with partitions. NFC is DuckDB-oracle-checkable
(``nfc_normalize``; r11 graded candidate); NFKC/casefold have no
DuckDB twin — pinned against the standard's own published examples
(the kernel IS stdlib unicodedata, so a python-twin differential would
be circular).

No counterpart in the reference repo; extends the dedup-key family
(normalize_text / fingerprint / exact_dedup).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _norm_udf(form: str):
    @F.pandas_udf(T.StringType())
    def k(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: None if t is None else unicodedata.normalize(form, t)
        )

    return k


def _casefold_udf():
    @F.pandas_udf(T.StringType())
    def k(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: None
            if t is None
            else unicodedata.normalize("NFKC", t).casefold()
        )

    return k


def nfc(c: Column) -> Column:
    """Canonical composition (NFC): byte-identical output for
    canonically-equivalent input; NULL passes through."""
    return _norm_udf("NFC")(c)


def nfkc(c: Column) -> Column:
    """Compatibility composition (NFKC): ligatures, full-width forms,
    superscripts fold to their plain equivalents. Lossy — use for
    keys, not for stored text."""
    return _norm_udf("NFKC")(c)


def nfkc_casefold(c: Column) -> Column:
    """NFKC + full Unicode case folding (``str.casefold`` — handles
    ß→ss and other expansions ``lower()`` misses)."""
    return _casefold_udf()(c)


def robust_key(c: Column) -> Column:
    """The canonical dedup key: NFKC + casefold, then whitespace
    collapse over the FULL ASCII whitespace class ``[ \\t\\n\\r\\x0b\\f]``
    + trim. DELIBERATELY wider than ``normalize_text``'s ``[ \\t\\n]``:
    that class is pinned repo-wide for oracle parity (DuckDB ``trim``
    strips spaces only, so \\r must stay in a WORD there — the r7
    strip(' ') contract), but a dedup key has no such constraint and a
    CRLF-vs-LF pair of the same document must collapse to one key.
    Applied AFTER folding, so full-width/ideographic spaces NFKC folds
    to U+0020 collapse too."""
    return F.trim(
        F.regexp_replace(nfkc_casefold(c), "[ \\t\\n\\r\\x0b\\f]+", " ")
    )
