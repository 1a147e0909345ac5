"""HTML extraction (functions/html.py): lenient, linear, never raises
— malformed markup is the normal web case. Differential-pinned against
an independent regex twin on well-formed fixtures; hostile/stray
inputs pinned by hand."""

from __future__ import annotations

import html as _stdhtml
import re

from tableone_pyspark_spark.functions.html import html_extract, html_extract_py

PAGE = (
    "<!DOCTYPE html><html><head><title>My&nbsp;Page</title>"
    "<style>body { color: red }</style>"
    "<script>var x = '<p>not text</p>';</script></head>"
    "<body><h1>Header</h1>"
    "<p>First <b>bold</b> paragraph &amp; entity.</p>"
    "<!-- a comment <p>hidden</p> -->"
    "<div>Second<br>block</div>"
    "<ul><li>one</li><li><a href='/x'>two</a></li></ul>"
    "<p>Tail</p></body></html>"
)


def _regex_twin(doc: str) -> str:
    """Independent extraction for well-formed input: different
    mechanism (regex substitution pipeline) — same semantics."""
    t = re.sub(r"(?is)<script\b.*?</script\s*>", "", doc)
    t = re.sub(r"(?is)<style\b.*?</style\s*>", "", t)
    t = re.sub(r"(?s)<!--.*?-->", "", t)
    t = re.sub(r"(?is)<title\b.*?</title\s*>", "", t)
    block = r"p|div|br|li|ul|ol|h1|table|tr|td|th"
    t = re.sub(rf"(?i)</?(?:{block})\b[^>]*>", "\n", t)
    t = re.sub(r"(?s)<[^>]*>", "", t)
    t = _stdhtml.unescape(t)
    lines = [" ".join(ln.split()) for ln in t.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def test_extraction_matches_independent_twin():
    title, text, n_links, n_tags = html_extract_py(PAGE)
    assert title == "My Page"
    assert text == _regex_twin(PAGE)
    assert n_links == 1
    assert "not text" not in text and "color: red" not in text
    assert "hidden" not in text
    assert text.splitlines()[0] == "Header"
    assert "First bold paragraph & entity." in text.splitlines()


def test_lenient_on_malformed_input():
    # every case must return, never raise — and keep sane text
    cases = {
        "": ("", 0),
        "plain text, no tags": ("plain text, no tags", 0),
        "<p>unclosed paragraph": ("unclosed paragraph", 1),
        "stray < bracket and 1 < 2 math": ("stray < bracket and 1 < 2 math", 0),
        "<script>swallows to the end": ("", 1),
        "orphan </div> close</p>": ("orphan\nclose", 2),
        "<p>trailing open tag <": ("trailing open tag <", 1),
        "text <div attr=": ("text", 0),  # eof-in-tag: tag discarded
        "<>empty tag<></p>": ("<>empty tag<>", 1),
    }
    for doc, (want_text, want_tags) in cases.items():
        title, text, n_links, n_tags = html_extract_py(doc)
        assert text == want_text, doc
        assert n_tags == want_tags, doc
    assert html_extract_py(None) is None
    # self-closing script does not swallow
    _, text, _, _ = html_extract_py("<script/>visible<p>more")
    assert text == "visible\nmore"
    # second title ignored; attributes on tags fine; entity in title
    t, _, _, _ = html_extract_py(
        "<title>A &lt;B&gt;</title><title>ignored</title>"
        '<a href="x" class="y">link</a>'
    )
    assert t == "A <B>"


def test_html_extract_spark_column(spark):
    from pyspark.sql import functions as F

    rows = [(1, PAGE), (2, "<p>tiny</p>"), (3, None)]
    df = spark.createDataFrame(rows, "id long, html string")
    got = {
        r["id"]: r
        for r in df.select(
            "id", html_extract(F.col("html")).alias("e")
        ).select("id", "e.*").collect()
    }
    ref = html_extract_py(PAGE)
    assert (got[1]["title"], got[1]["text"]) == (ref[0], ref[1])
    assert (got[1]["n_links"], got[1]["n_tags"]) == (ref[2], ref[3])
    assert got[2]["text"] == "tiny"
    assert got[3]["text"] is None


def test_advice_r9_non_ascii_lowercase_preserves_offsets():
    """ADVICE r10 fix: str.lower() is not length-preserving (U+0130
    'İ' lowercases to two chars), so the RAWTEXT closer search in the
    lowered copy returned shifted offsets — '<title>İstanbul</title>'
    extracted title 'İstanbul<'. The ASCII-only translate keeps
    indices aligned."""
    from tableone_pyspark_spark.functions.html import html_extract_py

    title, text, n_links, n_tags = html_extract_py(
        "<title>İstanbul</title><p>after İİİ</p><script>İ x</script>ok"
    )
    assert title == "İstanbul"
    assert "after İİİ" in text and "ok" in text
    assert "x" not in text.split()  # script content still dropped
    # many İ before a <script>: content after it must survive intact
    _, text2, _, _ = html_extract_py(
        "<p>İİİİİİİİİİ</p><script>var i=1;</script><p>tail</p>"
    )
    assert "tail" in text2 and "var i" not in text2
