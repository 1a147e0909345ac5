"""WARC parsing (functions/warc.py): the CommonCrawl ingest format.
Round-trips through the fixture writer (plain + per-record gzip),
typed hostile paths, HTTP payload degradation, and the end-to-end
web pipeline composition WARC -> html_extract -> c4-style filters."""

from __future__ import annotations

import pytest

from tableone_pyspark_spark.functions.warc import (
    encode_warc,
    http_response,
    parse_warc_py,
    warc_records,
)

PAGES = [
    (
        "http://example.com/a",
        b"<html><head><title>Page A</title></head>"
        b"<body><p>Alpha text here.</p></body></html>",
    ),
    (
        "http://example.com/b",
        b"<html><body><script>if (a < b) x();</script>"
        b"<p>Beta body.</p></body></html>",
    ),
]


def _archive(gz=False):
    recs = [("warcinfo", None, b"software: test\r\n")]
    for uri, page in PAGES:
        recs.append(("request", uri, b"GET / HTTP/1.1\r\n\r\n"))
        recs.append(("response", uri, http_response(page)))
    return encode_warc(recs, gzip_members=gz)


@pytest.mark.parametrize("gz", [False, True])
def test_round_trip(gz):
    recs = parse_warc_py(_archive(gz))
    assert len(recs) == 5
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "request", "response", "request", "response",
    ]
    responses = [r for r in recs if r["warc_type"] == "response"]
    for r, (uri, page) in zip(responses, PAGES):
        assert r["target_uri"] == uri
        assert r["http_status"] == 200
        assert r["content_type"].startswith("text/html")
        assert r["body"] == page
    # non-response records carry NULL http fields
    assert recs[0]["http_status"] is None and recs[0]["body"] is None


def test_hostile_paths_raise():
    good = _archive()
    with pytest.raises(ValueError, match="bad version line"):
        parse_warc_py(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="no records"):
        parse_warc_py(b"")
    with pytest.raises(ValueError, match="declared length"):
        parse_warc_py(good[:-40])  # truncate inside the final payload
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_py(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nxx\r\n\r\n")
    with pytest.raises(ValueError, match="bomb guard"):
        parse_warc_py(_archive(), max_records=3)
    with pytest.raises(ValueError, match="gzip member"):
        parse_warc_py(b"\x1f\x8b" + b"\x00" * 40)
    # an unparseable HTTP payload degrades to NULL http fields — the
    # ARCHIVE was intact, so it is not a record error
    weird = encode_warc([("response", "http://e.com", b"not http at all")])
    r = parse_warc_py(weird)[0]
    assert r["http_status"] is None and r["body"] is None
    assert r["record_length"] == len(b"not http at all")


def test_warc_to_training_text_pipeline(spark):
    """The full web ingest composition: WARC archives -> record
    explode -> html_extract -> per-page training text + quality
    signals, all row-local."""
    from pyspark.sql import functions as F

    from tableone_pyspark_spark.functions.html import html_extract

    df = spark.createDataFrame(
        [(1, bytearray(_archive())), (2, bytearray(_archive(gz=True)))],
        "id long, payload binary",
    )
    recs = warc_records(df, "id", "payload")
    pages = (
        recs.where(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
        )
        .select(
            "id",
            "target_uri",
            html_extract(F.decode("body", "UTF-8")).alias("e"),
        )
        .select("id", "target_uri", "e.title", "e.text", "e.n_links")
    )
    got = {(r["id"], r["target_uri"]): r for r in pages.collect()}
    assert len(got) == 4  # 2 archives x 2 pages
    a = got[(1, "http://example.com/a")]
    assert a["title"] == "Page A" and a["text"] == "Alpha text here."
    b = got[(2, "http://example.com/b")]
    # the RAWTEXT script rule holds through the whole pipeline
    assert b["text"] == "Beta body." and b["title"] is None


def test_decode_body_charsets(spark):
    from pyspark.sql import functions as F

    from tableone_pyspark_spark.functions.warc import decode_body, decode_body_py

    d = decode_body_py
    assert d("héllo".encode("latin-1"), "text/html; charset=ISO-8859-1") == "héllo"
    assert d("héllo".encode("utf-8"), "text/html; charset=utf-8") == "héllo"
    # BOM outranks a lying header
    assert d(b"\xef\xbb\xbf" + "héllo".encode("utf-8"), "charset=latin-1") == "héllo"
    assert d("héllo".encode("utf-16"), None) == "héllo"  # BOM sniff
    # nonsense charset name falls back; bad bytes replace, never raise
    assert d(b"ok", "text/html; charset=not-a-charset") == "ok"
    assert d(b"\xc3(", None) == "�("  # invalid utf-8 replaced
    # vendor params whose NAME merely ends in 'charset' are ignored
    assert d("héllo".encode("latin-1"),
             "text/html; x-charset=utf-16; charset=latin-1") == "héllo"
    assert d(b"ok", "text/html; x-charset=shift_jis") == "ok"
    assert d(None, "text/html") is None
    # column form agrees
    df = spark.createDataFrame(
        [(1, bytearray("héllo".encode("latin-1")), "text/plain; charset=latin-1"),
         (2, None, None)],
        "id long, body binary, ct string",
    )
    got = {r["id"]: r["t"] for r in df.select(
        "id", decode_body(F.col("body"), F.col("ct")).alias("t")
    ).collect()}
    assert got[1] == "héllo" and got[2] is None


def test_warc_pages_matches_unfused_composition(spark):
    # r18: the fused one-crossing kernel (warc_pages) must be
    # BIT-identical to the unfused reference composition
    # warc_records -> where(response ∧ 200) -> canonical_url(uri) +
    # html_extract(decode_body(body, content_type)) — covering the
    # warc_pipeline fixture arms (utf-8 / latin-1 / BOM-over-lying-
    # header, messy canonicalizable URIs, gzip + plain archives) AND
    # rows the filter must drop (warcinfo/request records, a 404, an
    # unparseable-HTTP response whose status is NULL)
    from pyspark.sql import functions as F

    from tableone_pyspark_spark.functions.html import html_extract
    from tableone_pyspark_spark.functions.url import canonical_url
    from tableone_pyspark_spark.functions.warc import decode_body, warc_pages

    def page(body: bytes, ct: str, status: int = 200) -> bytes:
        head = f"HTTP/1.1 {status} X\r\nContent-Type: {ct}\r\n\r\n"
        return head.encode("latin-1") + body

    html_a = "<html><head><title>Café A</title></head><body><p>texte ici café</p><p><a href='/x'>go</a></p></body></html>"
    recs = [
        ("warcinfo", None, b"software: test\r\n"),
        ("request", "http://e.com/a", b"GET / HTTP/1.1\r\n\r\n"),
        ("response", "HTTP://Example.COM:80/d/1?utm_source=x&b=1",
         page(html_a.encode("utf-8"), "text/html; charset=utf-8")),
        ("response", "http://example.com/latin",
         page(html_a.encode("latin-1"), "text/html; charset=iso-8859-1")),
        ("response", "http://example.com/bom",
         page(b"\xef\xbb\xbf" + html_a.encode("utf-8"),
              "text/html; charset=iso-8859-1")),  # BOM beats lying header
        ("response", "http://example.com/404",
         page(b"<html><body>gone</body></html>", "text/html", status=404)),
        ("response", "http://example.com/garbage", b"not http at all"),
        ("response", None,
         page(b"<html><body><p>no uri</p></body></html>", "text/html")),
    ]
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_warc(recs))),
            (2, bytearray(encode_warc(recs, gzip_members=True))),
        ],
        "id long, payload binary",
    )
    unfused = (
        warc_records(df, "id", "payload")
        .where(
            (F.col("warc_type") == "response") & (F.col("http_status") == 200)
        )
        .select(
            "id",
            canonical_url(F.col("target_uri")).alias("url"),
            html_extract(
                decode_body(F.col("body"), F.col("content_type"))
            ).alias("e"),
        )
        .select("id", "url", "e.title", "e.text", "e.n_links", "e.n_tags")
    )
    fused = warc_pages(df, "id", "payload")
    srt = lambda t: (t[0], t[1] or "", t[3] or "")  # noqa: E731
    want = sorted(map(tuple, unfused.collect()), key=srt)
    got = sorted(map(tuple, fused.collect()), key=srt)
    assert len(want) == 8  # 4 kept responses x 2 archives (404 + NULL-status dropped)
    assert got == want
