"""WARC (ISO 28500 / WARC/1.x) record parsing — the CommonCrawl
ingest format: every at-scale web corpus starts by splitting WARC
archives into (uri, fetch-time, HTTP status, body) records that feed
the HTML extractor (``functions/html.py``) and everything after it.

Layout per record:

    WARC/1.0<CRLF>
    <header-name>: <value><CRLF> ...      (till a blank line)
    <CRLF>
    <Content-Length bytes of payload>
    <CRLF><CRLF>                          (record separator)

``response`` records carry a full HTTP response as payload (status
line, headers, blank line, body) — the body is what a pipeline wants.
``warcinfo``/``request``/``metadata`` records pass through with a
NULL http side. A ``.warc.gz`` archive is a CONCATENATION of gzip
members (one per record, the spec's recommendation) — stdlib zlib
inflates them in sequence.

Contract: WARC is an ARCHIVE format, so this parser sides with the
codec family, not the URL/HTML leniency: truncation, a missing
mandatory header, a bad version line or an over-long declared length
raise ValueError (corruption of an archive is a data-integrity
signal), with a record-count bomb guard; line endings are accepted as
CRLF (spec) or bare LF (real-world tolerance that loses nothing).
HTTP payloads that fail to parse degrade to NULL http fields rather
than failing the record — the archive structure was intact; the
paylod is web garbage, which is normal.

Spark shape: one ``mapInPandas`` explode of archive payloads into
record rows — row-local, archives never leave the executor, output
carries only the typed fields + body bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_RECORDS = 1 << 20  # bomb guard per archive
MAX_INFLATED = 1 << 33  # 8 GiB inflated bytes per archive — bomb guard
_GZ_CHUNK = 1 << 20


def _gunzip_members(data: bytes, max_inflated: int = MAX_INFLATED) -> bytes:
    """Inflate a concatenation of gzip members (the .warc.gz layout).

    Feeds bounded chunks from a memoryview: per-member work stays
    proportional to member size (a whole-tail slice per member would
    be O(members × archive) on the format's NORMAL 100k-member input),
    and the inflated-size cap trips BEFORE a gzip bomb fills memory —
    the png.py incremental-inflate pattern (self-review r9)."""
    import zlib

    mv = memoryview(data)
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            while not d.eof:
                if pos >= n:
                    raise ValueError("WARC gzip member truncated")
                chunk = mv[pos : pos + _GZ_CHUNK]
                pos += len(chunk)
                out += d.decompress(chunk)
                if len(out) > max_inflated:
                    raise ValueError(
                        f"WARC bomb guard: inflates past {max_inflated} bytes"
                    )
        except zlib.error as exc:
            raise ValueError(f"WARC gzip member: {exc}") from None
        # unused_data is at most one chunk: the next member's start
        pos -= len(d.unused_data)
    return bytes(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\n"):
        line = line.rstrip(b"\r")
        if not line:
            continue
        sep = line.find(b":")
        if sep <= 0:
            raise ValueError(f"WARC: malformed header line {line[:60]!r}")
        headers[line[:sep].strip().decode("latin-1").lower()] = (
            line[sep + 1 :].strip().decode("latin-1")
        )
    return headers


def _parse_http(payload: bytes):
    """(status, content_type, body) from an HTTP response payload —
    None fields when it does not parse (web garbage is normal; the
    ARCHIVE was intact, so this is not a record error)."""
    # whichever blank-line terminator comes FIRST ends the headers —
    # preferring \r\n\r\n anywhere would let CRLF bytes inside the
    # BODY of an LF-headered response swallow text (self-review r9;
    # same rule parse_warc_py already applies to record headers)
    crlf = payload.find(b"\r\n\r\n")
    lf = payload.find(b"\n\n")
    if crlf < 0 and lf < 0:
        return None, None, None
    if lf >= 0 and (crlf < 0 or lf < crlf):
        sep, nl = lf, b"\n"
    else:
        sep, nl = crlf, b"\r\n"
    head = payload[:sep]
    body = payload[sep + 2 * len(nl) :]
    lines = head.split(nl)
    first = lines[0] if lines else b""
    parts = first.split()
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        return None, None, None
    try:
        status = int(parts[1])
    except ValueError:
        return None, None, None
    ctype = None
    try:
        hdrs = _parse_headers(nl.join(lines[1:]))
        ctype = hdrs.get("content-type")
    except ValueError:
        pass  # unparseable HTTP headers: keep status + body
    return status, ctype, body


def parse_warc_py(
    data: bytes, max_records: int = MAX_RECORDS
) -> list[dict]:
    """Python twin of :func:`warc_records` — the single source of
    truth for the record walk. Returns a list of dicts with keys
    (record_index, warc_type, target_uri, warc_date, record_length,
    http_status, content_type, body)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records = []
    pos = 0
    n = len(data)
    idx = 0
    while pos < n:
        # tolerate separator slack between records
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        eol = data.find(b"\n", pos)
        if eol < 0:
            raise ValueError("WARC: truncated version line")
        version = data[pos:eol].rstrip(b"\r")
        if not version.startswith(b"WARC/"):
            raise ValueError(f"WARC: bad version line {version[:30]!r}")
        hdr_end = data.find(b"\r\n\r\n", eol)
        lf_end = data.find(b"\n\n", eol)
        if hdr_end < 0 or (0 <= lf_end < hdr_end):
            hdr_end, skip = lf_end, 2
        else:
            skip = 4
        if hdr_end < 0:
            raise ValueError("WARC: record headers never end")
        headers = _parse_headers(data[eol + 1 : hdr_end])
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise ValueError("WARC: record missing Content-Length")
        except ValueError:
            raise ValueError("WARC: non-numeric Content-Length")
        if length < 0:
            raise ValueError("WARC: negative Content-Length")
        body_start = hdr_end + skip
        if body_start + length > n:
            raise ValueError("WARC: declared length runs past the archive")
        payload = data[body_start : body_start + length]
        wtype = headers.get("warc-type")
        if wtype is None:
            raise ValueError("WARC: record missing WARC-Type")
        status = ctype = body = None
        if wtype == "response":
            status, ctype, body = _parse_http(payload)
        records.append(
            {
                "record_index": idx,
                "warc_type": wtype,
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "record_length": length,
                "http_status": status,
                "content_type": ctype,
                "body": body,
            }
        )
        idx += 1
        if idx > max_records:
            raise ValueError(
                f"WARC bomb guard: more than {max_records} records"
            )
        pos = body_start + length
    if not records:
        raise ValueError("WARC: archive contains no records")
    return records


WARC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("record_index", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("record_length", T.LongType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("body", T.BinaryType()),
    ]
)


def warc_records(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Explode WARC archive payloads into typed record rows — one
    Arrow pass, archives never leave the executor. ``body`` is the
    HTTP response body for ``response`` records (NULL http fields for
    other record types or unparseable HTTP payloads).

    The input is the narrow-and-heavy shape (a handful of GB-scale
    archive blobs per split), so the CPU-bound record walk sits behind
    ``rebalance()`` — the r7 lesson: a narrow source otherwise starves
    cores while one task inflates everything (no-op on wide inputs)."""
    from tableone_pyspark_spark.plans.layout import rebalance

    src = rebalance(
        df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                for r in parse_warc_py(bytes(payload)):
                    rows.append((int(i), *r.values()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return src.mapInPandas(kernel, WARC_SCHEMA)


WARC_PAGES_SCHEMA = (
    "id long, url string, title string, text string, "
    "n_links int, n_tags int"
)


def warc_pages(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Archive payloads → extracted page rows in ONE Python pass (r18,
    guide §4.1 "how many columns cross" / §4.2): ``parse_warc_py`` +
    the response/200 filter + ``decode_body_py`` + ``html_extract_py``
    + ``canonical_url_py`` composed inside a single ``mapInPandas``
    kernel. The unfused pipeline pays THREE JVM↔Python crossings for
    the same work — record rows (with body bytes) out of the parse
    kernel, bodies back into the chained decode+extract+canonicalize
    Arrow projection, results out again — plus the Arrow serialization
    of every non-response record the filter then discards. Here the
    archive bytes cross once and only final page rows come back.

    Bit-identical to the unfused composition
    ``warc_records → where(response ∧ 200) → canonical_url(uri),
    html_extract(decode_body(body, content_type))`` — the composition
    stays the differential reference twin (tests/test_warc.py); all
    five Python twins remain the single source of truth for semantics.
    """
    from tableone_pyspark_spark.functions.html import html_extract_py
    from tableone_pyspark_spark.functions.url import canonical_url_py
    from tableone_pyspark_spark.plans.layout import rebalance

    src = rebalance(
        df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                for r in parse_warc_py(bytes(payload)):
                    if r["warc_type"] != "response" or r["http_status"] != 200:
                        continue
                    uri = r["target_uri"]
                    url = None if uri is None else canonical_url_py(uri)
                    doc = decode_body_py(r["body"], r["content_type"])
                    ext = html_extract_py(doc)
                    title, text, n_links, n_tags = (
                        (None, None, None, None) if ext is None else ext
                    )
                    rows.append((int(i), url, title, text, n_links, n_tags))
            yield pd.DataFrame(
                rows,
                columns=["id", "url", "title", "text", "n_links", "n_tags"],
            )

    return src.mapInPandas(kernel, WARC_PAGES_SCHEMA)


def encode_warc(
    records: list[tuple[str, str, bytes]],
    gzip_members: bool = False,
    date: str = "2024-01-01T00:00:00Z",
) -> bytes:
    """Fixture/round-trip writer: (warc_type, target_uri, payload)
    triples → a spec-shaped WARC/1.0 archive; ``gzip_members`` emits
    the one-gzip-member-per-record .warc.gz layout."""
    import gzip as _gzip

    out = bytearray()
    for k, (wtype, uri, payload) in enumerate(records):
        rec = bytearray()
        rec += b"WARC/1.0\r\n"
        rec += f"WARC-Type: {wtype}\r\n".encode()
        rec += f"WARC-Record-ID: <urn:test:{k}>\r\n".encode()
        rec += f"WARC-Date: {date}\r\n".encode()
        if uri:
            rec += f"WARC-Target-URI: {uri}\r\n".encode()
        rec += f"Content-Length: {len(payload)}\r\n".encode()
        rec += b"\r\n"
        rec += payload
        rec += b"\r\n\r\n"
        out += _gzip.compress(bytes(rec)) if gzip_members else rec
    return bytes(out)


def http_response(
    body: bytes,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
) -> bytes:
    """Fixture HTTP response payload for ``response`` records."""
    head = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body


def decode_body_py(
    body: bytes | None, content_type: str | None
) -> str | None:
    """HTTP body bytes → text, the lenient web way: BOM first (it
    outranks the header by observation — servers lie), then the
    ``charset=`` parameter of Content-Type, then UTF-8; undecodable
    bytes are REPLACED, never fatal (text-side contract: a mangled
    page should become low-quality text, not a dead batch). Unknown
    or garbage charset names fall back to UTF-8-with-replacement."""
    if body is None:
        return None
    if body[:3] == b"\xef\xbb\xbf":
        return body[3:].decode("utf-8", "replace")
    if body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return body.decode("utf-16", "replace")
    charset = "utf-8"
    if content_type:
        # parameter-boundary parse: a vendor param like x-charset=
        # must not be misread as the charset (self-review r9)
        for param in content_type.lower().split(";")[1:]:
            k, _, v = param.partition("=")
            if k.strip() == "charset":
                cand = v.strip().strip("\"'")
                if cand:
                    charset = cand
                break
    try:
        return body.decode(charset, "replace")
    except LookupError:  # server lied with a nonsense charset name
        return body.decode("utf-8", "replace")


def decode_body(body, content_type) -> "F.Column":
    """Column form of :func:`decode_body_py` — one Arrow projection
    over (body, content_type) pairs."""

    @F.pandas_udf("string")
    def kernel(b: pd.Series, ct: pd.Series) -> pd.Series:
        return pd.Series(
            [
                decode_body_py(
                    bytes(x) if x is not None else None, c
                )
                for x, c in zip(b, ct)
            ]
        )

    return kernel(body, content_type)
