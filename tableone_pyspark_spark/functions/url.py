"""URL canonicalization for web-corpus pipelines — the dedup key a
crawl needs before any content-level pass (the same page fetched as
``HTTP://Example.com:80/a?utm_source=x&b=1#top`` and
``http://example.com/a?b=1`` must collapse to ONE key).

Rules (each deliberate, the conservative CommonCrawl-style set):

  * scheme and host lowercase (RFC 3986 §6.2.2.1);
  * default ports stripped (``:80`` for http, ``:443`` for https);
  * the fragment dropped (never reaches the server);
  * query parameters SORTED by (key, value) — param order is not
    semantic for the overwhelming majority of endpoints — with the
    standard tracking params removed (``utm_*``, ``fbclid``,
    ``gclid``, ``msclkid``, ``ref``, ``ref_src``) since they vary per
    click, not per page;
  * an empty path becomes ``/``;
  * surrounding whitespace stripped;
  * userinfo PRESERVED verbatim (``user:pass@host`` and ``host`` are
    different authorities per RFC 3986 §3.2 and must not collapse to
    one dedup key — ADVICE r9 flagged the silent drop).

NOT done, deliberately: ``www.`` stripping (a different host may
serve different content), percent-decoding (decoding reserved
characters changes meaning; normalizing only unreserved escapes is
rarely load-bearing and easy to get wrong), and registrable-domain
extraction beyond the naive heuristic (`registrable_domain` documents
its public-suffix-list gap — ``co.uk`` style suffixes need the PSL,
which is not in this container; a real PSL slots into that seam).

Shapes: scalar Arrow kernels (``pandas_udf``) over ``urllib.parse`` —
row-local, zero shuffle; canonicalization is the hot path of a
trillion-URL frontier and stays in one projection. Unparseable or
schemeless input returns NULL rather than raising: a crawl frontier
is full of garbage URLs and one must not fail the batch (unlike the
codec contract, where a corrupt payload is a data-integrity signal).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING = ("fbclid", "gclid", "msclkid", "ref", "ref_src")
_DEFAULT_PORTS = {"http": 80, "https": 443}


def canonical_url_py(url: str | None) -> str | None:
    """Python twin of :func:`canonical_url` (single source of truth —
    the Column form wraps this in an Arrow batch)."""
    from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

    if url is None:
        return None
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    try:
        port = parts.port
    except ValueError:
        return None
    if ":" in host:  # IPv6 literal: hostname strips the brackets —
        host = f"[{host}]"  # restore them or the rebuilt URL is garbage
    netloc = host
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    if parts.username is not None:
        # verbatim (percent-encoding untouched, like the path); an
        # empty username with a password still keeps the '@' form
        userinfo = parts.username
        if parts.password is not None:
            userinfo += f":{parts.password}"
        netloc = f"{userinfo}@{netloc}"
    path = parts.path or "/"
    q = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not (k.startswith("utm_") or k in _TRACKING)
    ]
    query = urlencode(sorted(q))
    return urlunsplit((scheme, netloc, path, query, ""))


def canonical_url(c: Column) -> Column:
    """Canonical form of a URL column (NULL for garbage) — the web
    dedup key. One Arrow-batched scalar projection."""

    @F.pandas_udf("string")
    def kernel(s: pd.Series) -> pd.Series:
        return s.map(canonical_url_py, na_action="ignore")

    return kernel(c)


def url_host_py(url: str | None) -> str | None:
    from urllib.parse import urlsplit

    if url is None:
        return None
    try:
        host = urlsplit(url.strip()).hostname
    except ValueError:
        return None
    return host.lower() if host else None


def url_host(c: Column) -> Column:
    """Lowercased hostname (NULL for garbage) — ANY scheme (unlike
    :func:`canonical_url`, which is http/https-only): a generic
    splitter for logs that carry ftp/mailto rows too. For the
    consistent web profile use :func:`url_parts`/:func:`host_profile`,
    which derive the host from the canonical form."""

    @F.pandas_udf("string")
    def kernel(s: pd.Series) -> pd.Series:
        return s.map(url_host_py, na_action="ignore")

    return kernel(c)


def url_parts(c: Column) -> Column:
    """Struct(host, canon) from ONE urlsplit per row — the hot-path
    form (one Arrow crossing, one parse; ``canonical_url`` +
    ``url_host`` separately would parse every URL twice). ``host`` is
    the CANONICAL host (http/https only, both NULL for garbage), so
    every profile row counts exactly the URLs that produced a
    canonical key."""

    @F.pandas_udf("host string, canon string")
    def kernel(s: pd.Series) -> pd.DataFrame:
        from urllib.parse import urlsplit

        hosts, canons = [], []
        for u in s:
            canon = canonical_url_py(u)
            if canon is None:
                hosts.append(None)
                canons.append(None)
                continue
            hosts.append(urlsplit(canon).hostname)
            canons.append(canon)
        return pd.DataFrame({"host": hosts, "canon": canons})

    return kernel(c)


def registrable_domain_py(host: str | None) -> str | None:
    """NAIVE registrable domain: the last two labels. Correct for
    ``a.b.example.com`` → ``example.com``; WRONG for multi-label
    public suffixes (``bbc.co.uk`` → ``co.uk``) — the real fix is the
    Public Suffix List, which is not in this container; this function
    is the documented seam it plugs into. IP literals return as-is."""
    if host is None:
        return None
    h = host.lower().rstrip(".")
    if not h:
        return None
    labels = h.split(".")
    if len(labels) <= 2 or labels[-1].isdigit():  # short or IPv4
        return h
    return ".".join(labels[-2:])


def host_profile(df, url_col: str):
    """(host, n_urls, n_unique_canonical): the per-site frontier
    profile — one scan through the single-parse :func:`url_parts`
    kernel, one aggregation keyed by host (politeness/mixing
    decisions read this). Host comes from the CANONICAL form, so
    n_urls counts exactly the canonicalizable (web) population —
    ftp/mailto/garbage rows influence nothing."""
    base = df.select(url_parts(F.col(url_col)).alias("p")).select(
        "p.host", "p.canon"
    ).where(F.col("host").isNotNull())
    return base.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("canon").alias("n_unique_canonical"),
    )
