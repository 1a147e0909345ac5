"""robots.txt evaluation (functions/robots.py) — RFC 9309 semantics:
group selection by longest agent token with * fallback and group
merging, longest-pattern-wins with Allow on ties, * / $ patterns,
empty-Disallow and fail-open conventions, tolerant parsing."""

from __future__ import annotations

from tableone_pyspark_spark.functions.robots import (
    parse_robots_py,
    robots_allowed_py,
)

RULES = """
# corpus crawler policy
User-agent: examplebot
Disallow: /private/
Allow: /private/ok.html

User-agent: *
Disallow: /tmp/
Disallow: /*.pdf$
Allow: /tmp/readme

Sitemap: https://e.com/sitemap.xml
"""


def test_group_selection_and_merging():
    a = robots_allowed_py
    # the specific group governs examplebot; * does NOT also apply
    assert not a(RULES, "ExampleBot/1.0", "/private/x")
    assert a(RULES, "examplebot", "/private/ok.html")  # longer Allow
    assert a(RULES, "examplebot", "/tmp/file")  # * group not merged in
    # other agents take the * group
    assert not a(RULES, "otherbot", "/tmp/file")
    assert a(RULES, "otherbot", "/tmp/readme")      # longest match
    assert a(RULES, "otherbot", "/private/x")
    # two groups naming the SAME agent combine (RFC 9309 §2.2.1)
    two = "User-agent: bot\nDisallow: /a\n\nUser-agent: bot\nDisallow: /b\n"
    assert not a(two, "bot", "/a") and not a(two, "bot", "/b")


def test_patterns_and_tie_rules():
    a = robots_allowed_py
    r = "User-agent: *\nDisallow: /*.pdf$\nAllow: /docs/\n"
    assert not a(r, "x", "/files/report.pdf")
    assert a(r, "x", "/files/report.pdf?x=1")  # $ anchors the end
    assert a(r, "x", "/docs/guide.html")
    # equal-length Allow/Disallow tie -> Allow (least restrictive)
    tie = "User-agent: *\nDisallow: /page\nAllow: /page\n"
    assert a(tie, "x", "/page")
    # wildcard middle segment + *$ tail
    w = "User-agent: *\nDisallow: /a/*/secret\n"
    assert not a(w, "x", "/a/b/secret")
    assert a(w, "x", "/a/secret")
    w2 = "User-agent: *\nDisallow: /x*$\n"
    assert not a(w2, "x", "/xanything")


def test_fail_open_and_tolerance():
    a = robots_allowed_py
    # missing/empty/garbage rules restrict nothing
    assert a(None, "bot", "/anything")
    assert a("", "bot", "/anything")
    assert a("complete garbage\nno fields here", "bot", "/x")
    # empty Disallow: disallows nothing
    assert a("User-agent: *\nDisallow:\n", "bot", "/x")
    # rules before any User-agent line are ignored (tolerant)
    assert a("Disallow: /x\nUser-agent: *\nAllow: /\n", "bot", "/x")
    # comments and unknown fields ignored
    assert not a(
        "User-agent: *  # all\nCrawl-delay: 10\nDisallow: /x # no\n",
        "bot", "/x",
    )
    g, sitemaps = parse_robots_py(RULES)
    assert sitemaps == ["https://e.com/sitemap.xml"]
    assert len(g) == 2


def test_robots_allowed_spark_column(spark):
    from pyspark.sql import functions as F

    from tableone_pyspark_spark.functions.robots import robots_allowed

    rows = [
        (1, RULES, "/tmp/file"),
        (2, RULES, "/tmp/readme"),
        (3, None, "/anything"),
        (4, RULES, None),  # NULL path probes "/"
    ]
    df = spark.createDataFrame(rows, "id long, robots string, path string")
    got = {
        r["id"]: r["ok"]
        for r in df.select(
            "id",
            robots_allowed(F.col("robots"), "otherbot", F.col("path")).alias("ok"),
        ).collect()
    }
    assert got == {1: False, 2: True, 3: True, 4: True}


def test_self_review_r9_regressions():
    """The three verdict-flipping defects the r9 self-review caught."""
    a = robots_allowed_py
    # anchored last segment pins to END of path, not first occurrence
    r = "User-agent: *\nDisallow: /*.pdf$"
    assert not a(r, "x", "/a.pdf.pdf")
    assert not a(r, "x", "/a.pdf")
    assert a(r, "x", "/a.pdf?download=1")
    # middles must not overrun the anchored tail
    r2 = "User-agent: *\nDisallow: /a*b$"
    assert not a(r2, "x", "/aXb")
    assert a(r2, "x", "/aXbY")
    assert a(r2, "x", "/ab_then_b_elsewhere")  # ...no trailing b
    # an empty User-agent token must not hijack every crawler
    hijack = "User-agent:\nDisallow: /\n\nUser-agent: *\nAllow: /\n"
    assert a(hijack, "somebot", "/x")


def test_advice_r9_anchored_patterns_match_from_path_start():
    """ADVICE r10 fix: a $-anchored pattern with no '*' is pinned to
    BOTH ends of the path — endswith alone let 'Allow: /index.html$'
    outrank 'Disallow: /private/' on /private/index.html (a
    compliance break), and anchored Disallows over-matched."""
    a = robots_allowed_py
    r = "User-agent: *\nDisallow: /private/\nAllow: /index.html$\n"
    assert not a(r, "x", "/private/index.html")
    assert a(r, "x", "/index.html")
    r2 = "User-agent: *\nDisallow: /private$\n"
    assert a(r2, "x", "/x/private")   # must match from path start
    assert not a(r2, "x", "/private")
    assert a(r2, "x", "/privateX")    # and still pin the end
    # anchored + wildcard: first segment stays start-anchored too
    r3 = "User-agent: *\nDisallow: /a*.pdf$\n"
    assert a(r3, "x", "/b/a.pdf")     # '/a' not at path start
    assert not a(r3, "x", "/a/x.pdf")
