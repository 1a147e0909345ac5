"""robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol) —
the politeness side of the crawl toolkit: a frontier joins each
candidate URL against its host's robots rules before fetching, and a
corpus audit re-checks stored pages against the rules that governed
them.

Implemented semantics (each a spec rule):

  * groups = consecutive ``User-agent`` lines followed by rules; the
    evaluating crawler picks the group(s) whose agent token is the
    LONGEST case-insensitive substring-token match of its product
    token, falling back to ``*``; ALL matching groups' rules combine
    (RFC 9309 §2.2.1);
  * path patterns support ``*`` (any octets) and a final ``$``
    (end anchor); matching is longest-PATTERN-wins, and on a tie the
    least restrictive (Allow) wins (§2.2.2);
  * an empty ``Disallow:`` value disallows nothing; unmatched paths
    default to allowed; an unparseable or empty robots.txt allows
    everything (the fail-open convention §2.3.1.3 for unavailable
    rules — a MISSING robots file means no restrictions);
  * ``Sitemap:`` lines collect verbatim (they are global, not
    per-group); unknown fields are ignored; ``#`` comments strip.

NOT implemented, documented: percent-encoding normalization of rule
paths (pair with ``functions/url.canonical_url`` which deliberately
leaves encoding alone) and the 500 KiB size cap with its
must-process-first-512-KiB nuance (callers truncate upstream).

Shape: rules are per-HOST artifacts (KBs) — parse once, broadcast,
then ``robots_allowed`` is a row-local projection over the frontier.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def _match_len(pattern: str, path: str) -> int | None:
    """Octet length of ``pattern`` if it matches ``path`` per RFC 9309
    (prefix match, ``*`` wildcards, final ``$`` anchors), else None.

    Anchored patterns pin their LAST literal segment to end-of-path
    (self-review r9: greedy-leftmost placement of the last segment
    broke ``/*.pdf$`` against ``/a.pdf.pdf`` — the earlier occurrence
    matched, the anchor check failed, and a disallowed URL slipped
    through). Greedy-leftmost placement of the MIDDLE segments is the
    standard wildcard-existence argument and stays."""
    anchored = pattern.endswith("$")
    pat = pattern[:-1] if anchored else pattern
    segs = pat.split("*")

    # Greedy-leftmost walk over every segment EXCEPT an anchored
    # tail; the FIRST segment is always pinned to the start of the
    # path (RFC 9309: patterns match from the beginning — ADVICE r9:
    # skipping this check for single-segment anchored patterns let
    # 'Allow: /index.html$' match '/private/index.html').
    walk = segs[:-1] if anchored else segs
    pos = 0
    for idx, seg in enumerate(walk):
        if idx == 0:
            if not path.startswith(seg):
                return None
            pos = len(seg)
            continue
        nxt = path.find(seg, pos)
        if nxt < 0:
            return None
        pos = nxt + len(seg)
    if anchored:
        last = segs[-1]
        if len(segs) == 1:
            # no '*': the whole pattern is pinned to BOTH ends
            if path != last:
                return None
        else:
            if not path.endswith(last):
                return None
            if len(path) - len(last) < pos:
                return None  # middles overran the anchored tail
    return len(pattern)


def parse_robots_py(text: str | None):
    """(groups, sitemaps): groups is a list of (agent_tokens,
    rules) with rules = [(is_allow, pattern), ...] in file order.
    Never raises — garbage lines are ignored (§2.2.4: crawlers MUST
    be tolerant); None input parses as empty (allow everything)."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    sitemaps: list[str] = []
    if text is None:
        return groups, sitemaps
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    collecting_agents = False

    def flush():
        nonlocal agents, rules
        if agents:
            groups.append((agents, rules))
        agents, rules = [], []

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        sep = line.find(":")
        if sep <= 0:
            continue  # tolerant: not a field line
        field = line[:sep].strip().lower()
        value = line[sep + 1 :].strip()
        if field == "user-agent":
            if not collecting_agents:
                flush()
                collecting_agents = True
            if value:  # an empty token would substring-match EVERY
                agents.append(value.lower())  # crawler (self-review r9)
        elif field in ("allow", "disallow"):
            collecting_agents = False
            if agents:  # rules before any User-agent line are ignored
                if field == "disallow" and value == "":
                    continue  # empty Disallow: disallows nothing
                if value:
                    rules.append((field == "allow", value))
        elif field == "sitemap":
            collecting_agents = False
            if value:
                sitemaps.append(value)
        else:
            collecting_agents = False  # unknown field ends a UA run
    flush()
    return groups, sitemaps


@lru_cache(maxsize=512)
def _chosen_rules(
    text: str | None, ua: str
) -> tuple[tuple[bool, str], ...]:
    """The combined rule list governing ``ua`` — cached on the
    (robots text, agent) VALUE, because a frontier join repeats the
    identical per-host text across millions of rows and re-parsing
    per row would multiply the kernel cost by rows-per-host
    (self-review r9)."""
    groups, _ = parse_robots_py(text)
    if not groups:
        return ()
    # longest agent token that is a substring of the product token
    best_len = -1
    for agents, _rules in groups:
        for a in agents:
            if a != "*" and a in ua and len(a) > best_len:
                best_len = len(a)
    chosen: list[tuple[bool, str]] = []
    for agents, rules in groups:
        sel = (
            any(a != "*" and a in ua and len(a) == best_len for a in agents)
            if best_len >= 0
            else "*" in agents
        )
        if sel:
            chosen.extend(rules)  # ALL matching groups combine
    return tuple(chosen)


def robots_allowed_py(
    text: str | None, user_agent: str, path: str
) -> bool:
    """May ``user_agent`` fetch ``path`` under this robots.txt?
    Fail-open on empty/garbage rules (a missing file restricts
    nothing); group selection and longest-match per RFC 9309."""
    chosen = _chosen_rules(text, user_agent.lower())
    if not chosen:
        return True
    verdict = True
    best = -1
    for is_allow, pattern in chosen:
        ml = _match_len(pattern, path)
        if ml is None:
            continue
        if ml > best or (ml == best and is_allow and not verdict):
            # longest pattern wins; Allow wins exact ties (§2.2.2)
            if ml > best:
                verdict = is_allow
                best = ml
            else:
                verdict = True
    return verdict


def robots_allowed(
    robots_col: Column, user_agent: str, path_col: Column
) -> Column:
    """Row-local verdict column: (robots_text, path) → boolean for a
    fixed crawler token — join the per-host robots artifact onto the
    frontier (broadcast; it is KB-scale per host) and project."""
    ua = user_agent

    @F.pandas_udf("boolean")
    def kernel(txt: pd.Series, path: pd.Series) -> pd.Series:
        return pd.Series(
            [
                robots_allowed_py(t, ua, p if p is not None else "/")
                for t, p in zip(txt, path)
            ]
        )

    return kernel(robots_col, path_col)
