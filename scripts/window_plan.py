#!/usr/bin/env python
"""Grading-window planner.

The driver's correctness gate grades only the FIRST 50 entries of
``__spark_entry__.queries()`` per round, so the window must rotate:
never-graded queries first, then the stalest previously-green ones,
keeping anything whose code changed since its last grade inside.

This script reads every ``CORRECTNESS_r*.json`` plus the current
``queries()`` definition order and prints, per query: last graded
round, last result, and staleness — then a suggested 50-entry front
(never-graded first, then by staleness). The suggestion is a starting
point; queries touched by the current round's code changes should be
kept in-window regardless (the script cannot know the diff).

Usage: python scripts/window_plan.py [--window 50]
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(window: int = 50) -> None:
    import __spark_entry__ as e

    order = list(e.queries().keys())
    history: dict[str, tuple[int, bool]] = {}  # name -> (round, green)
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        for name, row in json.load(open(path)).items():
            green = bool(
                row.get("hash_match")
                or (row.get("rows_match") and row.get("hash_match") is None)
            )
            history[name] = (rnd, green)

    latest = max((r for r, _ in history.values()), default=0)
    never = [q for q in order if q not in history]
    red = [q for q in order if q in history and not history[q][1]]
    graded = sorted(
        (q for q in order if q in history and history[q][1]),
        key=lambda q: history[q][0],  # stalest (oldest round) first
    )

    print(f"queries: {len(order)}  graded-ever: {len(history)}  "
          f"never: {len(never)}  red-last-grade: {len(red)}")
    for q in order:
        rnd, green = history.get(q, (None, None))
        tag = "NEVER" if rnd is None else ("RED" if not green else f"r{rnd}")
        stale = "" if rnd is None else f" (stale {latest - rnd})"
        print(f"  {q:28s} {tag}{stale}")

    suggestion = (never + red + graded)[:window]
    print(f"\nsuggested _front ({len(suggestion)}):")
    for q in suggestion:
        print(f'        "{q}",')


if __name__ == "__main__":
    w = 50
    if "--window" in sys.argv:
        w = int(sys.argv[sys.argv.index("--window") + 1])
    main(w)
