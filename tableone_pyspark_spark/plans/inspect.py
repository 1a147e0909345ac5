"""Physical-plan inspection utilities.

A 100 TB engine lives or dies by its plans, not its unit tests: a
filter that stops reaching the parquet scan, a broadcast that silently
becomes a sort-merge join, or an extra exchange are all correctness-
preserving regressions that only show up at scale. These helpers turn
`df.explain` into assertable facts so `tests/test_plans.py` can pin
the plan shapes the engine promises:

  * scans read ONLY the projected columns (column pruning),
  * predicates are pushed into the scan (`PushedFilters`),
  * dimension joins broadcast,
  * operator pipelines have the expected exchange (shuffle) count.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final physical plan string (after AQE re-planning if triggered)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


@dataclass(frozen=True)
class PlanFacts:
    n_exchanges: int
    n_broadcast_joins: int
    n_sortmerge_joins: int
    n_shuffled_hash_joins: int
    scan_schemas: tuple[str, ...]  # ReadSchema of every parquet scan
    pushed_filters: tuple[str, ...]


def plan_facts(df: DataFrame) -> PlanFacts:
    plan = formatted_plan(df)
    # count operators on the executed plan string (AQE-final)
    exe = executed_plan(df)
    return PlanFacts(
        n_exchanges=len(re.findall(r"\bExchange\b", exe)),
        n_broadcast_joins=len(re.findall(r"\bBroadcastHashJoin\b", exe)),
        n_sortmerge_joins=len(re.findall(r"\bSortMergeJoin\b", exe)),
        n_shuffled_hash_joins=len(re.findall(r"\bShuffledHashJoin\b", exe)),
        scan_schemas=tuple(re.findall(r"ReadSchema: (struct<[^\n]*>)", plan)),
        pushed_filters=tuple(re.findall(r"PushedFilters: \[([^\]]*)\]", plan)),
    )


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Column set of each parquet scan in the plan — the ground truth
    for 'did pruning work'."""
    out = []
    for schema in plan_facts(df).scan_schemas:
        cols = re.findall(r"([A-Za-z_][A-Za-z0-9_]*):", schema)
        out.append(set(cols))
    return out


def assert_scan_pruned(df: DataFrame, allowed: set[str]) -> None:
    """Raise if any parquet scan reads a column outside ``allowed``."""
    for cols in scan_columns(df):
        extra = cols - allowed
        if extra:
            raise AssertionError(
                f"scan reads unprojected columns {sorted(extra)} "
                f"(allowed: {sorted(allowed)})"
            )
