"""Optimizer fence: force a computed column to be evaluated once.

Catalyst's ``PushPredicateThroughNonJoin`` pushes a filter through a
Project by SUBSTITUTING aliases — so a pattern like

    df.withColumn("q", expensive_expr).where(f(col("q"))).select("q")

optimizes to a Filter containing a full copy of ``expensive_expr``
below a Project containing a second full copy: the expression runs
twice per surviving row. Whole-stage codegen's subexpression
elimination works within one operator, not across Filter and Project,
so the duplication is real work (measured 2x the regex stack of
``quality_score`` in ``weighted_sample``).

``once(c)`` is a semantically-identity wrapper that is non-foldable
and non-deterministic (``c + rand()*0.0``), which makes the Project
field ineligible for alias substitution: the filter above keeps
referencing the attribute, and the expression is evaluated exactly
once in the lower Project. Notes:

* ``rand()*0.0`` is exactly ``+0.0`` (rand is finite in [0,1)), and
  ``x + 0.0 == x`` for every double except ``-0.0`` (which becomes
  ``+0.0``) — acceptable for scores/weights; don't fence a column
  whose ``-0.0`` sign bit matters.
* The wrapper casts to double; fence numeric columns only.
* A simple ``when(lit(False), rand()).otherwise(c)`` does NOT work:
  SimplifyConditionals strips literal-false branches before pushdown,
  restoring determinism. The additive form survives because Catalyst
  (deliberately) has no ``x + 0.0`` elimination for floats.

Cost: one xorshift per row — noise next to any expression worth
fencing. At scale this matters doubly: the duplicated expression also
inflates the codegen'd stage and the filter's cost on NON-surviving
rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def once(c: Column) -> Column:
    """Identity on doubles, opaque to predicate-pushdown alias
    substitution — the computed column is evaluated exactly once."""
    return c.cast("double") + F.rand() * F.lit(0.0)


def once_long(c: Column) -> Column:
    """Integer-safe :func:`once`: identity on integral columns via
    ``c + cast(rand()*0.0 as long)`` — the addend is exactly ``0L``
    (rand is finite in [0,1), so ``rand()*0.0`` is ``+0.0`` and the
    long cast is ``0``) but the expression stays non-deterministic, so
    ``PushPredicateThroughNonJoin`` refuses to substitute the alias.
    No ``-0.0`` caveat here: long addition by zero is exact identity.

    This is the fence for CHAINED projections (e.g. the Hilbert index,
    ``sources/io.py hilbert_frame``): a filter on the chain's output
    would otherwise be pushed through every stage, each substitution
    re-inlining the previous stage's subtrees — an exponential
    expression blowup that OOMs the driver (r15 verdict, verified at
    1 g and 8 g heaps). Fencing the final column blocks the descent at
    the top Project, so the whole chain stays attribute-referenced."""
    return c.cast("long") + (F.rand() * F.lit(0.0)).cast("long")
