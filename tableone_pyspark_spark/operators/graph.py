"""Link-graph analytics for web-corpus curation — PageRank (Brin &
Page 1998; the Common-Crawl-style host/page authority signal quality
pipelines weight documents by), extending the graph family beyond
``dedup.connected_components``: extract links with
``html.html_extract``, canonicalize with ``url.canonical_url``, build
the (src, dst) edge list, and rank.

Power iteration with the standard dangling-mass redistribution:

    r'(v) = (1−d)/N + d·( Σ_{u→v} r(u)/outdeg(u) + D/N )

where D = Σ ranks of dangling vertices (no out-edges) — redistributed
uniformly so the ranks sum to EXACTLY 1 every iteration (mass
conservation is the operator's pinned invariant). Duplicate edges
carry multiplicity (a page linking twice contributes twice — the
multigraph convention); self-loops count like any edge.

Spark shapes, 100 TB story: the weighted edge list (src, dst,
1/outdeg) is built ONCE, repartitioned by src, and PERSISTED — cached
plans keep HashPartitioning(src), so every iteration's join reshuffles
only the vertex-sized rank frame, never the edge list (a
localCheckpoint would erase the partitioning: LogicalRDD reports
UnknownPartitioning, probed on 4.1). Each iteration is one join keyed
by src + one groupBy(dst) with map-side partial sums (vertex-sized
exchanges only), plus two SCALAR aggregates (dangling mass, and the
L1 delta when ``tol`` is set); iteration frames are localCheckpoint-ed
(the ``connected_components`` lineage discipline) and the superseded
round's blocks released (``plans.layout.release_checkpoint``).
Nothing driver-side scales with the graph: the driver sees only
scalars. Iterations are inherently sequential — PageRank at this
shape costs O(n_iter) vertex-frame shuffles on any engine (GraphX and
Pregel pay the same); convergence to web-precision takes ~20-50
rounds.

No counterpart in the reference repo; pytest-differential class (the
per-vertex float sums are order-sensitive at 1e-15 — pinned against
an exact python twin at 1e-9, mass conservation at 1e-12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tableone_pyspark_spark.plans.layout import release_checkpoint


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 20,
    tol: float | None = None,
) -> DataFrame:
    """(id, rank) for every vertex in the directed edge list; ranks
    sum to 1. Runs exactly ``n_iter`` power iterations, or stops early
    when the L1 delta drops below ``tol`` (one extra scalar aggregate
    per iteration). NULL endpoints are rejected (a NULL key would
    silently drop mass through the joins)."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if n_iter <= 0:
        raise ValueError(f"n_iter must be positive, got {n_iter}")
    if tol is not None and tol <= 0:
        raise ValueError(f"tol must be positive, got {tol}")
    # checkpoint the RAW edge selection once: the setup below reads it
    # several times (degree, weights, both vertex legs) — without this
    # an expensive upstream pipeline re-runs per read, and a
    # NON-DETERMINISTIC input would build `we` and `verts` from
    # different edge sets, silently breaking mass conservation (the
    # connected_components precedent; self-review r10)
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).localCheckpoint()
    if e.where(F.col("s").isNull() | F.col("t").isNull()).limit(1).count():
        release_checkpoint(e)
        raise ValueError("pagerank: NULL edge endpoints")
    # static per-edge weight 1/outdeg, built once; repartition by src
    # EXPLICITLY and PERSIST (not checkpoint: a LogicalRDD reports
    # UnknownPartitioning — probed on 4.1 — so a checkpointed edge
    # frame would be re-exchanged in EVERY iteration's join, O(n_iter)
    # edge-list shuffles; the cached plan keeps HashPartitioning(s)
    # and the per-iteration join reshuffles only the vertex-sized rank
    # side). Vertices = both endpoint sets (a dangling vertex appears
    # only as a destination).
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("od"))
    we = (
        e.join(deg, "s")
        .select("s", "t", (F.lit(1.0) / F.col("od")).alias("w"))
        .repartition("s")
        .persist()
    )
    we.count()  # materialize BEFORE freeing e: a released checkpoint
    # cannot recompute
    verts = (
        e.select(F.col("s").alias("id"))
        .union(e.select(F.col("t").alias("id")))
        .distinct()
        .join(deg.select(F.col("s").alias("id"), F.lit(True).alias("ln")), "id", "left")
        .select("id", F.col("ln").isNotNull().alias("linked"))
        .localCheckpoint()  # eager: materialized here
    )
    release_checkpoint(e)  # setup done; only we/verts ride the loop
    n = verts.count()
    if n == 0:
        we.unpersist()
        release_checkpoint(verts)
        raise ValueError("pagerank: empty edge list")
    r = verts.select("id", "linked", (F.lit(1.0) / n).alias("rank"))
    prev_ckpt: DataFrame | None = None  # each round is checkpointed —
    # release the superseded round or storage grows O(n_iter×vertices)
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        # dangling mass: ranks of vertices with no out-edges (scalar)
        dang = (
            r.where(~F.col("linked")).agg(F.sum("rank")).collect()[0][0]
            or 0.0
        )
        contrib = (
            we.join(r.select(F.col("id").alias("s"), "rank"), "s")
            .groupBy(F.col("t").alias("id"))
            .agg(F.sum(F.col("rank") * F.col("w")).alias("c"))
        )
        nxt = (
            verts.join(contrib, "id", "left")
            .select(
                "id",
                "linked",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dang / n))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        delta = None
        if tol is not None:
            delta = (
                nxt.select(F.col("id"), F.col("rank").alias("r2"))
                .join(r.select("id", F.col("rank").alias("r1")), "id")
                .agg(F.sum(F.abs(F.col("r2") - F.col("r1"))))
                .collect()[0][0]
            )
        if prev_ckpt is not None:
            release_checkpoint(prev_ckpt)
        prev_ckpt = r = nxt
        if delta is not None and delta < tol:
            break
    out = r.select("id", "rank")
    # the final checkpoint backs `out`; the loop inputs do not
    we.unpersist()
    release_checkpoint(verts)
    return out
