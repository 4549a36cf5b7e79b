"""Graph centrality over edge DataFrames — the iterative-algorithm
companion to the connected-components canonicalizer
(`operators/canonicalize.py`).

`pagerank_int` is PageRank with ALL arithmetic in scaled integers:
ranks live in `scale` units (default 10^6 per node of initial mass),
damping is an exact fraction (default 17/20 = 0.85), and each edge
contribution is one integer floor division. Why integers: double
PageRank is order-sensitive (float sums depend on reduction order, so
re-runs under different partitionings drift in the last ulps and
cross-engine replay is impossible); integer sums are associative, so
the result is bit-identical under any partitioning AND a DuckDB twin
can replay a fixed number of iterations exactly (unrolled CTEs).
The cost is floor truncation (< 1 unit per in-edge per iteration —
at scale=10^6, a ~10^-6-relative artifact), and truncated mass is
DROPPED, not redistributed: totals shrink slightly per iteration, the
same "sink loss" simplification some production systems take. Rank
ORDER, the thing consumers use, is unaffected at these magnitudes.

Dangling nodes (out-degree 0) likewise leak their mass rather than
teleporting it — callers over symmetric graphs (the near-dup use
case, and any undirected similarity graph) never have dangling nodes.

100-TB posture: the static (src, dst, out-degree) frame is built once
and cached; each iteration is ONE equi join (ranks ⋈ edges on src,
skew-salted by the caller pre-bucketing hot sources if needed) + ONE
map-side-combined sum by dst. Fixed `iters` keeps this a single
action over a bounded-depth plan — no per-iteration driver sync, no
convergence action (use more iterations instead: rank order
stabilizes in O(log N) rounds on power-law graphs). For very large
`iters`, cut lineage the way `connected_components` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_int(
    edges: DataFrame,
    iters: int = 5,
    scale: int = 1_000_000,
    damping_num: int = 17,
    damping_den: int = 20,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """-> (id, rank_units) after `iters` rounds; rank_units is a long
    in 1/`scale` units. r0 = scale for every node;
    r'(v) = floor(scale·(den−num)/den)
            + Σ over in-edges (u,v) of (num·r(u)) div (den·outdeg(u))."""
    # Materialize the (possibly expensive) edge derivation ONCE, then
    # derive the static frames from the materialized copy. Eager
    # localCheckpoint, not cache(): a cache pinned from inside a
    # plan-builder is never unpersisted (the caller can't reach it)
    # and leaks executor storage across calls; checkpoint blocks are
    # freed by the ContextCleaner when the returned plan is GC'd.
    # nodes and ed are ALSO checkpointed (cheap — they read e's
    # materialized blocks) because each appears `iters` times in the
    # final single-action DAG and Spark does not dedupe common
    # subplans: left lazy, the distinct/deg-join would re-run every
    # iteration.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    teleport = (scale * (damping_den - damping_num)) // damping_den
    ranks = nodes.withColumn("r", F.lit(int(scale)).cast("long"))
    for _ in range(iters):
        contrib = (
            ed.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(
                "dst",
                F.expr(f"({damping_num} * r) div ({damping_den} * deg)")
                .alias("c"),
            )
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(incoming.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                (F.lit(int(teleport)) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long").alias("r"),
            )
        )
    return ranks.select("id", F.col("r").alias("rank_units"))
