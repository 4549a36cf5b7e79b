"""Canonicalization: connected components by the alternating
large-star / small-star algorithm (Kiveris et al. 2014, "Connected
Components in MapReduce and Beyond") on an edge DataFrame.

north_rule: "canonicalization via connected-components (label
propagation on a salted edge DataFrame)". The reference dedups
entities by exact CIK key (select_xbrl_tags.py:149-164); at web scale
identity edges come from coreference / alias matches, so equality
closes over a graph.

Why alternating stars and not min-label propagation + pointer
jumping: propagation spreads the component minimum along the GRAPH
TOPOLOGY, and a per-round pointer jump only shortcuts the pointer
forest — when vertex ids are placed randomly on the topology (the
real case: content-hash doc ids on a similarity graph) the forest is
naturally shallow and the jump buys a constant factor, leaving
O(diameter) rounds (measured: a 250-vertex chain with shuffled ids
needed >22 rounds; the sf0.1 near-dup graph needed 20). The star
operations instead rewrite the EDGE SET so every round contracts
entire neighborhoods toward their minima — O(log^2 n) rounds proven,
independent of id placement (measured: the same graphs converge in
4-6 rounds).

One round = large-star then small-star, where for each vertex u with
neighborhood N(u) and m = min(N(u) ∪ {u}):
  * large-star  (undirected N): replace each edge (u,v), v > u with
    (v, m) — strictly-larger neighbors re-attach to the minimum;
  * small-star  (directed hi→lo N): replace edges to the ≤-side with
    (v, m) for v ∈ N(u)∪{u} − {m} — the small side collapses to a
    star.
Both preserve connectivity and never grow the edge count; the
fixpoint is a star forest rooted at each component's minimum id.

Physical notes:
  * every round is groupBy(min) + equi-join + distinct per star op,
    AQE-coalesced; the edge set is localCheckpoint'ed each round
    (`checkpoint_every`) so the convergence check re-executes nothing;
  * head-entity skew: the per-vertex min is two-phase via Spark's
    map-side combine (min is algebraic — each map partition emits one
    row per key, so a hub's final fan-in is bounded by partition
    count, not degree; an explicit salted pre-shuffle is available
    via `salt_buckets` but measured strictly slower, see
    _min_neighbor); the hub join relies on AQE skew split, and
    large-star itself is the structural defense — a hub's adjacency
    re-attaches to its minimum without any reducer holding the full
    neighbor list past the round;
  * convergence is detected by an edge-set signature (count +
    sum(xxhash64(u,v)) + sum(xxhash64(v,u))): equal signatures across
    a round ⇒ the monotone rewrite reached its fixpoint (the rewrite
    can only converge by literal set equality, which the paired
    asymmetric hash sums witness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _min_neighbor(sym: DataFrame, salt_buckets: int) -> DataFrame:
    """(u, m) where m = min over sym's v per u.

    min is ALGEBRAIC, so Spark's map-side combine is already the
    two-phase aggregation: each map partition emits at most one row
    per key, bounding a 10^9-degree hub's final-shuffle fan-in by the
    partition count, not its degree. An explicit salted pre-shuffle
    (`salt_buckets` > 1) adds a second exchange for a benefit the
    combine already provides — measured strictly slower on the sf0.1
    near-dup graph (15.0s vs 13.2s cold) — so the default is the
    plain path; the salted route stays for holistic-agg descendants
    and for callers that want the exchange anyway."""
    if salt_buckets > 1:
        salted = sym.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("v")), F.lit(salt_buckets))
        )
        partial = salted.groupBy("u", "_salt").agg(F.min("v").alias("v"))
        return partial.groupBy("u").agg(F.min("v").alias("m"))
    return sym.groupBy("u").agg(F.min("v").alias("m"))


def _signature(e: DataFrame) -> tuple:
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal sums: ANSI-safe (a long sum of 64-bit hashes overflows)
        F.sum(F.xxhash64("u", "v").cast("decimal(20,0)")).alias("h_uv"),
        F.sum(F.xxhash64("v", "u").cast("decimal(20,0)")).alias("h_vu"),
    ).collect()[0]
    return (row["n"], row["h_uv"], row["h_vu"])


def _driver_union_find(e: DataFrame) -> DataFrame:
    """Exact solve of a SMALL (≤ driver_cap, caller-enforced) edge set
    on the driver: min-id union-find with path compression. Returns
    the same (id, component = min reachable id) frame as the
    distributed kernel — the routing is a physical choice only."""
    rows = e.collect()
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        ra, rb = find(r["u"]), find(r["v"])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    out = sorted({v for r in rows for v in (r["u"], r["v"])})
    typ = e.schema["u"].dataType
    from pyspark.sql.types import StructField, StructType

    schema = StructType([StructField("id", typ, False),
                         StructField("component", typ, False)])
    return e.sparkSession.createDataFrame(
        [(v, find(v)) for v in out], schema
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_every: int = 1,
    salt_buckets: int = 1,
    verify_forest: bool = False,
    driver_cap: int = 100_000,
) -> DataFrame:
    """-> (id, component) where component = min vertex id reachable.

    Vertex ids must be orderable (string or numeric).

    `verify_forest` adds one deterministic post-convergence check (a
    semi-join) asserting the fixpoint really is a two-level star
    forest — no label appears on both sides of an edge. The signature
    convergence test is probabilistic (hash-sum equality); this turns
    a silent collision into a loud error for callers that want the
    guarantee at the cost of one extra job.

    `driver_cap`: edge sets at or below this row count are solved by
    an exact driver-side union-find instead of the iterative star
    rounds — the same explicit smaller-than-this-is-local routing as a
    broadcast-join threshold, and the same result bit-for-bit. A
    near-dup pair graph is usually TINY relative to its corpus (the
    df-cap/banding pruning upstream exists to make it so); the star
    loop costs ~4 jobs × ~5 rounds of scheduler latency regardless of
    data size, which dominates end-to-end wall below ~10^5 edges
    (measured: 258-edge sf0.1 graph, 3.5s loop vs 0.1s solve). Set 0
    to force the distributed kernel.
    """
    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("a") != F.col("b"))
    )
    # canonical directed hi→lo edge set (u > v invariant, held by both
    # star rewrites below). Checkpointed FIRST so the (possibly very
    # expensive) upstream edge plan — e.g. a pair-similarity join —
    # executes exactly once; the vertex set derives from the
    # materialized edges, not from a second upstream execution.
    e = (
        raw.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    if e.count() <= driver_cap:
        return _driver_union_find(e)
    verts = (
        e.select(F.col("u").alias("id"))
        .unionByName(e.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sig = _signature(e)

    for it in range(max_iter):
        # ---- large-star: undirected adjacency; (u,v), v>u → (v, m(u))
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = _min_neighbor(sym, salt_buckets)
        mm = m.select("u", F.least("u", "m").alias("m"))
        e = (
            sym.join(mm, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # ---- small-star: directed hi→lo adjacency; per u attach
        # N(u) ∪ {u} − {m} to m = min(N(u))
        m2 = _min_neighbor(e, salt_buckets)
        e = (
            e.join(m2, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m2.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        if (it + 1) % checkpoint_every == 0:
            e = e.localCheckpoint(eager=True)
        new_sig = _signature(e)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    # fixpoint e is a star forest (v → component root); roots and
    # edge-isolated vertices label themselves
    if verify_forest:
        non_roots = e.select("u")
        deep = e.join(
            non_roots.withColumnRenamed("u", "v"), "v", "left_semi"
        ).limit(1).count()
        if deep:
            raise RuntimeError(
                "connected_components: signature convergence fired on a "
                "non-star edge set (hash collision) — rerun or raise "
                "max_iter"
            )
    return verts.join(
        e.select(F.col("u").alias("id"), F.col("v").alias("root")), "id", "left"
    ).select("id", F.coalesce("root", "id").alias("component"))


def duplicate_clusters(pair_df: DataFrame, id_a: str = "id_a",
                       id_b: str = "id_b") -> DataFrame:
    """Near-duplicate doc clusters from a similarity pair list:
    (id, cluster_id) with cluster_id = min doc id in the component.
    Singletons (docs without pairs) are not emitted."""
    return connected_components(pair_df, src=id_a, dst=id_b).select(
        F.col("id"), F.col("component").alias("cluster_id")
    )


def dedup_keep_best(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", threshold: float = 0.12,
                    max_df: int | None = 64) -> DataFrame:
    """The SELECTION POLICY on top of canonicalization: per
    multi-member near-dup cluster, keep the best-quality
    representative (quality score desc, lowest id as the
    deterministic tie-break — quality is 2dp-quantized, so ties are
    common and the tie-break is load-bearing).

    Returns (cluster_id, kept_id, kept_quality, n_members) for
    clusters with >1 member — the drop set is every other member, and
    singletons are implicitly kept. Composition: n-gram-Jaccard pair
    graph (df-capped) -> connected components -> broadcast-join to
    per-doc quality -> per-cluster argmax window. The only shuffle
    beyond the cluster machinery is the per-cluster window, keyed by
    cluster_id (bounded groups — a cluster is a near-dup set, not a
    corpus partition)."""
    from pyspark.sql import Window

    from .dedup import ngram_jaccard_pairs
    from .textops import quality_scores

    pairs = ngram_jaccard_pairs(docs, threshold=threshold, max_df=max_df)
    clusters = duplicate_clusters(pairs)
    q = quality_scores(docs).select("id", "quality")
    # INNER join: only near-dup members enter the window — singletons
    # are implicitly kept and must not ride through a corpus-wide
    # shuffle just to be filtered at n_members > 1
    member = q.join(clusters, "id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("id").asc()
    )
    wc = Window.partitionBy("cluster_id")
    return (
        member.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(wc).cast("int"))
        .where((F.col("rn") == 1) & (F.col("n_members") > 1))
        .select(
            "cluster_id",
            F.col("id").alias("kept_id"),
            F.col("quality").alias("kept_quality"),
            "n_members",
        )
    )
