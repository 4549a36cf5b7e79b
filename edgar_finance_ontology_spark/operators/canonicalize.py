"""Canonicalization: connected components by iterative label
propagation (GraphFrames-style) on an edge DataFrame.

north_rule: "canonicalization via connected-components (label
propagation on a salted edge DataFrame)". The reference dedups
entities by exact CIK key (select_xbrl_tags.py:149-164); at web scale
identity edges come from coreference / alias matches, so equality
closes over a graph.

Algorithm (large-star-ish min-label propagation):
  label(v) := v
  repeat: label(v) := min(label(v), min over neighbors of label(u))
  until no label changes.

Physical notes:
  * edges are symmetrized once; each iteration is one join + one
    groupBy(min) — two shuffles on the same key, AQE-coalesced;
  * head-entity skew: the join key is salted (`salt_buckets` splits a
    hot vertex's adjacency across buckets; the min-aggregation runs
    two-phase: per-(vertex, salt) partial min, then per-vertex final);
  * lineage is cut every `checkpoint_every` iterations (default: every
    iteration) via localCheckpoint: the convergence check is an ACTION,
    so without truncation each check re-derives every prior iteration —
    quadratic total work. With eager per-iteration materialization each
    check executes exactly one iteration's joins;
  * convergence is O(log L) for a path of length L: each round does the
    neighbor-min propagation AND a pointer-jumping step
    (label(v) := label(label(v)), the large-star/small-star doubling
    idea) so labels hop exponentially toward the component minimum —
    without the jump, a 10^6-long alias chain would need 10^6 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_every: int = 1,
    salt_buckets: int = 8,
    jump_after: int = 2,
) -> DataFrame:
    """-> (id, component) where component = min vertex id reachable.

    Vertex ids must be orderable (string or numeric).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("a") != F.col("b"))
    )
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))) \
           .distinct().cache()

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )

    for it in range(max_iter):
        # propagate: candidate label for b = label(a) over each edge,
        # salted two-phase min to keep hot vertices off one reducer
        cand = (
            sym.join(labels.withColumnRenamed("id", "a"), "a")
            .select(F.col("b").alias("id"), "component")
        )
        salted = cand.withColumn(
            "salt", F.pmod(F.crc32(F.col("component").cast("string")),
                           F.lit(salt_buckets))
        )
        partial = salted.groupBy("id", "salt").agg(
            F.min("component").alias("component")
        )
        incoming = partial.groupBy("id").agg(
            F.min("component").alias("new_component")
        )
        nxt = (
            labels.join(incoming, "id", "left")
            .select(
                "id",
                F.col("component").alias("_old"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("new_component"), F.col("component")),
                ).alias("component"),
            )
        )
        # pointer jumping (doubling): component := component's component.
        # label(v) is reachable from v and label(label(v)) from label(v),
        # so the jump stays within the component while halving the
        # remaining chain depth -> O(log L) total rounds. Adaptive: the
        # jump join only runs once plain propagation hasn't converged
        # in `jump_after` rounds (shallow alias graphs — the common
        # case — never pay for it; long chains get the doubling).
        if it >= jump_after:
            parents = nxt.select(
                F.col("id").alias("component"),
                F.col("component").alias("grand"),
            )
            nxt = (
                nxt.join(parents, "component", "left")
                .select(
                    "id",
                    "_old",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("grand"), F.col("component")),
                    ).alias("component"),
                )
            )
        if (it + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        # labels only ever decrease, so convergence = no row shrank.
        # The check scans the just-materialized frame — no join, no
        # recompute (the old label rides along as _old).
        changed = nxt.where(F.col("component") < F.col("_old")).limit(1).count()
        labels = nxt.drop("_old")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    return labels


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
