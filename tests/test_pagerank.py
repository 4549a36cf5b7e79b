"""Integer-exact PageRank (operators/graphs.py)."""

from __future__ import annotations

from edgar_finance_ontology_spark.operators.graphs import pagerank_int


def _pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["id"]: r["rank_units"]
            for r in pagerank_int(df, **kw).collect()}


def test_single_edge_one_round(spark):
    # A -> B, 1 iter: A keeps only teleport 150000; B gets teleport +
    # floor(17 * 10^6 / 20) = 1_000_000 exactly
    r = _pr(spark, [(1, 2)], iters=1)
    assert r == {1: 150_000, 2: 1_000_000}


def test_symmetric_triangle_is_stationary(spark):
    # undirected triangle: deg 2 everywhere; each node receives
    # 2 * floor(17e6/40) = 850_000, plus 150_000 teleport -> exactly
    # the initial mass, every iteration. The uniform vector is an
    # exact fixed point of the integer recurrence here.
    edges = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a != b]
    for it in (1, 3, 7):
        assert _pr(spark, edges, iters=it) == {1: 10**6, 2: 10**6, 3: 10**6}


def test_star_hub_outranks_leaves(spark):
    edges = []
    for leaf in range(2, 8):
        edges += [(1, leaf), (leaf, 1)]
    r = _pr(spark, edges, iters=5)
    assert all(r[1] > r[leaf] for leaf in range(2, 8))
    assert len(set(r[leaf] for leaf in range(2, 8))) == 1  # symmetry


def test_partition_invariance_bit_exact(spark):
    """The point of the integer contract: identical rank_units under
    any partitioning (double PageRank cannot promise this)."""
    edges = [(i, (i * 7) % 23) for i in range(200) if i != (i * 7) % 23]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {(r["id"], r["rank_units"])
         for r in pagerank_int(df.repartition(13), iters=4).collect()}
    b = {(r["id"], r["rank_units"])
         for r in pagerank_int(df.coalesce(1), iters=4).collect()}
    assert a == b


def test_pagerank_priors_flip_a_linking_tie(spark):
    """End-to-end tie-in with link_mentions: two entities share a
    surface form and have identical context cosine (same profile
    text); the one that is central in the alias graph must win."""
    from pyspark.sql import functions as F

    from edgar_finance_ontology_spark.operators.linking import (
        link_mentions, pagerank_priors,
    )

    # entity 10 is the hub of the alias graph; entity 20 is peripheral
    edges = [(10, n) for n in (30, 40, 50, 60)] + [(20, 30)]
    priors = pagerank_priors(
        spark.createDataFrame(edges, "src long, dst long"))
    p = {r["entity_id"]: r["prior"] for r in priors.collect()}
    assert p[10] == 1.0 and p[20] < p[10]

    mentions = spark.createDataFrame(
        [(1, "alpha systems reported revenue", "alpha systems")],
        "mention_id long, context_text string, surface string")
    profiles = spark.createDataFrame(
        [(10, "alpha systems reported revenue"),
         (20, "alpha systems reported revenue")],
        "entity_id long, profile_text string")
    cands = spark.createDataFrame(
        [("alpha systems", 10), ("alpha systems", 20)],
        "surface string, entity_id long").join(
        F.broadcast(priors), "entity_id").select(
        "surface", "entity_id", "prior")
    out = link_mentions(mentions, profiles, cands).orderBy("rank").collect()
    assert out[0]["entity_id"] == 10 and out[0]["rank"] == 1
