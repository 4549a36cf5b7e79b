"""Connected components + entity linking tests."""

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _expected_components(edges):
    """tiny pure-Python union-find as the oracle."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {v: find(v) for v in list(parent)}


def test_connected_components_basic_and_skewed(spark):
    from edgar_finance_ontology_spark.operators.canonicalize import (
        connected_components,
    )

    # two chains, one star (hub 100 with 40 spokes = head-entity skew),
    # one singleton pair
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (12, 11)]
    edges += [(100, 200 + i) for i in range(40)]
    edges += [(500, 501)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r["id"]: r["component"]
        for r in connected_components(df, salt_buckets=4, driver_cap=0).collect()
    }
    exp = _expected_components(edges)
    assert got == exp


def test_connected_components_long_chain_converges_in_log_rounds(spark):
    """The alternating-star kernel must converge in O(log^2 L) rounds:
    a 64-edge chain within 9 rounds (plain min-propagation needs 64)."""
    from edgar_finance_ontology_spark.operators.canonicalize import (
        connected_components,
    )

    edges = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = connected_components(df, max_iter=9, driver_cap=0)
    assert got.select("component").distinct().count() == 1
    assert got.agg(F.min("component")).collect()[0][0] == 0
    assert got.count() == 65


def test_connected_components_shuffled_id_chain(spark):
    """Regression: ids placed RANDOMLY on the topology (content-hash
    doc ids on a similarity graph — the real case). The old min-label
    + single-pointer-jump kernel was O(diameter) here (>22 rounds on
    this graph, 20 on the sf0.1 near-dup graph); the alternating-star
    kernel must stay logarithmic AND agree with union-find."""
    import random

    from edgar_finance_ontology_spark.operators.canonicalize import (
        connected_components,
    )

    rng = random.Random(42)
    n = 120
    perm = list(range(n))
    rng.shuffle(perm)
    edges = [(f"v{perm[i]:04d}", f"v{perm[i + 1]:04d}") for i in range(n - 1)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["id"]: r["component"]
        for r in connected_components(df, max_iter=10, driver_cap=0).collect()
    }
    exp = _expected_components(edges)
    assert got == exp


def test_link_mentions_tfidf_prior(spark):
    from edgar_finance_ontology_spark.operators.linking import link_mentions

    mentions = spark.createDataFrame(
        [
            ("m1", "quarterly revenue guidance cloud software earnings", "acme"),
            ("m2", "fruit orchard harvest apples farming", "acme"),
        ],
        "mention_id string, context_text string, surface string",
    )
    entities = spark.createDataFrame(
        [
            ("E_TECH", "cloud software revenue earnings platform"),
            ("E_FARM", "orchard apples farming harvest fruit"),
        ],
        "entity_id string, profile_text string",
    )
    candidates = spark.createDataFrame(
        [("acme", "E_TECH", 0.6), ("acme", "E_FARM", 0.4)],
        "surface string, entity_id string, prior double",
    )
    out = link_mentions(mentions, entities, candidates, alpha=0.7)
    best = {
        r["mention_id"]: r["entity_id"]
        for r in out.where("rank = 1").collect()
    }
    # context must override the prior for m2
    assert best == {"m1": "E_TECH", "m2": "E_FARM"}


def test_doc_dup_clusters_vs_duckdb(spark):
    import sys
    sys.path.insert(0, "tests")
    from oracle_harness import compare, duck_connection

    from edgar_finance_ontology_spark.queries import QUERIES

    fn, sql = QUERIES["doc_dup_clusters"]
    con = duck_connection("/root/testdata/sf0.001")
    r = compare(fn(spark, "/root/testdata/sf0.001"), con, sql)
    assert r["match"], r


def test_predicate_classification_schema_driven(spark):
    """North-star stage: pairwise predicate classification against the
    ontology property schema — candidates gated by domain/range type
    compatibility, scored by ontology-derived lexical triggers."""
    from edgar_finance_ontology_spark.operators.linking import (
        classify_predicates, predicate_schema_df,
    )

    schema = predicate_schema_df(spark)
    # the schema itself is the ontology's object-property table
    assert schema.count() >= 8
    pairs = spark.createDataFrame(
        [
            # Company -> Sector with 'sector' cue: inSector must win
            ("p1", "efin:Company", "efin:Sector",
             "the company operates in the information technology sector"),
            # Industry -> Sector: only inSectorOf is type-compatible
            ("p2", "efin:Industry", "efin:Sector",
             "software industry belongs in the it sector"),
            # Observation -> Metric with 'metric' cue
            ("p3", "efin:MetricObservation", "efin:Metric",
             "this observation observes the revenue metric"),
            # type-incompatible pair: no candidate at all
            ("p4", "efin:Sector", "efin:Metric",
             "sector text mentioning metric words"),
        ],
        "pair_id string, subj_class string, obj_class string, "
        "evidence_text string",
    )
    got = classify_predicates(pairs, schema)
    best = {r["pair_id"]: r["pred"] for r in got.where("rank = 1").collect()}
    assert best["p1"] == "inSector"
    assert best["p2"] == "inSectorOf"
    assert best["p3"] == "observesMetric"
    assert "p4" not in best  # domain/range gate: no fabricated relation
    # every candidate ever produced respects the type gate
    joined = got.join(
        spark.createDataFrame(
            [("p1", "efin:Company", "efin:Sector")],
            "pair_id string, sc string, oc string"), "pair_id")
    sch = {(r["pred"], r["domain_class"], r["range_class"])
           for r in predicate_schema_df(spark).collect()}
    for r in joined.collect():
        assert any(p == r["pred"] and d == "efin:Company"
                   and g == "efin:Sector" for p, d, g in sch)


def test_connected_components_random_graph_fuzz(spark):
    """Seeded random-graph sweep vs the union-find oracle, with the
    deterministic star-forest post-check on (verify_forest=True):
    sparse Erdos-Renyi, hubby preferential-attachment, and a
    chains+stars mix, across string and int id types."""
    import random

    from edgar_finance_ontology_spark.operators.canonicalize import (
        connected_components,
    )

    rng = random.Random(20260817)

    def er(n, m):
        return [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(m)
        ]

    def hubby(n, m):
        # preferential-ish: half the endpoints drawn from a small head
        return [
            (rng.randrange(n // 10 or 1), rng.randrange(n))
            for _ in range(m)
        ]

    def chains_and_stars(n):
        edges = []
        ids = list(range(n))
        rng.shuffle(ids)
        third = n // 3
        for i in range(third - 1):          # one long shuffled chain
            edges.append((ids[i], ids[i + 1]))
        hub = ids[third]
        for v in ids[third + 1: 2 * third]:  # one star
            edges.append((hub, v))
        for i in range(2 * third, n - 1, 2):  # pair soup
            edges.append((ids[i], ids[i + 1]))
        return edges

    cases = [
        ("er_sparse", er(200, 150), "int"),
        ("er_denser", er(120, 300), "int"),
        ("hubby", hubby(200, 250), "int"),
        ("mix", chains_and_stars(180), "str"),
    ]
    for name, edges, typ in cases:
        edges = [(a, b) for a, b in edges if a != b]
        if typ == "str":
            edges = [(f"n{a:05d}", f"n{b:05d}") for a, b in edges]
            schema = "src string, dst string"
        else:
            schema = "src int, dst int"
        df = spark.createDataFrame(edges, schema)
        got = {
            r["id"]: r["component"]
            for r in connected_components(
                df, max_iter=15, verify_forest=True, driver_cap=0
            ).collect()
        }
        assert got == _expected_components(edges), name


def test_connected_components_driver_path_routing_and_equality(spark):
    """The small-graph driver union-find is a PHYSICAL routing choice:
    same (id, component) rows as the distributed star kernel on both
    sides of the cap, and the cap actually routes (the driver path
    runs zero star rounds, so convergence limits can't fire)."""
    import random

    from edgar_finance_ontology_spark.operators.canonicalize import (
        connected_components,
    )

    rng = random.Random(7)
    edges = [(rng.randrange(150), rng.randrange(150)) for _ in range(220)]
    edges += [(f := 1000 + i, f + 1) for i in range(30)]  # a chain too
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src int, dst int")

    dist = sorted(
        tuple(r) for r in connected_components(df, driver_cap=0).collect()
    )
    drv = sorted(
        tuple(r)
        # cap above the edge count -> driver path; max_iter=0 proves no
        # star round ran (the distributed loop would raise)
        for r in connected_components(df, driver_cap=10**6,
                                      max_iter=0).collect()
    )
    assert drv == dist
    assert dist == sorted(_expected_components(edges).items())

    # string ids keep their type through the driver path
    sdf = spark.createDataFrame(
        [(f"d{a:04d}", f"d{b:04d}") for a, b in edges], "src string, dst string"
    )
    out = connected_components(sdf, driver_cap=10**6, max_iter=0)
    assert dict(out.dtypes) == {"id": "string", "component": "string"}
