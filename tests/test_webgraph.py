"""Web link graph: href extraction forms, domain contraction, and the
hub-wins PageRank composition."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from edgar_finance_ontology_spark.operators.webgraph import (
    domain_edges,
    domain_pagerank,
    extract_links,
)


def _pages(spark, rows):
    ts = dt.datetime(2025, 3, 1)
    return spark.createDataFrame(
        [(u, ts, h.encode(), None, "en") for u, h in rows],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    )


def test_extract_links_forms(spark):
    html = (
        '<a href="https://a.test/x">x</a>'
        "<a href='http://b.test/y'>y</a>"
        '<a href = "//c.test/z">proto-relative</a>'
        '<a href="/relative/path">dropped</a>'
        '<a href="#frag">dropped</a>'
        '<a href="mailto:x@y.z">dropped</a>'
        '<a href="HTTPS://UPPER.test/">kept</a>'
    )
    pages = _pages(spark, [("https://src.test/page", html)])
    got = {r["dst"] for r in extract_links(pages).collect()}
    assert got == {
        "https://a.test/x", "http://b.test/y",
        "https://c.test/z",          # src scheme resolved
        "HTTPS://UPPER.test/",
    }
    assert all(r["src"] == "https://src.test/page"
               for r in extract_links(pages).collect())


def test_domain_edges_contract_and_self_loops(spark):
    pages = _pages(spark, [
        ("https://www.news.test/a",
         '<a href="https://www.news.test/b">self</a>'
         '<a href="https://blog.hub.test/p">1</a>'
         '<a href="https://hub.test/q">2</a>'),
    ])
    edges = {(r["src"], r["dst"]): r["n_links"]
             for r in domain_edges(extract_links(pages)).collect()}
    # same registrable domain (www.news.test -> news.test) is a
    # self-loop and dropped; the two hub links contract to ONE domain
    # edge with n_links=2
    assert edges == {("news.test", "hub.test"): 2}


def test_extract_anchors_alignment_and_alias_counts(spark):
    from edgar_finance_ontology_spark.operators.webgraph import (
        anchor_alias_counts,
        extract_anchors,
    )

    html = (
        '<a class="x" href="https://acme.test/a">Acme  Corp</a>'
        "<a href='https://acme.test/b'>ACME corp</a>"
        '<a href="https://other.test/">Other</a>'
        '<a href="/rel">dropped</a>'
        '<a href="https://acme.test/c"></a>'  # empty anchor
    )
    pages = _pages(spark, [("https://src.test/", html)])
    got = {(r["dst"], r["anchor"])
           for r in extract_anchors(pages).collect()}
    # href and text come from the same match: alignment is positional
    assert got == {
        ("https://acme.test/a", "Acme  Corp"),
        ("https://acme.test/b", "ACME corp"),
        ("https://other.test/", "Other"),
        ("https://acme.test/c", ""),
    }
    counts = {(r["entity_domain"], r["alias"]): r["n"]
              for r in anchor_alias_counts(
                  extract_anchors(pages)).collect()}
    # case + whitespace normalize collapses both Acme anchors; the
    # empty anchor is dropped
    assert counts == {("acme.test", "acme corp"): 2,
                      ("other.test", "other"): 1}


def test_anchor_commonness_prior_feeds_linking(spark):
    """End-to-end north-star stages 2-3 from web evidence alone: the
    anchor-commonness prior P(entity|alias) built from hrefs breaks a
    context tie in link_mentions toward the domain the web names more
    often."""
    from edgar_finance_ontology_spark.operators.linking import (
        link_mentions,
    )
    from edgar_finance_ontology_spark.operators.webgraph import (
        anchor_alias_counts,
        anchor_candidates,
        extract_anchors,
    )

    html = (
        '<a href="https://acme.test/1">Acme</a>'
        '<a href="https://acme.test/2">Acme</a>'
        '<a href="https://acme.test/3">Acme</a>'
        '<a href="https://acmeclone.test/">Acme</a>'
    )
    pages = _pages(spark, [("https://src.test/", html)])
    cand = anchor_candidates(
        anchor_alias_counts(extract_anchors(pages)))
    priors = {(r["surface"], r["entity_id"]): r["prior"]
              for r in cand.collect()}
    assert priors[("acme", "acme.test")] == 0.75
    assert priors[("acme", "acmeclone.test")] == 0.25

    # identical profile texts -> identical context cosine; the prior
    # must decide
    mentions = spark.createDataFrame(
        [("m1", "quarterly widget revenue", "acme")],
        "mention_id string, context_text string, surface string",
    )
    profiles = spark.createDataFrame(
        [("acme.test", "widget maker"),
         ("acmeclone.test", "widget maker")],
        "entity_id string, profile_text string",
    )
    top = link_mentions(mentions, profiles, cand) \
        .where(F.col("rank") == 1).first()
    assert top["entity_id"] == "acme.test"


def test_domain_pagerank_hub_wins(spark):
    # DAG star (exact convergence in depth+1 synchronous rounds —
    # a back-link would make the star near-bipartite and oscillate at
    # even iteration counts): five spoke domains link to the hub
    rows = []
    for i in range(5):
        rows.append((
            f"https://s{i}.test/",
            '<a href="https://hub.test/">h</a>'
            '<a href="https://peer.test/">p</a>',
        ))
    rows.append(("https://peer.test/", "<p>no links</p>"))
    pr = domain_pagerank(_pages(spark, rows), iters=4)
    ranks = {r["id"]: r["rank_units"] for r in pr.collect()}
    # hub and peer each receive all five spokes' (split) outflow and
    # must outrank every spoke; split flow ties them exactly
    for i in range(5):
        assert ranks["hub.test"] > ranks[f"s{i}.test"]
    assert ranks["hub.test"] == ranks["peer.test"]
