"""SPARQL-surface views + competency queries over the panel outputs."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def registered(spark, engine_inputs):
    from edgar_finance_ontology_spark.plans.pipeline import run_pipeline
    from edgar_finance_ontology_spark.plans.views import register_views

    facts, companies = engine_inputs
    t = run_pipeline(facts, companies, fy=2024)
    register_views(spark, t["observations"], companies, t["benchmarks"],
                   t["rankings"])
    return t


def test_competency_queries_run_and_agree(spark, registered):
    from edgar_finance_ontology_spark.plans.views import COMPETENCY_QUERIES

    out = {name: fn(spark) for name, fn in COMPETENCY_QUERIES.items()}

    prof = out["cq_star_profile"].toPandas()
    # every company with Revenue+NetIncome appears once
    assert prof["cik"].is_unique and len(prof) == 11  # LMDA lacks Revenue

    lineage = out["cq_lineage_exists"].toPandas()
    assert set(lineage["metric"]) >= {"ROE"}  # NetIncome;Equity;Equity_Prior

    opt = out["cq_optional_metrics"].toPandas()
    assert len(opt) == 12  # OPTIONAL keeps all companies

    peers = out["cq_peer_rank_by_count"].toPandas()
    # unique industries in the panel -> everyone has 0 higher-margin peers
    assert (peers["peers_with_higher_margin"] == 0).all()

    leaders = out["cq_leader_intersection"].toPandas()
    # intersection is a subset of the all-scope composite Top10
    assert len(leaders) <= 10

    closure = out["cq_subclass_closure"].toPandas()
    assert closure.iloc[0]["ancestor"] == "DerivedRatio"
    assert closure.iloc[0]["n_obs"] > 100

    cmp_ = out["cq_benchmark_compare"].toPandas()
    # above-median per metric is < full population per metric
    sizes = cmp_.groupby("metric").size()
    assert (sizes <= 12).all() and (sizes > 0).all()

    pio = out["cq_piotroski_style_score"].toPandas()
    assert len(pio) == 12
    assert pio["piotroski_score"].between(0, 8).all()
    # the synthetic panel is profitable across the board
    assert (pio["piotroski_score"] >= 5).all()


def test_peer_rank_equals_theta_join(spark, registered):
    """The O(n log n) window rewrite must equal the SPARQL-shaped
    O(n²) theta self-join it replaces."""
    from edgar_finance_ontology_spark.plans.views import (
        cq_peer_rank_by_count,
    )

    win = cq_peer_rank_by_count(spark).toPandas()
    theta = spark.sql("""
        SELECT a.industry, a.cik,
               count(b.cik) AS peers_with_higher_margin
        FROM efin_observations a
        LEFT JOIN efin_observations b
          ON a.industry = b.industry AND b.metric = 'NetProfitMargin'
         AND b.value > a.value
        WHERE a.metric = 'NetProfitMargin'
        GROUP BY a.industry, a.cik
    """).toPandas()
    w = win.set_index("cik")["peers_with_higher_margin"].to_dict()
    t = theta.set_index("cik")["peers_with_higher_margin"].to_dict()
    assert w == t
