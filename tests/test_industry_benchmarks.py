"""Industry-scope benchmarks validated against a pure-Python oracle.

The shipped reference can never produce these rows (its sector lookup
NameErrors with >=2 companies per industry), so the oracle here is a
direct Python replication of its documented formula
(select_xbrl_tags.py:670-691): per (industry, metric) over CSV-rounded
values, n>=2, statistics.mean/median, index-based p25/p75.
"""

import statistics

import pytest


@pytest.fixture(scope="module")
def scaled_outputs(spark):
    from edgar_finance_ontology_spark.plans.pipeline import run_pipeline
    from edgar_finance_ontology_spark.plans.web_pipeline import (
        pages_to_inputs,
    )
    from edgar_finance_ontology_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, n_buckets=8, n_companies=24)
    facts, companies = pages_to_inputs(pages)
    return run_pipeline(facts, companies, fy=2024)


def test_industry_benchmarks_python_oracle(scaled_outputs):
    from edgar_finance_ontology_spark.vocab.metrics import (
        BENCHMARK_RANKING_METRICS,
    )

    obs = scaled_outputs["observations"].toPandas()
    b = scaled_outputs["benchmarks"].toPandas()

    # python oracle over the CSV-rounded values
    groups = {}
    for _, r in obs.iterrows():
        if (not r["industry"] or r["metric"] not in BENCHMARK_RANKING_METRICS
                or r["value"] is None):
            continue
        v = float(f"{r['value']:.6f}")
        groups.setdefault((r["industry"], r["metric"]), []).append(v)

    ind_rows = b[b["industry"] != ""]
    assert len(ind_rows) > 0, "shared industries must yield industry rows"
    got = {
        (r["industry"], r["metric"]): r for _, r in ind_rows.iterrows()
    }
    for key, vals in groups.items():
        if len(vals) < 2:
            assert key not in got
            continue
        sv = sorted(vals)
        n = len(sv)
        r = got[key]
        assert r["sample_size"] == n, key
        assert r["average_value"] == statistics.mean(sv), key
        assert r["median_value"] == statistics.median(sv), key
        assert r["max_value"] == max(sv) and r["min_value"] == min(sv)
        assert r["percentile25"] == sv[int(n * 0.25)], key
        assert r["percentile75"] == sv[int(n * 0.75)], key
    assert set(got) == {k for k, v in groups.items() if len(v) >= 2}


def test_industry_rankings_have_shared_groups(scaled_outputs):
    """With archetype clones, industry ranking groups hold >1 company
    and ranks are dense from 1."""
    r = scaled_outputs["rankings"].toPandas()
    ind_all = r[(r["industry"] != "") & (r["ranking_type"] == "All")
                & (r["metric"] == "ROE")]
    sizes = ind_all.groupby("industry")["rank"].agg(["min", "max", "count"])
    assert (sizes["min"] == 1).all()
    assert (sizes["max"] == sizes["count"]).all()
    assert (sizes["count"] >= 2).any()
