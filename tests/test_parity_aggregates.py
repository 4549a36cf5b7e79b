"""Golden parity for benchmarks / rankings / wide pivot vs the
reference script's CSVs on the synthetic panel."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def observations(spark, engine_inputs):
    from edgar_finance_ontology_spark.operators.observations import (
        build_observations,
    )

    facts, companies = engine_inputs
    return build_observations(facts, companies, fy=2024).cache()


def _cmp(ours: pd.DataFrame, ref: pd.DataFrame, key: list[str]):
    ours = ours.astype(str).sort_values(key).reset_index(drop=True)
    ref = ref.astype(str).sort_values(key).reset_index(drop=True)
    assert list(ours.columns) == list(ref.columns)
    merged = ref.merge(ours, on=key, how="outer", suffixes=("_ref", "_ours"),
                       indicator=True)
    assert (merged["_merge"] == "both").all(), merged[
        merged["_merge"] != "both"
    ][key].to_string()
    for col in ref.columns:
        if col in key:
            continue
        bad = merged[merged[f"{col}_ref"] != merged[f"{col}_ours"]]
        assert bad.empty, f"{col}:\n" + bad[
            key + [f"{col}_ref", f"{col}_ours"]
        ].head(10).to_string()


def test_benchmarks_all_scope_matches_reference(panel_dir, observations):
    """The shipped reference only survives the all-market scope (its
    industry-scope sector lookup NameErrors with >=2 companies per
    industry; with our unique-industry panel the n>=2 gate skips
    industry groups). Compare the surviving all-scope rows exactly,
    including Python-repr float formatting."""
    from edgar_finance_ontology_spark.emit.csv_format import (
        benchmarks_csv_frame,
    )
    from edgar_finance_ontology_spark.operators.benchmarks import (
        compute_benchmarks,
    )

    b = compute_benchmarks(observations, fy=2024)
    ours = benchmarks_csv_frame(b).toPandas()
    ours_all = ours[ours["industry"] == ""].reset_index(drop=True)
    ref = pd.read_csv(panel_dir["dir"] / "benchmarks.csv", dtype=str).fillna("")
    _cmp(ours_all, ref, key=["industry", "metric"])

    # industry scope: self-consistency assertions (no oracle — reference
    # drift documented above): every industry group here has n==1 so no
    # industry rows at all on this panel
    assert (ours["industry"] != "").sum() == 0


def test_rankings_match_reference(panel_dir, observations):
    from edgar_finance_ontology_spark.emit.csv_format import (
        rankings_csv_frame,
    )
    from edgar_finance_ontology_spark.operators.rankings import (
        compute_rankings,
    )

    r = compute_rankings(observations, fy=2024)
    ours = rankings_csv_frame(r).toPandas()
    ref = pd.read_csv(panel_dir["dir"] / "rankings.csv", dtype=str).fillna("")
    _cmp(ours, ref, key=["cik", "industry", "metric", "ranking_type"])


def test_wide_matches_reference(panel_dir, observations):
    from edgar_finance_ontology_spark.operators.rankings import (
        compute_rankings,
    )
    from edgar_finance_ontology_spark.operators.wide import (
        build_wide_csv_frame,
    )

    r = compute_rankings(observations, fy=2024)
    ours = build_wide_csv_frame(observations, r).toPandas()
    ref = pd.read_csv(panel_dir["dir"] / "wide.csv", dtype=str).fillna("")
    _cmp(ours, ref, key=["cik"])
