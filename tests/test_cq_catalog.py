"""Every CQ heading from the reference's three query docs runs as a
named view, and the IDENTICAL SQL string executes in both Spark and
DuckDB over the same base tables with equal results — the dual-engine
oracle discipline of the driver gate applied to the whole competency
catalog."""

import duckdb
import pytest

from oracle_harness import normalize


@pytest.fixture(scope="module")
def cq_data(spark, engine_inputs):
    """Heavy pipeline work once; both fiscal years' engine tables."""
    from edgar_finance_ontology_spark.plans.pipeline import run_pipeline

    facts, companies = engine_inputs
    t24 = run_pipeline(facts, companies, fy=2024)
    t23 = run_pipeline(facts, companies, fy=2023)
    observations = t24["observations"].unionByName(
        t23["observations"]
    ).localCheckpoint(eager=True)
    return {"companies": companies, "observations": observations,
            2024: t24, 2023: t23}


@pytest.fixture(scope="module", params=[2024, 2023])
def cq_setup(request, spark, cq_data):
    """Both engines registered for ONE fiscal year — the whole catalog
    is parameterized by fy (round-2 verdict item 6), so the full
    dual-engine sweep runs at 2024 AND 2023."""
    from edgar_finance_ontology_spark.plans.cq_catalog import (
        base_tables, build_support_views, register_cq_catalog,
    )

    fy = request.param
    t = cq_data[fy]
    observations, companies = cq_data["observations"], cq_data["companies"]
    register_cq_catalog(
        spark, observations, companies, t["benchmarks"], t["rankings"],
        fy=fy,
    )
    con = duckdb.connect()
    for name, df in base_tables(
        spark, observations, companies, t["benchmarks"], t["rankings"]
    ).items():
        pdf = df.toPandas()
        con.register(f"{name}__pdf", pdf)
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM {name}__pdf"
        )
    for name, sql in build_support_views(fy):
        con.execute(f"CREATE OR REPLACE VIEW {name} AS {sql}")
    yield spark, con, fy
    con.close()


def _names():
    from edgar_finance_ontology_spark.plans.cq_catalog import CQ_CATALOG

    return sorted(CQ_CATALOG)


@pytest.mark.parametrize("name", _names())
def test_cq_dual_engine_equal(cq_setup, name):
    from edgar_finance_ontology_spark.plans.cq_catalog import (
        build_cq_catalog,
    )

    spark, con, fy = cq_setup
    sql = build_cq_catalog(fy)[name]
    assert "__FY" not in sql  # every year token rendered
    ours = normalize(spark.sql(sql).toPandas())
    ref = normalize(con.execute(sql).fetchdf())
    assert len(ours) == len(ref), (name, fy, len(ours), len(ref))
    assert ours == ref, (name, fy, next(
        ((a, b) for a, b in zip(ours, ref) if a != b), None
    ))


# CQs that MUST return rows on the synthetic panel (industry averages
# equal each singleton company's own value, so >=-style screens hit;
# +5%p / 1.2x-style screens correctly return empty there).
EXPECTED_NONEMPTY = [
    "cq1_1_1_core_metrics_vs_industry",
    "cq1_2_1_piotroski_fscore",
    "cq1_3_1_profitable_growth",
    "cq1_4_1_cashflow_quality",
    "cq2_1_1_roe_vs_industry",
    "cq2_1_2_margin_rank_in_industry",
    "cq2_2_1_efficiency_vs_industry",
    "cq2_3_1_leverage_vs_industry",
    "cq2_3_2_roe_vs_roic",
    "cq2_5_1_multi_ratio_screen",
    "cq3_1_1_roe_trend",
    "cq3_1_2_margin_trends",
    "cq3_2_1_growth_stability",
    "cq3_3_1_efficiency_trend",
    "cq4_1_1_dupont",
    "cq4_2_1_lineage_trace",
    "cq_m1_multi_factor_above_avg",
    "cq_m2_factor_coverage_universe",
    "cq_m3_aggregate_factor_score",
    # cq_m4 needs >=2 companies per industry; the panel keeps
    # industries singleton (the reference's compute_benchmarks
    # NameErrors otherwise) so it is structurally empty there —
    # dual-engine equality still covers it.
    "cq_i1_sector_peer_comparison",
    "cq_i2_sector_leader_industries",
    "cq_i5_sector_rotation_candidates",
    "cq_i7_sector_core_industries",
    "cq_i8_sector_roe_momentum",
    "cq_i9_sector_leverage_spread",
    "cq_c1_industry_revenue_leaders",
    "cq_r1_industry_revenue_top10_classfree",
    "cq_r2_sector_roe_margin_top10_classfree",
    "cq_rsn_industry_composite_leaders",
    "cq_rsn_all_composite_leaders",
    "cq_rsn_all_metrics",
    "cq_rsn_company_observations",
    "cq_rsn_metric_observations",
    "cq_rsn_duration_observations",
]


def test_expected_cqs_nonempty(cq_setup):
    from edgar_finance_ontology_spark.plans.cq_catalog import CQ_CATALOG

    spark, _, fy = cq_setup
    if fy != 2024:
        # the panel generates fy-1 data only for 2024's trend/delta CQs
        pytest.skip("non-emptiness asserted at the panel's focal year")
    empty = [
        n for n in EXPECTED_NONEMPTY
        if spark.sql(CQ_CATALOG[n]).limit(1).count() == 0
    ]
    assert not empty, empty


def test_support_store_never_deletes_caller_dirs(tmp_path):
    """register_cq_catalog auto-deletes only generations it mkdtemp'd
    itself; a caller-supplied store_dir must survive re-registration
    (round-4 advice: user-owned paths were rmtree'd)."""
    from edgar_finance_ontology_spark.plans.cq_catalog import (
        _SUPPORT_STORE, _replace_support_store,
    )

    key = "test-app-store-ownership"
    try:
        user_dir = tmp_path / "user_store"
        user_dir.mkdir()
        sentinel = user_dir / "unrelated.txt"
        sentinel.write_text("keep me")
        ours = tmp_path / "mkdtemp_gen1"
        ours.mkdir()
        # caller dir registered, then replaced by an internal one:
        # caller dir (and its unrelated file) must remain
        _replace_support_store(key, str(user_dir), created_by_us=False)
        _replace_support_store(key, str(ours), created_by_us=True)
        assert sentinel.exists()
        # internal generation replaced by another internal one: deleted
        ours2 = tmp_path / "mkdtemp_gen2"
        ours2.mkdir()
        _replace_support_store(key, str(ours2), created_by_us=True)
        assert not ours.exists() and ours2.exists()
        # re-registering the SAME dir must not delete it
        _replace_support_store(key, str(ours2), created_by_us=True)
        assert ours2.exists()
    finally:
        _SUPPORT_STORE.pop(key, None)


def test_catalog_covers_every_heading():
    """20 analysis + 31 factor + 6 reasoner headings = 57 named views
    (cq4_3_1 shares cq1_5_1's body — the docs define it as the same
    screen — but both headings are present as names)."""
    from edgar_finance_ontology_spark.plans.cq_catalog import CQ_CATALOG

    assert len(CQ_CATALOG) >= 57
    for prefix, want in (("cq1_", 5), ("cq2_", 5), ("cq3_", 5),
                         ("cq4_", 3), ("cq_m", 10), ("cq_i", 10),
                         ("cq_c", 7), ("cq_r1", 1), ("cq_rsn", 6)):
        got = sum(1 for n in CQ_CATALOG if n.startswith(prefix))
        assert got >= want, (prefix, got, want)


def test_known_values_spot_check(cq_setup):
    """Hand-verifiable expectations: the reasoner metric list equals
    the vocabulary; DuPont identity holds row-wise."""
    from edgar_finance_ontology_spark.plans.cq_catalog import CQ_CATALOG
    from edgar_finance_ontology_spark.vocab.metrics import (
        BASE_METRICS, DERIVED_METRICS,
    )

    spark, _, fy = cq_setup
    if fy != 2024:
        pytest.skip("spot values asserted at the panel's focal year")
    labels = [r["label"] for r in spark.sql(
        CQ_CATALOG["cq_rsn_all_metrics"]).collect()]
    assert labels == sorted(set(BASE_METRICS) | set(DERIVED_METRICS))

    for r in spark.sql(CQ_CATALOG["cq4_1_1_dupont"]).collect():
        if r["calculated_roe"] is not None:
            assert abs(r["calculated_roe"] - r["roe"]) < 0.05, r
