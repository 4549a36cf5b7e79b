import subprocess
import sys

import pytest


@pytest.fixture(scope="session")
def spark():
    from edgar_finance_ontology_spark.session import build_session

    s = build_session("efin-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def panel_dir(tmp_path_factory):
    """Synthetic panel written to disk + the reference script's outputs
    on it (the golden oracle)."""
    from edgar_finance_ontology_spark.sources.synthetic import (
        write_reference_inputs,
    )

    d = tmp_path_factory.mktemp("panel")
    out = write_reference_inputs(d)
    cmd = [
        sys.executable, "/root/reference/scripts/select_xbrl_tags.py",
        "--fy", "2024",
        "--facts", *out["facts_paths"],
        "--subs-cache-dir", out["subs_cache_dir"],
        "--out-tags", str(d / "tags.csv"),
        "--out-companies", str(d / "companies.csv"),
        "--out-benchmarks", str(d / "benchmarks.csv"),
        "--out-rankings", str(d / "rankings.csv"),
        "--out-wide", str(d / "wide.csv"),
        "--emit-ttl", str(d / "instances.ttl"),
        "--include-derived",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=d)
    assert r.returncode == 0, r.stderr[-2000:]
    return {"dir": d, **out}


@pytest.fixture(scope="session")
def engine_inputs(spark, panel_dir):
    """(facts_df, companies_df) read through our JSON source path."""
    from edgar_finance_ontology_spark.sources.facts import (
        build_companies,
        explode_facts,
        read_companyfacts_json,
        read_submissions_json,
    )

    facts_glob = str(panel_dir["dir"] / "facts" / "*.json")
    subs_glob = panel_dir["subs_cache_dir"] + "/*.json"
    cf = read_companyfacts_json(spark, facts_glob)
    subs = read_submissions_json(spark, subs_glob)
    facts = explode_facts(cf).cache()
    companies = build_companies(cf, subs).cache()
    return facts, companies
