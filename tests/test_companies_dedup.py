"""build_companies must emit ONE row per cik even when the submissions
cache holds multiple date-stamped snapshots whose CONTENT differs
(EDGAR refreshed overnight) — the round-3 advice case a full-row dedup
cannot shield. The newest snapshot (lexicographic max filename, dates
are %Y%m%d) wins."""

from __future__ import annotations

import json

from edgar_finance_ontology_spark.sources.facts import (
    build_companies, read_companyfacts_json, read_submissions_json,
)

FACTS = {
    "cik": 77,
    "entityName": "Acme Corp",
    "facts": {"us-gaap": {}},
}


def _subs(ticker: str, sic: str) -> dict:
    return {
        "cik": 77,
        "sic": sic,
        "sicDescription": "Widgets",
        "fiscalYearEnd": "1231",
        "tickers": [ticker],
        "exchanges": ["NYSE"],
    }


def test_divergent_snapshots_one_row_newest_wins(spark, tmp_path):
    facts_dir = tmp_path / "facts"
    subs_dir = tmp_path / "subs"
    facts_dir.mkdir()
    subs_dir.mkdir()
    (facts_dir / "CIK0000000077.json").write_text(json.dumps(FACTS))
    (subs_dir / "submissions_CIK0000000077_20260101.json").write_text(
        json.dumps(_subs("OLDT", "3714"))
    )
    (subs_dir / "submissions_CIK0000000077_20260102.json").write_text(
        json.dumps(_subs("NEWT", "3711"))
    )

    cf = read_companyfacts_json(spark, str(facts_dir / "*.json"))
    subs = read_submissions_json(spark, str(subs_dir / "*.json"))
    rows = build_companies(cf, subs).collect()
    assert len(rows) == 1
    assert rows[0]["symbol"] == "NEWT"
    assert rows[0]["sic"] == "3711"


def test_identical_snapshots_still_one_row(spark, tmp_path):
    facts_dir = tmp_path / "facts"
    subs_dir = tmp_path / "subs"
    facts_dir.mkdir()
    subs_dir.mkdir()
    (facts_dir / "CIK0000000077.json").write_text(json.dumps(FACTS))
    body = json.dumps(_subs("SAME", "3714"))
    for d in ("20260101", "20260102"):
        (subs_dir / f"submissions_CIK0000000077_{d}.json").write_text(body)

    cf = read_companyfacts_json(spark, str(facts_dir / "*.json"))
    subs = read_submissions_json(spark, str(subs_dir / "*.json"))
    rows = build_companies(cf, subs).collect()
    assert len(rows) == 1
    assert rows[0]["symbol"] == "SAME"
