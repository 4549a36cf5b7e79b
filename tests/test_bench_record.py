"""The driver captures only the last ~2000 chars of bench.py stdout.

Rounds 3 and 4 both shipped a final line longer than that window, so
the official BENCH_r{N}.json record was `parsed: null` twice running.
These tests pin the fix: the compact record serializes under budget
for (a) the actual shipped round-4 record and (b) a synthetic
worst-width record covering every benched query.
"""

import json
import os

import bench

REPO = os.path.dirname(os.path.abspath(bench.__file__))


def _line(record):
    return json.dumps(bench.compact_record(record))


def _synthetic_record():
    # worst plausible widths: 5-digit seconds everywhere, 9-digit counts
    return {
        "metric": "kg_triples_per_sec",
        "value": 999999.99,
        "unit": "sec",
        "queries": {name: 99999.999 for name in bench.BENCH_QUERIES},
        "sf": "/root/testdata/sf0.1",
        "total_query_sec": 999999.999,
        "kg": {
            "n_companies": 999999999,
            "n_triples": 999999999,
            "wall_sec": 99999.999,
            "triples_per_sec": 999999.99,
            "kg_10x": {"triples_per_sec": 999999.99},
            "cq_catalog": {
                "wall_sec": 99999.999,
                "per_view": {f"cq_{i}": 99999.999 for i in range(57)},
            },
        },
        "scaling": {
            "n_to_4n": {"efficiency": 0.999},
            "max_threads": {"efficiency": 0.999},
        },
    }


def test_bench_line_fits_synthetic_worst_case():
    line = _line(_synthetic_record())
    assert len(line) < bench._STDOUT_LINE_BUDGET, len(line)
    # deterministic shape: exactly the 5 slowest + the full count
    parsed = json.loads(line)
    assert len(parsed["queries_slowest5"]) == 5
    assert parsed["n_queries"] == len(bench.BENCH_QUERIES)


def test_bench_line_fits_shipped_record():
    path = os.path.join(REPO, "BENCH_LOCAL.json")
    if not os.path.exists(path):
        return
    with open(path) as f:
        record = json.load(f)
    line = _line(record)
    assert len(line) < bench._STDOUT_LINE_BUDGET, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "kg_triples_per_sec"
    assert parsed["kg"]["triples_per_sec"] is not None
    assert parsed["scaling"]["n_to_4n_efficiency"] is not None


def test_bench_line_is_parseable_json():
    parsed = json.loads(_line(_synthetic_record()))
    assert parsed["unit"] == "sec"
    assert parsed["kg"]["kg_10x_tps"] == 999999.99
    assert parsed["kg"]["cq_wall_sec"] == 99999.999


def test_line_budget_is_query_count_independent():
    rec = _synthetic_record()
    # 200 fat queries must not change the line shape or budget —
    # rounds 3 and 4 shipped unparseable records because the line
    # width tracked the query count
    rec["queries"] = {
        f"extremely_long_query_name_number_{i:04d}": 99999.999
        for i in range(200)
    }
    line = _line(rec)
    assert len(line) < bench._STDOUT_LINE_BUDGET, len(line)
    parsed = json.loads(line)
    assert len(parsed["queries_slowest5"]) == 5
    assert parsed["n_queries"] == 200


def test_bench_covers_every_registry_query():
    """A registry entry added without touching bench.py must still be
    measured: the effective name list is BENCH_QUERIES plus any
    registry key not already in it."""
    from edgar_finance_ontology_spark.queries import QUERIES

    names = bench.BENCH_QUERIES + sorted(
        set(QUERIES) - set(bench.BENCH_QUERIES)
    )
    assert set(names) == set(QUERIES)
    assert len(names) == len(set(names))
    assert all(n in QUERIES for n in bench.BENCH_QUERIES)
