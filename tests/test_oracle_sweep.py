"""The driver gate, inside the suite: every QUERIES entry with a SQL
twin runs Spark-vs-DuckDB at sf0.01 through the same normalize/compare
the driver uses — a twin regression fails pytest instead of surfacing
a round later in CORRECTNESS_r{N}.json. (The kg_* golden-parquet
oracles have their own dedicated tests in test_kg_oracle.py.)"""

from __future__ import annotations

import os

import pytest

from edgar_finance_ontology_spark.queries import QUERIES
from oracle_harness import compare, duck_connection

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    if not os.path.exists(os.path.join(SF, "documents.parquet")):
        pytest.skip("testdata missing")
    c = duck_connection(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    fn, sql = QUERIES[name]
    if callable(sql):
        sql = sql()
    r = compare(fn(spark, SF), con, sql)
    assert r["rows_ours"] == r["rows_ref"] > 0, r
    assert r["match"], {k: r[k] for k in ("rows_ours", "rows_ref",
                                          "first_diff")}
