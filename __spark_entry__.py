"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: the full KG-construction pipeline on
                synthesized Common-Crawl-style pages (sf0.001-scale
                panel): html -> extraction -> fact parsing -> candidate
                selection -> derived metrics -> triples.
queries()     — one entry per operator family from SURVEY.md §2 plus
                the training-data-pipeline ops (dedup / ANN / text),
                each over the driver's testdata parquet.
oracle_sql()  — DuckDB twins replaying the same algorithms.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


_KG_CACHE: dict = {}


def _kg_tables(spark: SparkSession) -> dict:
    """Run the KG pipeline once per session (entry / kg_observations /
    kg_triples share the result)."""
    key = id(spark)
    if key not in _KG_CACHE:
        from edgar_finance_ontology_spark.plans.web_pipeline import (
            pages_to_inputs,
        )
        from edgar_finance_ontology_spark.plans.pipeline import run_pipeline
        from edgar_finance_ontology_spark.sources.pages import (
            synthesize_pages,
        )

        pages = synthesize_pages(spark, n_buckets=8)
        facts, companies = pages_to_inputs(pages)
        t = run_pipeline(facts, companies, fy=2024)
        t["companies"] = companies
        _KG_CACHE.clear()
        _KG_CACHE[key] = t
    return _KG_CACHE[key]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end web-page KG construction -> triples DF."""
    from edgar_finance_ontology_spark.emit.triples import build_triples

    t = _kg_tables(spark)
    return build_triples(
        t["observations"], t["companies"], t["benchmarks"], t["rankings"],
        fy=2024,
    )


def _kg_observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KG pipeline observations (input synthesized deterministically).
    Oracle: the REFERENCE script's tags csv for the same panel,
    materialized as golden parquet by scripts/make_golden.py."""
    from edgar_finance_ontology_spark.emit.csv_format import (
        observations_csv_frame,
    )

    return observations_csv_frame(_kg_tables(spark)["observations"])


def _kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship triple stream rendered to its Turtle lexical form
    (subj, pred, obj) — comparable to the reference instances.ttl parse
    (golden parquet, scripts/make_golden.py)."""
    return entry(spark).selectExpr(
        "subj", "pred",
        """CASE WHEN NOT obj_is_literal THEN obj
                WHEN obj_dtype IN ('xsd:integer', 'xsd:boolean') THEN obj
                WHEN obj_dtype IS NULL THEN concat('"', obj, '"')
                ELSE concat('"', obj, '"^^', obj_dtype) END AS obj""",
    ).dropDuplicates(["subj", "pred", "obj"])


def _golden_sql(name: str) -> str:
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "golden", f"{name}.parquet",
    )
    return f"SELECT * FROM read_parquet('{path}')"


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from edgar_finance_ontology_spark.queries import QUERIES

    out = {name: fn for name, (fn, _sql) in QUERIES.items()}
    out["kg_observations"] = _kg_observations
    out["kg_triples"] = _kg_triples
    return out


def oracle_sql() -> dict[str, str]:
    from edgar_finance_ontology_spark.queries import QUERIES

    # an entry may register a zero-arg CALLABLE instead of a string
    # (e.g. the classifier twin renders its committed model weights
    # into the SQL — deferred so importing the registry never loads
    # model artifacts)
    out = {
        name: (sql() if callable(sql) else sql)
        for name, (_fn, sql) in QUERIES.items() if sql
    }
    out["kg_observations"] = _golden_sql("kg_observations")
    out["kg_triples"] = _golden_sql("kg_triples")
    return out
