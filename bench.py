#!/usr/bin/env python3
"""Benchmark harness. Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "kg": {...}, "scaling": {...}}

Parts:
  1. headline operator queries at $SPARK_GRAFT_SF_DIR (default
     /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS];
  2. the KG pipeline end-to-end on synthesized Common-Crawl-style
     pages -> triples/sec (the north-star metric);
  3. scaling evidence: the page-processing stage (extraction + fact
     parse + gazetteer mentions — the volume-proportional part of the
     10^12-page design) at local[N] vs local[4N] on identical input ->
     throughput at both + efficiency (target >= 0.8).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE_LOW = max(1, CPUS // 4)

# queries cheap enough for per-round benching at sf0.1
BENCH_QUERIES = [
    "pricing_summary", "star_join_revenue", "top10_per_group",
    "yoy_growth", "asof_pick", "semi_anti", "grouping_sets_benchmarks",
    "pivot_events", "composite_rank", "sessionize", "json_props",
    "dedup_exact", "simhash_dedup", "ann_cosine_topk", "ann_ivf_cell",
    "lang_id", "quality_scores", "token_counts", "doc_fingerprints",
    "gazetteer_mentions",
]


def _session(master_threads: int, app: str):
    from edgar_finance_ontology_spark.session import build_session

    return build_session(
        app, master=f"local[{master_threads}]",
        shuffle_partitions=max(8, master_threads),
    )


def _drain(df) -> int:
    """Force full computation without driver collect."""
    return df.count()


def bench_queries(spark) -> dict:
    from edgar_finance_ontology_spark.queries import QUERIES

    out = {}
    for name in BENCH_QUERIES:
        fn, _sql = QUERIES[name]
        t0 = time.monotonic()
        _drain(fn(spark, SF_DIR))
        out[name] = round(time.monotonic() - t0, 3)
    return out


def _scaled_pages(spark, copies: int):
    """Deterministic large page set: the panel pages replicated with
    distinct urls (content identical; volume scales with `copies`)."""
    from pyspark.sql import functions as F

    from edgar_finance_ontology_spark.sources.pages import synthesize_pages

    base = synthesize_pages(spark, skew_copies=0, noise_pages=40,
                            n_buckets=max(8, CPUS))
    reps = base.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("copy")
    )
    return reps.withColumn(
        "url", F.concat_ws("#", "url", F.col("copy").cast("string"))
    ).drop("copy").repartition(max(8, CPUS) * 2)


def page_stage(pages):
    """The volume-proportional stage: extraction -> fact parse ->
    gazetteer mentions (counted to force full execution)."""
    from pyspark.sql import functions as F

    from edgar_finance_ontology_spark.operators.extraction import (
        with_extracted_text,
    )
    from edgar_finance_ontology_spark.operators.mentions import (
        concept_lexicon_terms, detect_mentions,
    )
    from edgar_finance_ontology_spark.plans.web_pipeline import (
        parse_fact_records,
    )

    p = with_extracted_text(pages)
    facts = parse_fact_records(p)
    mentions = detect_mentions(p, concept_lexicon_terms())
    return facts.select(F.lit(1).alias("one")).unionAll(
        mentions.select(F.lit(1).alias("one"))
    )


def bench_kg(spark) -> dict:
    from edgar_finance_ontology_spark.emit.triples import build_triples
    from edgar_finance_ontology_spark.plans.pipeline import run_pipeline
    from edgar_finance_ontology_spark.plans.web_pipeline import (
        pages_to_inputs,
    )
    from edgar_finance_ontology_spark.sources.pages import synthesize_pages

    t0 = time.monotonic()
    pages = synthesize_pages(spark, skew_copies=8, n_buckets=16)
    facts, companies = pages_to_inputs(pages)
    t = run_pipeline(facts, companies, fy=2024)
    trip = build_triples(
        t["observations"], companies, t["benchmarks"], t["rankings"], fy=2024
    )
    n_triples = trip.count()
    wall = time.monotonic() - t0
    return {
        "n_triples": n_triples,
        "wall_sec": round(wall, 3),
        "triples_per_sec": round(n_triples / wall, 2),
    }


def bench_scaling(copies: int = 192) -> dict:
    """Same page-stage job at local[N] and local[4N]; efficiency =
    (T_low / T_high) / (high/low)."""
    results = {}
    rows = None
    for threads in (SCALE_LOW, CPUS):
        spark = _session(threads, f"efin-scale-{threads}")
        try:
            pages = _scaled_pages(spark, copies)
            pages = pages.cache()
            n_pages = pages.count()  # materialize input outside timing
            t0 = time.monotonic()
            rows = _drain(page_stage(pages))
            wall = time.monotonic() - t0
            results[threads] = {
                "wall_sec": round(wall, 3),
                "rows": rows,
                "pages": n_pages,
                "pages_per_sec": round(n_pages / wall, 1),
            }
        finally:
            spark.stop()
    lo, hi = results[SCALE_LOW], results[CPUS]
    ratio = CPUS / SCALE_LOW
    eff = (lo["wall_sec"] / hi["wall_sec"]) / ratio
    return {
        "low_threads": SCALE_LOW, "high_threads": CPUS,
        "low": lo, "high": hi,
        "speedup": round(lo["wall_sec"] / hi["wall_sec"], 3),
        "efficiency": round(eff, 3),
    }


def main():
    run_scaling = os.environ.get("EFIN_BENCH_SCALING", "1") != "0"
    spark = _session(CPUS, "efin-bench")
    queries = bench_queries(spark)
    kg = bench_kg(spark)
    spark.stop()
    scaling = bench_scaling() if run_scaling else {}
    total = round(sum(queries.values()) + kg["wall_sec"], 3)
    out = {
        "metric": "kg_triples_per_sec",
        "value": kg["triples_per_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "total_query_sec": total,
        "kg": kg,
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
