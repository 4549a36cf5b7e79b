"""Predicate-partitioned triple materialization: the bounded predicate
vocabulary becomes the partition key (vertical partitioning for RDF on
columnar storage), so a pred-filtered scan prunes whole directories —
checked on the physical plan, not assumed."""

import os


def test_pred_partitioned_triples_prune(spark, engine_inputs, tmp_path):
    from pyspark.sql import functions as F

    from edgar_finance_ontology_spark.emit.triples import build_triples
    from edgar_finance_ontology_spark.plans.pipeline import run_pipeline

    facts, companies = engine_inputs
    t = run_pipeline(facts, companies, fy=2024)
    trip = build_triples(
        t["observations"], companies, t["benchmarks"], t["rankings"], fy=2024
    )
    out = str(tmp_path / "triples")
    trip.repartitionByRange(F.col("pred"), F.col("subj")).write.mode(
        "overwrite"
    ).partitionBy("pred").parquet(out)

    # one directory per predicate; bounded vocabulary
    dirs = [d for d in os.listdir(out) if d.startswith("pred=")]
    assert 10 <= len(dirs) <= 80, dirs

    back = spark.read.parquet(out)
    assert back.count() == trip.count()

    # pred filter must become a partition filter (directory pruning),
    # not a data filter over the full table
    q = back.where(F.col("pred") == "rdf:type")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "rdf:type" in plan, plan
    got = q.count()
    want = trip.where(F.col("pred") == "rdf:type").count()
    assert got == want > 0
