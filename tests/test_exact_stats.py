"""exact_group_stats must reproduce Python `statistics` semantics
bit-for-bit WITHOUT materializing any group as a list — the all-market
benchmark scale path."""

import random
import statistics

import pandas as pd
import pytest


def _expected(vals):
    vs = sorted(float(v) for v in vals)
    n = len(vs)
    return {
        "n": n,
        "average": statistics.mean(vs),
        "median": statistics.median(vs),
        "max": max(vs),
        "min": min(vs),
        "p25": vs[int(n * 0.25)],
        "p75": vs[int(n * 0.75)],
    }


def test_exact_stats_matches_statistics_module(spark):
    from edgar_finance_ontology_spark.operators.exact_stats import (
        exact_group_stats,
    )

    rng = random.Random(42)
    rows = []
    groups = {}
    for g, size in (("a", 7), ("b", 8), ("c", 1), ("d", 250)):
        vals = [round(rng.uniform(-1e9, 1e9), 6) for _ in range(size)]
        groups[g] = vals
        rows += [(g, v) for v in vals]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "metric string, value double")
    got = exact_group_stats(df, "metric", "value", min_n=2)
    got = {r["group"]: r for r in got.to_dict("records")}
    assert "c" not in got  # min_n gate
    for g in ("a", "b", "d"):
        exp = _expected(groups[g])
        for k, v in exp.items():
            assert got[g][k] == v, (g, k, got[g][k], v)


def test_exact_stats_wide_panel_no_list_materialization(spark):
    """100k+ values through the all-market path: completes and matches
    the local statistics oracle — the round-1 memory-cliff scenario."""
    from pyspark.sql import functions as F

    from edgar_finance_ontology_spark.operators.exact_stats import (
        exact_group_stats,
    )

    n = 120_000
    # exact integer arithmetic + one IEEE division: identical doubles
    # in JVM and CPython (transcendentals like sin differ by 1 ulp)
    df = spark.range(n).select(
        F.lit("ROE").alias("metric"),
        ((F.col("id") * 2654435761 % 1000003).cast("double") / 7.0
         - 50000.0).alias("value"),
    )
    got = exact_group_stats(df, "metric", "value").to_dict("records")[0]
    vals = sorted(float(i * 2654435761 % 1000003) / 7.0 - 50000.0
                  for i in range(n))
    assert got["n"] == n
    assert got["median"] == statistics.median(vals)
    assert got["p25"] == vals[int(n * 0.25)]
    assert got["p75"] == vals[int(n * 0.75)]
    assert got["max"] == vals[-1] and got["min"] == vals[0]
    assert got["average"] == statistics.mean(vals)


def test_compute_benchmarks_all_scope_matches_pandas_oracle(spark):
    """End-to-end: the all-market rows of compute_benchmarks equal the
    statistics-module replay over the same CSV-rounded values."""
    from edgar_finance_ontology_spark.operators.benchmarks import (
        compute_benchmarks,
    )

    rng = random.Random(7)
    rows = []
    for i in range(300):
        rows.append((
            f"{i:010d}", f"T{i}", f"Co{i}", "Tech", f"Ind{i % 40}",
            2024, "ROE", False, round(rng.uniform(-5, 5), 6),
        ))
    obs = spark.createDataFrame(
        rows,
        "cik string, symbol string, name string, sector string, "
        "industry string, fy int, metric string, is_derived boolean, "
        "value double",
    )
    b = compute_benchmarks(obs, 2024)
    allm = {r["metric"]: r for r in b.where("industry = ''").collect()}
    vals = [r[8] for r in rows]
    exp = _expected(vals)
    g = allm["ROE"]
    assert g["sample_size"] == exp["n"]
    assert g["average_value"] == exp["average"]
    assert g["median_value"] == exp["median"]
    assert g["percentile25"] == exp["p25"]
    assert g["percentile75"] == exp["p75"]
    assert g["max_value"] == exp["max"]
    assert g["min_value"] == exp["min"]


def test_compute_benchmarks_hybrid_paths_agree(spark):
    """Forcing a tiny list-group threshold routes industry groups
    through the exact distributed path; results must equal the pandas
    list path bit-for-bit."""
    import random

    from edgar_finance_ontology_spark.operators.benchmarks import (
        compute_benchmarks,
    )

    rng = random.Random(11)
    rows = []
    for i in range(120):
        rows.append((
            f"{i:010d}", f"T{i}", f"Co{i}", "Tech", f"Ind{i % 6}",
            2024, "ROE", False, round(rng.uniform(-5, 5), 6),
        ))
    obs = spark.createDataFrame(
        rows,
        "cik string, symbol string, name string, sector string, "
        "industry string, fy int, metric string, is_derived boolean, "
        "value double",
    )
    via_list = compute_benchmarks(obs, 2024).orderBy(
        "industry", "metric").collect()
    via_exact = compute_benchmarks(obs, 2024, max_list_group=3).orderBy(
        "industry", "metric").collect()
    assert [tuple(r) for r in via_list] == [tuple(r) for r in via_exact]


def test_exact_stats_hypothesis_fuzz(spark):
    """Randomized group shapes (sizes 1..40, incl. the even/odd median
    and rank-edge cases) against the statistics module."""
    import random

    from edgar_finance_ontology_spark.operators.exact_stats import (
        exact_group_stats,
    )

    rng = random.Random(1234)
    for trial in range(3):
        groups = {}
        rows = []
        for gi in range(rng.randint(2, 6)):
            size = rng.choice([1, 2, 3, 4, 5, 8, 13, 40])
            vals = [round(rng.uniform(-1e12, 1e12), 6) for _ in range(size)]
            groups[f"g{gi}"] = vals
            rows += [(f"g{gi}", v) for v in vals]
        rng.shuffle(rows)
        df = spark.createDataFrame(rows, "metric string, value double")
        got = {r["group"]: r for r in
               exact_group_stats(df, "metric", "value").to_dict("records")}
        for g, vals in groups.items():
            exp = _expected(vals)
            for k, v in exp.items():
                assert got[g][k] == v, (trial, g, k, got[g][k], v)


def test_big_industry_branch_through_run_pipeline(spark, engine_inputs):
    """Round-2 verdict item 3: the big-industry exact-stats routing has
    to survive the FULL pipeline, not just unit tests. All companies
    are forced into ONE industry; run_pipeline with max_list_group
    forced below the group size must produce benchmark CSV rows (the
    byte-level presentation the TTL literals derive from) bit-equal to
    the pandas list path."""
    from pyspark.sql import functions as F

    from edgar_finance_ontology_spark.emit.csv_format import (
        benchmarks_csv_frame,
    )
    from edgar_finance_ontology_spark.plans.pipeline import run_pipeline

    facts, companies = engine_inputs
    mega = companies.withColumn("industry", F.lit("Mega Industry"))
    t_list = run_pipeline(facts, mega, fy=2024)
    t_big = run_pipeline(facts, mega, fy=2024, max_list_group=2)
    rows_list = sorted(
        map(tuple, benchmarks_csv_frame(t_list["benchmarks"]).collect())
    )
    rows_big = sorted(
        map(tuple, benchmarks_csv_frame(t_big["benchmarks"]).collect())
    )
    assert rows_list == rows_big
    # the forced route actually produced industry-scope rows
    assert any(r[0] == "Mega Industry" for r in rows_big)
    # observations and rankings are routing-invariant
    assert t_list["rankings"].count() == t_big["rankings"].count()


def test_driver_cap_route_matches_distributed(spark):
    """Round-6 driver fast path (total rows <= driver_cap) must equal
    the distributed range-sort path bit-for-bit."""
    import random

    from edgar_finance_ontology_spark.operators.exact_stats import (
        exact_group_stats,
    )

    rng = random.Random(9)
    rows = [
        (f"g{i % 7}", rng.uniform(-1e6, 1e6) * (10 ** (i % 5)))
        for i in range(3000)
    ] + [("lone", 42.5)]
    df = spark.createDataFrame(rows, "k string, v double")
    fast = exact_group_stats(df, "k", "v", min_n=2)
    dist = exact_group_stats(df, "k", "v", min_n=2, driver_cap=0)
    assert fast.to_dict("records") == dist.to_dict("records")
