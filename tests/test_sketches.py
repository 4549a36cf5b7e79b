"""Portable HyperLogLog (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from edgar_finance_ontology_spark.operators.sketches import hll_distinct


def test_hll_accuracy_across_ranges(spark):
    """~1.04/sqrt(4096) = 1.6% std error; assert a generous 5% on one
    draw each at 1e3 / 1e4 / 1e5 distincts (linear-counting range,
    transition range, raw range)."""
    for n in (1_000, 10_000, 100_000):
        df = spark.range(n).select(F.col("id").alias("v"))
        est = hll_distinct(df, "v", p=12).first()["hll_estimate"]
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_ignores_nulls_and_duplicates(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (2,), (None,), (None,)], "v long")
    r = hll_distinct(df, "v", p=12).first()
    # exact in the tiny-V linear-counting regime
    assert r["n_registers_hit"] == 2
    assert round(r["hll_estimate"]) == 2


def test_hll_grouped_and_partition_invariant(spark):
    df = spark.range(5_000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.col("id").alias("v"))
    a = {(r["g"], r["n_registers_hit"], r["hll_estimate"])
         for r in hll_distinct(df.repartition(11), "v", ["g"]).collect()}
    b = {(r["g"], r["n_registers_hit"], r["hll_estimate"])
         for r in hll_distinct(df.coalesce(1), "v", ["g"]).collect()}
    assert a == b and len(a) == 4
    for g, _hit, est in a:
        assert abs(est - 1250) / 1250 < 0.05, (g, est)


def test_kmv_jaccard_accuracy_and_invariance(spark):
    """Two sets of 4000 values with true Jaccard 1/3 (2000 shared /
    6000 union); k=256 -> stderr ~1/16, assert within 0.12. Result is
    identical under repartitioning (md5 order is data-determined)."""
    from edgar_finance_ontology_spark.operators.sketches import (
        kmv_pairwise_jaccard,
    )

    rows = [("A", i) for i in range(4000)] + \
           [("B", i) for i in range(2000, 6000)]
    df = spark.createDataFrame(rows, "s string, v long")
    r = kmv_pairwise_jaccard(df, "v", "s", k=256).first()
    assert (r["set_a"], r["set_b"]) == ("A", "B")
    assert r["n_merged"] == 256
    assert abs(r["kmv_jaccard"] - 1 / 3) < 0.12
    r2 = kmv_pairwise_jaccard(df.repartition(9), "v", "s", k=256).first()
    assert (r2["n_both"], r2["kmv_jaccard"]) == (r["n_both"], r["kmv_jaccard"])


def test_kmv_small_sets_exact(spark):
    """Sets smaller than k: the merged sample is the full union, so
    the estimate is the EXACT Jaccard."""
    from edgar_finance_ontology_spark.operators.sketches import (
        kmv_pairwise_jaccard,
    )

    rows = [("A", i) for i in range(10)] + [("B", i) for i in range(5, 20)]
    df = spark.createDataFrame(rows, "s string, v long")
    r = kmv_pairwise_jaccard(df, "v", "s", k=256).first()
    assert r["n_merged"] == 20 and r["n_both"] == 5
    assert r["kmv_jaccard"] == 0.25


def test_histogram_quantiles_uniform_and_clamp(spark):
    from edgar_finance_ontology_spark.operators.sketches import (
        histogram_quantiles,
    )

    n = 10_000
    df = spark.range(n).select((F.col("id") / n).alias("v"))
    r = histogram_quantiles(df, "v", lo=0.0, hi=1.0, n_buckets=100,
                            quantiles=(0.5, 0.95)).first()
    assert r["n_rows"] == n
    assert abs(r["p50"] - 0.5) <= 0.01 + 1e-9   # one bucket width
    assert abs(r["p95"] - 0.95) <= 0.01 + 1e-9
    # out-of-range values clamp to edge buckets, never vanish
    oob = spark.createDataFrame([(-5.0,), (99.0,)], "v double")
    r2 = histogram_quantiles(oob, "v", lo=0.0, hi=1.0, n_buckets=10,
                             quantiles=(0.5,)).first()
    assert r2["n_rows"] == 2 and 0.0 < r2["p50"] <= 1.0


def test_histogram_quantiles_grouped_invariant(spark):
    from edgar_finance_ontology_spark.operators.sketches import (
        histogram_quantiles,
    )

    df = spark.range(6000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") / 6000.0).alias("v"))
    a = {tuple(r) for r in histogram_quantiles(
        df.repartition(7), "v", ["g"], 0.0, 1.0, 64).collect()}
    b = {tuple(r) for r in histogram_quantiles(
        df.coalesce(1), "v", ["g"], 0.0, 1.0, 64).collect()}
    assert a == b and len(a) == 3
