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
    # regression: values whose raw bucket index exceeds int32 (and
    # ±Inf / NaN) must clamp, not abort the job with an ANSI
    # CAST_OVERFLOW — the index was cast to int BEFORE clamping
    dirty = spark.createDataFrame(
        [(3.0e6,), (float("inf"),), (float("-inf"),), (float("nan"),),
         (0.5,)], "v double")
    r3 = histogram_quantiles(dirty, "v", lo=0.0, hi=1.0, n_buckets=1024,
                             quantiles=(0.5,)).first()
    assert r3["n_rows"] == 5 and 0.0 < r3["p50"] <= 1.0


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


def test_countmin_overestimates_and_small_w_collisions(spark):
    """Count-min never under-counts: estimate >= exact for every key,
    even at a tiny width where collisions are guaranteed."""
    from edgar_finance_ontology_spark.operators.sketches import (
        countmin_cells, countmin_estimate,
    )
    import random

    rng = random.Random(3)
    vals = [f"k{rng.randrange(40)}" for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    exact = {}
    for v in vals:
        exact[v] = exact.get(v, 0) + 1
    keys = spark.createDataFrame([(k,) for k in exact], "v string")

    for w in (8, 1024):  # w=8 forces collisions among 40 keys
        cells = countmin_cells(df, "v", w=w, d=4)
        est = {r["v"]: r["cm_estimate"]
               for r in countmin_estimate(cells, keys, "v", w=w, d=4)
               .collect()}
        assert set(est) == set(exact)
        for k, n in exact.items():
            assert est[k] >= n, (w, k)
    # at the wide setting the min-over-depths is exact for most keys
    wide = {r["v"]: r["cm_estimate"]
            for r in countmin_estimate(
                countmin_cells(df, "v", w=1024, d=4), keys, "v",
                w=1024, d=4).collect()}
    assert sum(wide[k] == exact[k] for k in exact) >= len(exact) - 2


def test_countmin_merge_algebra_and_partition_invariance(spark):
    """Cell tables of two slices SUM-merge to the cell table of the
    union, and the sketch is identical at any partitioning."""
    from pyspark.sql import functions as F

    from edgar_finance_ontology_spark.operators.sketches import (
        countmin_cells,
    )

    a = spark.createDataFrame([(f"x{i % 7}",) for i in range(300)],
                              "v string")
    b = spark.createDataFrame([(f"x{i % 11}",) for i in range(200)],
                              "v string")
    both = a.unionByName(b)

    merged = (
        countmin_cells(a, "v", w=64, d=3)
        .unionByName(countmin_cells(b, "v", w=64, d=3))
        .groupBy("depth", "cell").agg(F.sum("c").alias("c"))
    )
    direct = countmin_cells(both, "v", w=64, d=3)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))

    repart = countmin_cells(both.repartition(13), "v", w=64, d=3)
    assert sorted(map(tuple, repart.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_countmin_heavy_hitters_finds_true_heavies(spark):
    """A value with overwhelming count lands in the hash-sample and is
    reported with an over-count-only estimate."""
    from edgar_finance_ontology_spark.operators.sketches import (
        countmin_heavy_hitters,
    )

    rows = [("heavy",)] * 500 + [(f"rare{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, "v string")
    got = {r["v"]: r["cm_estimate"]
           for r in countmin_heavy_hitters(
               df, "v", min_count=100, w=512, d=4,
               candidate_rate=0.9).collect()}
    assert "heavy" in got and got["heavy"] >= 500
    assert all(k == "heavy" for k in got)


def test_countmin_cells_single_mapside_combined_exchange(spark):
    """The sketch build is ONE hash exchange whose upstream partial
    aggregation bounds per-partition output at d*w rows (map-side
    combine on (depth, cell))."""
    from edgar_finance_ontology_spark.operators.sketches import (
        countmin_cells,
    )

    df = spark.createDataFrame([(f"v{i % 9}",) for i in range(100)],
                               "v string")
    qe = countmin_cells(df, "v", w=64, d=4)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    # partial-then-final: two HashAggregates around the exchange
    assert plan.count("HashAggregate") >= 2, plan
