"""kmeans_fit_multi (the fused multi-subspace Lloyd fit, round 6) must
be bit-equal to the per-space kmeans_fit calls it replaces — the PQ /
IVFADC oracles replay those fits exactly, so any drift is an oracle
break."""

import pytest
from pyspark.sql import functions as F

from edgar_finance_ontology_spark.operators.similarity import (
    kmeans_fit, kmeans_fit_multi,
)


@pytest.fixture(scope="module")
def vecs(spark):
    import random

    rng = random.Random(42)
    rows = [
        (i, [rng.uniform(-3, 3) for _ in range(8)]) for i in range(300)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_multi_equals_per_space_fits(vecs):
    spaces = [(1, 8), (1, 4), (5, 4)]
    multi = kmeans_fit_multi(vecs, spaces, k=4, iters=2, seed_sample=128)
    assert multi is not None
    singles = [
        kmeans_fit(
            vecs.select(
                "vec_id",
                F.slice("embedding", start, dim).alias("embedding"),
            ),
            k=4, iters=2, seed_sample=128,
        )
        for start, dim in spaces
    ]
    assert multi == singles  # bit equality, not approx


def test_multi_partition_invariant(vecs):
    a = kmeans_fit_multi(vecs.repartition(7), [(1, 4), (5, 4)],
                         k=3, iters=2, seed_sample=64)
    b = kmeans_fit_multi(vecs.coalesce(1), [(1, 4), (5, 4)],
                         k=3, iters=2, seed_sample=64)
    assert a == b


def test_ragged_sample_falls_back(spark):
    rows = [(0, [1.0, 2.0, 3.0, 4.0]), (1, [1.0, 2.0]), (2, [0.0] * 4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert kmeans_fit_multi(df, [(1, 2), (3, 2)], k=2, iters=1) is None


def test_out_of_range_space_falls_back(vecs):
    assert kmeans_fit_multi(vecs, [(7, 4)], k=2, iters=1) is None
    assert kmeans_fit_multi(vecs, [(0, 4)], k=2, iters=1) is None
