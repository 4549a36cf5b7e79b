"""Bit-equality of the vectorized farthest-first seed traversal
(operators/similarity._seed_traversal) against the original pure-Python
loops it replaced in round 6 — the seeding feeds every kmeans/PQ-family
oracle, so the replacement must be arithmetically invisible."""

import random

from edgar_finance_ontology_spark.operators.similarity import (
    _seed_traversal,
)


def _reference_traversal(sample, k):
    """The original round-5 implementation, verbatim."""

    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    cents = [sample[0]]
    for _ in range(min(k, len(sample)) - 1):
        best_i, best_d = None, None
        for i, v in enumerate(sample):
            d = min(d2(v, s) for s in cents)
            if best_d is None or d > best_d:
                best_i, best_d = i, d
        cents.append(sample[best_i])
    return cents


def _assert_bit_equal(sample, k):
    got = _seed_traversal([list(v) for v in sample], k)
    want = _reference_traversal([list(v) for v in sample], k)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        # bit equality, not approx: the seeds ARE sample rows, so the
        # traversal must pick identical rows
        assert a == b


def test_random_panels():
    rng = random.Random(7)
    for dim in (1, 3, 64):
        for n in (1, 2, 8, 200):
            sample = [
                [rng.uniform(-5, 5) for _ in range(dim)] for _ in range(n)
            ]
            for k in (1, 2, 8, 17):
                _assert_bit_equal(sample, k)


def test_duplicate_rows_and_ties():
    # duplicates force distance ties -> the first-winner scan decides
    rng = random.Random(11)
    base = [[rng.uniform(-1, 1) for _ in range(4)] for _ in range(10)]
    sample = base + base + [base[0]] * 5
    for k in (2, 5, 25, 40):
        _assert_bit_equal(sample, k)


def test_clustered_blobs():
    rng = random.Random(3)
    sample = []
    for cx in (-10.0, 0.0, 10.0):
        sample += [
            [cx + rng.gauss(0, 0.1), cx + rng.gauss(0, 0.1)]
            for _ in range(50)
        ]
    rng.shuffle(sample)
    _assert_bit_equal(sample, 3)
    _assert_bit_equal(sample, 8)


def test_extreme_values():
    sample = [
        [1e300, -1e300],
        [-1e300, 1e300],
        [0.0, 0.0],
        [1e-300, 1e-300],
        [5e-324, -5e-324],
    ]
    for k in (1, 2, 5):
        _assert_bit_equal(sample, k)
