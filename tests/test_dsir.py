"""DSIR importance resampling (operators/dsir.py) — selection
semantics, integer-contract partition invariance, and the
derandomized Gumbel sampler."""

from __future__ import annotations

from edgar_finance_ontology_spark.operators.dsir import (
    dsir_gumbel_sample, dsir_select_topk, dsir_weights,
    hashed_ngram_features,
)


def _corpora(spark):
    """Target = finance-speak; raw pool = 3 finance-like docs, 3
    noise docs, 1 empty doc."""
    target = spark.createDataFrame(
        [(100 + i,
          "revenue profit margin cash flow revenue profit guidance")
         for i in range(4)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            # finance-like: share target unigrams AND bigrams, so the
            # importance weight is clearly positive
            (0, "revenue profit margin cash flow revenue profit"),
            (1, "profit margin cash flow revenue profit guidance"),
            (2, "cash flow revenue profit margin revenue guidance"),
            (3, "zebra quantum pickle umbrella vortex lantern"),
            (4, "glacier mosaic trombone whisker nebula parsnip"),
            (5, "bicycle thunder origami walrus chimney saffron"),
            (6, ""),
        ],
        "doc_id long, text string",
    )
    return raw, target


def test_dsir_prefers_target_like_docs(spark):
    raw, target = _corpora(spark)
    w = {r["id"]: r for r in dsir_weights(raw, target).collect()}
    assert set(w) == {0, 1, 2, 3, 4, 5, 6}
    fin = [w[i]["weight_mb"] for i in (0, 1, 2)]
    noise = [w[i]["weight_mb"] for i in (3, 4, 5)]
    # noise strictly negative < empty-doc 0 (zero evidence) < finance
    assert min(fin) > 0 > max(noise)
    assert w[6]["n_feats"] == 0 and w[6]["weight_mb"] == 0
    top = dsir_select_topk(raw, target, k=3).collect()
    assert [r["rank"] for r in top] == [1, 2, 3]
    assert {r["id"] for r in top} == {0, 1, 2}


def test_dsir_weight_mb_partition_invariant(spark):
    """The selection score is an integer sum of integer λ — bit-equal
    under any partitioning (the property the double `weight` column
    explicitly does NOT promise)."""
    raw, target = _corpora(spark)
    a = {(r["id"], r["weight_mb"])
         for r in dsir_weights(raw.repartition(7), target).collect()}
    b = {(r["id"], r["weight_mb"])
         for r in dsir_weights(raw.coalesce(1),
                               target.repartition(5)).collect()}
    assert a == b


def test_hashed_features_unigrams_and_bigrams(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    n = (hashed_ngram_features(df)
         .agg({"n": "sum"}).first()[0])
    # 3 unigrams + 2 bigrams
    assert n == 5
    one = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    assert hashed_ngram_features(one).agg({"n": "sum"}).first()[0] == 1


def test_gumbel_sample_reproducible_and_temperature_limit(spark):
    raw, target = _corpora(spark)
    s1 = [(r["rank"], r["id"])
          for r in dsir_gumbel_sample(raw, target, k=3, seed="s").collect()]
    s2 = [(r["rank"], r["id"])
          for r in dsir_gumbel_sample(raw, target, k=3, seed="s").collect()]
    assert s1 == s2  # derandomized: same seed, same draw
    # temperature -> 0 recovers the deterministic top-k id set
    cold = dsir_gumbel_sample(raw, target, k=3, temperature=1e-9,
                              seed="s").collect()
    assert {r["id"] for r in cold} == {0, 1, 2}
