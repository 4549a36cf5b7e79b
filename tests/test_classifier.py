"""Hashed-feature quality classifier inference
(operators/classifier.py) with the committed distilled model."""

from __future__ import annotations

from edgar_finance_ontology_spark.operators.classifier import (
    classifier_scores, load_linear_model,
)


def test_committed_model_separates_prose_from_garbage(spark):
    """The distilled model must agree with its teacher rubric on
    clear-cut cases: normal prose positive, punctuation soup
    negative."""
    rows = [
        (1, "the quarterly report shows that revenue of the company "
            "grew in a healthy and sustainable manner and the board "
            "is confident in the outlook for the coming fiscal year "
            "with stable margins and a strong balance sheet position"),
        (2, "!!!! ???? ;;;; @@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( "
            ")))) ++++ ==== ~~~~ |||| \\\\ //// <<<< >>>>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in classifier_scores(df).collect()}
    assert got[1]["pred"] is True and got[1]["margin"] > 0
    assert got[2]["margin"] < got[1]["margin"]


def test_empty_doc_scores_bias_only(spark):
    _, bias = load_linear_model()
    df = spark.createDataFrame(
        [(1, ""), (2, "   ")], "doc_id long, text string")
    got = {r["id"]: r for r in classifier_scores(df).collect()}
    for r in got.values():
        assert r["n_feature_buckets"] == 0
        assert abs(r["margin"] - round(bias, 6)) < 1e-9


def test_margins_partition_invariant(spark):
    """Decimal margin sums: bit-identical output under any input
    partitioning."""
    rows = [(i, f"some document number {i} with the usual words and "
             f"token_{i} sprinkled in") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = [tuple(r) for r in
         classifier_scores(df.repartition(7)).orderBy("id").collect()]
    b = [tuple(r) for r in
         classifier_scores(df.coalesce(1)).orderBy("id").collect()]
    assert a == b


def test_custom_weights_override(spark):
    """Explicit weights/bias bypass the committed model — a single
    hot bucket drives the decision."""
    from pyspark.sql import functions as F

    from edgar_finance_ontology_spark.operators.classifier import (
        hash_bucket_col,
    )

    df = spark.createDataFrame(
        [(1, "trigger"), (2, "other")], "doc_id long, text string")
    b = df.select(
        hash_bucket_col(F.lit("trigger"), 8).alias("b")).first()["b"]
    w = [0.0] * 8
    w[b] = 5.0
    got = {r["id"]: r for r in
           classifier_scores(df, weights=w, bias=-1.0).collect()}
    assert got[1]["pred"] is True and got[1]["margin"] == 4.0
    assert got[2]["pred"] is False and got[2]["margin"] == -1.0
