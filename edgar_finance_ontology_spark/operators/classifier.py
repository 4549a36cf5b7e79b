"""Hashed-feature linear classifier INFERENCE as a column-native plan
— the fastText-pattern quality gate (CCNet "looks like Wikipedia"):
a tiny trained model applied to every document of the corpus.

The committed default model (models/quality_clf_256.npz, trained
reproducibly by scripts/make_quality_clf.py) is a logistic regression
on 256 md5-hashed unigram-PRESENCE features distilling the repo's
quality_scores rubric. Inference never leaves the JVM:

  tokens -> md5 bucket (the engine-portable hash used by
  stratified_sample) -> distinct (doc, bucket) -> broadcast join
  against the 256-row weight table -> one DECIMAL margin sum per doc.

Portability contract: the margin is a DECIMAL(38,12) sum of weight
literals (associative — partition/order-invariant and identical in
DuckDB); the classifier outputs the MARGIN and the sign prediction,
never a sigmoid (exp is a transcendental, the known 1-ulp
cross-engine hash killer — monotone in the margin anyway).

100-TB posture: weight table is 256 rows broadcast once; the only
shuffle is the per-doc margin aggregation, map-side combined; docs
with no tokens fall back to the bias via the left join rebuild.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col

_DEFAULT_MODEL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "models", "quality_clf_256.npz",
)


def load_linear_model(path: str | None = None) -> tuple[list[float], float]:
    """(weights, bias) from a .npz with fields w (float64[D]), b."""
    import numpy as np

    with np.load(path or _DEFAULT_MODEL) as m:
        return [float(x) for x in m["w"]], float(m["b"])


def hash_bucket_col(token, d: int):
    """Portable feature hash: first 8 md5 hex chars -> int -> mod d
    (identical in DuckDB: conv/from_hex semantics replayed via the
    same expression stratified_sample's oracle uses)."""
    return (
        F.conv(F.substring(F.md5(token), 1, 8), 16, 10)
        .cast("long") % d
    ).cast("int")


def classifier_scores(
    df: DataFrame,
    weights: list[float] | None = None,
    bias: float | None = None,
    model_path: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_feature_buckets, margin, pred) for every document."""
    if weights is None or bias is None:
        weights, bias = load_linear_model(model_path)
    d = len(weights)
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "bucket int, w double"
    )
    feats = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens_col(F.col(text_col))).alias("token"),
        )
        .where(F.col("token") != "")
        .select("id", hash_bucket_col(F.col("token"), d).alias("bucket"))
        .distinct()
    )
    margins = (
        feats.join(F.broadcast(wdf), "bucket")
        .groupBy("id")
        .agg(
            F.count("*").cast("int").alias("n_feature_buckets"),
            F.sum(F.col("w").cast("decimal(38,12)")).alias("m"),
        )
    )
    base = df.select(F.col(id_col).alias("id"))
    bias_d = F.lit(bias).cast("decimal(38,12)")
    margin = F.coalesce(F.col("m"), F.lit(0).cast("decimal(38,12)")) + bias_d
    return base.join(margins, "id", "left").select(
        "id",
        F.coalesce("n_feature_buckets", F.lit(0)).alias("n_feature_buckets"),
        F.round(margin.cast("double"), 6).alias("margin"),
        (margin > 0).alias("pred"),
    )
