"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exactness baseline; one broadcast of
  the (small) query side, JVM-native dot products via zip_with +
  aggregate (no Python in the loop).
* cell-restricted top-k — the IVF-style scale path: search only within
  the candidate's coarse cell (here the `label` column stands in for a
  k-means cell id; at 10^12 scale the cell id comes from a trained
  coarse quantizer and the same plan applies: co-partition by cell,
  join within cell).

Outputs avoid raw floats where rank order suffices (engine-portable);
similarity is exposed rounded to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, neighbor_id, cos) — top-k cosine neighbors for
    each query vector (excluding self), deterministic tie-break by
    neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("ev"),
    )
    j = e.crossJoin(F.broadcast(q)).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    j = j.withColumn("cos", cosine_col(F.col("qv"), F.col("ev")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.round("cos", 6).alias("cos"))
    )


def cell_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style: neighbors restricted to the query's coarse cell.
    The join is on the cell id — co-partitionable, no cross join."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.col(cell_col).alias("cell"),
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("ev"),
        F.col(cell_col).alias("cell"),
    )
    j = e.join(F.broadcast(q), "cell").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    j = j.withColumn("cos", cosine_col(F.col("qv"), F.col("ev")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cell", "rank", "neighbor_id",
                F.round("cos", 6).alias("cos"))
    )
