"""Adaptive parallelism for per-row Python (Arrow) mapper stages.

A parquet file is parallelizable only down to its ROW GROUPS: byte-range
splits below one row group all resolve to the same task, so a
single-row-group input runs every narrow stage — including expensive
mapInPandas kernels — on ONE core regardless of
spark.sql.files.maxPartitionBytes (guide §6: split sizing; this is the
case split sizing cannot reach). The bench testdata tables are exactly
that shape, and at real scale a freshly contracted frame (a dimension,
a filtered slice) can be too.

`spread_small_input` repartitions a frame up to the session's default
parallelism ONLY when its planned partition count is lower — on a
cluster-scale scan (thousands of splits) it is a no-op, so it is not a
local-mode tune: it is "give a narrow Python stage at least as many
tasks as cores" with the exchange cost bounded by the small inputs
that trigger it. Round-robin repartition keeps Spark's
sort-before-repartition retry determinism (SPARK-23207); every
consumer of these mappers is partition-invariant (distinct / min / sum
aggregations), which the operator oracles pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    want = min_parts or df.sparkSession.sparkContext.defaultParallelism
    try:
        have = df.rdd.getNumPartitions()
    except Exception:
        return df
    if have < want:
        return df.repartition(want)
    return df
