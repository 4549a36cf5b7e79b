"""Streaming cardinality maintenance — the mergeable-sketch property
(HLL registers merge by MAX: associative, commutative, IDEMPOTENT)
turned into a rolling-crawl counter.

Design: each microbatch appends its own (group, idx, M) register rows
to an append-only parquet log; the reader max-folds the log into the
current registers and finishes the estimate. Because max-merge is
idempotent, a batch REPLAYED after a crash between the sink append
and the source-checkpoint commit changes NOTHING — at-least-once
file delivery composes to an exactly-correct sketch with no
transactional sink required (contrast `stream_incremental_maintenance`,
which needs url-grain anti-joins for the same guarantee). The log
grows by ≤ groups×m rows per batch; `compact_hll_store` folds it back
to one generation when wanted — compaction is an optimization, never
a correctness event.

100-TB posture: the distinct-count state for a 10^12-url crawl is
groups×4096 integer rows, not a url set; the batch-side work is the
same ONE map-side-combined aggregation as the batch sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _merged_registers(spark: SparkSession, store_dir: str,
                      group_cols: list[str]) -> DataFrame:
    regs = spark.read.parquet(store_dir)
    return regs.groupBy(*group_cols, "idx").agg(F.max("M").alias("M"))


def stream_hll_distinct(
    spark: SparkSession,
    source_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    schema: str,
    value_col: str,
    group_cols: list[str],
    p: int = 12,
):
    """AvailableNow maintenance pass: fold any new source files into
    the register log. Returns the StreamingQuery (awaitTermination to
    drain)."""
    from ..operators.sketches import hll_registers

    stream = spark.readStream.schema(schema).parquet(source_dir)

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hll_registers(batch_df, value_col, group_cols, p) \
            .write.mode("append").parquet(store_dir)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_hll_estimates(spark: SparkSession, store_dir: str,
                       group_cols: list[str], p: int = 12) -> DataFrame:
    """Current estimates from the register log — identical to the
    batch `hll_distinct` over everything ever streamed (register
    max-merge loses nothing)."""
    from ..operators.sketches import hll_estimate_from_registers

    return hll_estimate_from_registers(
        _merged_registers(spark, store_dir, group_cols), group_cols, p
    )


def compact_hll_store(spark: SparkSession, store_dir: str,
                      group_cols: list[str]) -> int:
    """Fold the append-only log back to one generation (estimates are
    unchanged — pure space reclamation). Returns rows kept."""
    import shutil

    merged = _merged_registers(spark, store_dir, group_cols)
    rows = merged.cache().count()
    # two-step: the merged plan reads store_dir, so materialize to a
    # sibling first, then rewrite the store from that generation
    merged.write.mode("overwrite").parquet(store_dir + ".compact")
    spark.read.parquet(store_dir + ".compact") \
        .write.mode("overwrite").parquet(store_dir)
    shutil.rmtree(store_dir + ".compact", ignore_errors=True)
    return rows
