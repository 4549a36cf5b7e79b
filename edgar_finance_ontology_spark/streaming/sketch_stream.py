"""Streaming sketch maintenance — mergeable-sketch state turned into
rolling-crawl statistics, one append-only parquet log per sketch.

Design: each microbatch appends its own bounded sketch rows; the
reader folds the log into current state and finishes the estimate.
The fold algebra decides the delivery guarantee needed:

  * HLL registers (merge = MAX) and KMV min-sets (merge = set-union →
    k smallest) are associative, commutative and IDEMPOTENT — a batch
    REPLAYED after a crash between the sink append and the
    source-checkpoint commit changes NOTHING. At-least-once file
    delivery composes to an exactly-correct sketch with no
    transactional sink (contrast `stream_incremental_maintenance`,
    which needs url-grain anti-joins for the same guarantee).
  * Histogram bucket counts (merge = SUM) are NOT idempotent — a
    replay would double-count — so that log carries the foreachBatch
    batch_id and the fold drops duplicate (batch_id, group, bucket)
    rows first: batch identity is what turns at-least-once delivery
    into exactly-once here.

Logs grow by a bounded row count per batch (groups×m registers /
sets×k mins / groups×B buckets); the compact_* functions fold a log
back to one generation — pure space reclamation, never a correctness
event (with one documented replay-window constraint for the
histogram, see compact_hist_store).

100-TB posture: the distinct-count state for a 10^12-url crawl is
groups×4096 integer rows, not a url set; the batch-side work is the
same ONE map-side-combined aggregation as each batch sketch.
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
    return _compact(spark, store_dir,
                    lambda df: df.groupBy(*group_cols, "idx")
                                 .agg(F.max("M").alias("M")))


def _compact(spark: SparkSession, store_dir: str, fold) -> int:
    import shutil

    merged = fold(spark.read.parquet(store_dir)).cache()
    try:
        rows = merged.count()
        # two-step: the merged plan reads store_dir, so materialize to a
        # sibling first, then rewrite the store from that generation
        merged.write.mode("overwrite").parquet(store_dir + ".compact")
        spark.read.parquet(store_dir + ".compact") \
            .write.mode("overwrite").parquet(store_dir)
    finally:
        # release the cached generation — repeated compactions would
        # otherwise accumulate pinned blocks for the session lifetime
        merged.unpersist()
    shutil.rmtree(store_dir + ".compact", ignore_errors=True)
    return rows


# ---------------------------------------------------------------------------
# KMV: min-k set union is idempotent — same log contract as HLL


def stream_kmv_sketch(
    spark: SparkSession,
    source_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    schema: str,
    value_col: str,
    set_col: str,
    k: int = 256,
):
    """AvailableNow maintenance of a per-set KMV sketch log. Each
    microbatch appends its own k-min rows; the fold (set-union → k
    smallest) is associative/commutative/IDEMPOTENT, so replays are
    harmless exactly as for HLL registers. State per batch is ≤
    sets×k rows."""
    from ..operators.sketches import kmv_sketch

    stream = spark.readStream.schema(schema).parquet(source_dir)

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        kmv_sketch(batch_df, value_col, set_col, k) \
            .write.mode("append").parquet(store_dir)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_kmv_sketch(spark: SparkSession, store_dir: str,
                    k: int = 256) -> DataFrame:
    """Current per-set k-min sketch from the log — identical to the
    batch `kmv_sketch` over everything ever streamed."""
    from ..operators.sketches import kmv_merge

    return kmv_merge(spark.read.parquet(store_dir), k)


def read_kmv_jaccard(spark: SparkSession, store_dir: str,
                     k: int = 256) -> DataFrame:
    """Pairwise set-overlap estimates straight off the folded log."""
    from ..operators.sketches import kmv_jaccard_from_sketch

    return kmv_jaccard_from_sketch(read_kmv_sketch(spark, store_dir, k), k)


def compact_kmv_store(spark: SparkSession, store_dir: str,
                      k: int = 256) -> int:
    from ..operators.sketches import kmv_merge

    return _compact(spark, store_dir, lambda df: kmv_merge(df, k))


# ---------------------------------------------------------------------------
# Histogram: per-bucket SUM merge is NOT idempotent — the log carries
# batch identity and the fold dedups on it, which turns at-least-once
# file delivery into exactly-once without a transactional sink. A
# batch re-delivered after a crash between the sink append and the
# checkpoint commit re-appends byte-identical rows under the SAME
# batch_id (the source files and foreachBatch epoch are stable), and
# dropDuplicates on (batch_id, group, bucket) discards them.


def stream_hist_counts(
    spark: SparkSession,
    source_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    schema: str,
    value_col: str,
    group_cols: list[str],
    lo: float = 0.0,
    hi: float = 1.0,
    n_buckets: int = 1024,
):
    """AvailableNow maintenance of a per-group bucket-count log.
    State per batch is ≤ groups×n_buckets rows + one batch_id
    column."""
    from ..operators.sketches import histogram_counts

    stream = spark.readStream.schema(schema).parquet(source_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        histogram_counts(batch_df, value_col, group_cols,
                         lo, hi, n_buckets) \
            .withColumn("batch_id", F.lit(batch_id).cast("long")) \
            .write.mode("append").parquet(store_dir)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _merged_hist_counts(spark: SparkSession, store_dir: str,
                        group_cols: list[str]) -> DataFrame:
    log = spark.read.parquet(store_dir)
    deduped = log.dropDuplicates(["batch_id", *group_cols, "bucket"])
    return deduped.groupBy(*group_cols, "bucket") \
        .agg(F.sum("c").alias("c"))


def read_hist_quantiles(
    spark: SparkSession,
    store_dir: str,
    group_cols: list[str],
    lo: float = 0.0,
    hi: float = 1.0,
    n_buckets: int = 1024,
    quantiles: tuple = (0.5, 0.95),
) -> DataFrame:
    """Current quantile estimates — identical to batch
    `histogram_quantiles` over everything ever streamed (each batch
    counted exactly once)."""
    from ..operators.sketches import histogram_quantiles_from_counts

    return histogram_quantiles_from_counts(
        _merged_hist_counts(spark, store_dir, group_cols),
        group_cols, lo, hi, n_buckets, quantiles,
    )


def compact_hist_store(spark: SparkSession, store_dir: str,
                       group_cols: list[str]) -> int:
    """Fold the batch-id'd log to one summed generation under the
    reserved batch_id −1 (one row per (group, bucket), so the
    dedup-on-(batch_id, group, bucket) fold is a no-op over it and
    later batches keep composing).

    CONSTRAINT (unlike the idempotent HLL/KMV compactors): folding
    erases batch identity, so a batch replayed AFTER compaction would
    count twice. Safe exactly when no replay of pre-compaction
    batches is possible: run with no stream active, after the last
    drain's awaitTermination — AvailableNow commits its checkpoint on
    completion, so every folded batch is durably marked processed."""
    def fold(df: DataFrame) -> DataFrame:
        deduped = df.dropDuplicates(["batch_id", *group_cols, "bucket"])
        return (
            deduped.groupBy(*group_cols, "bucket")
            .agg(F.sum("c").alias("c"))
            .withColumn("batch_id", F.lit(-1).cast("long"))
        )

    return _compact(spark, store_dir, fold)


# ---------------------------------------------------------------------------
# Count-min: per-cell SUM — same batch-identity contract as the
# histogram log (a replay would double-count, so the fold dedups on
# (batch_id, depth, cell) first)


def stream_countmin_cells(
    spark: SparkSession,
    source_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    schema: str,
    value_col: str,
    w: int = 1024,
    d: int = 4,
):
    """AvailableNow maintenance of a count-min cell log. State per
    batch is ≤ d×w rows + the batch_id column."""
    from ..operators.sketches import countmin_cells

    stream = spark.readStream.schema(schema).parquet(source_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        countmin_cells(batch_df, value_col, w=w, d=d) \
            .withColumn("batch_id", F.lit(batch_id).cast("long")) \
            .write.mode("append").parquet(store_dir)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_countmin_estimates(
    spark: SparkSession,
    store_dir: str,
    keys: DataFrame,
    key_col: str,
    w: int = 1024,
    d: int = 4,
) -> DataFrame:
    """Point estimates over everything ever streamed — identical to
    batch `countmin_estimate` on the union of all batches (each batch
    summed exactly once via batch-id dedup)."""
    from ..operators.sketches import countmin_estimate

    log = spark.read.parquet(store_dir)
    cells = (
        log.dropDuplicates(["batch_id", "depth", "cell"])
        .groupBy("depth", "cell").agg(F.sum("c").alias("c"))
    )
    return countmin_estimate(cells, keys, key_col, w=w, d=d)


def compact_countmin_store(spark: SparkSession, store_dir: str) -> int:
    """Fold the cell log to one generation under batch_id −1. Same
    replay-window constraint as compact_hist_store: run only after a
    completed AvailableNow drain (SUM is not idempotent)."""
    def fold(df: DataFrame) -> DataFrame:
        return (
            df.dropDuplicates(["batch_id", "depth", "cell"])
            .groupBy("depth", "cell").agg(F.sum("c").alias("c"))
            .withColumn("batch_id", F.lit(-1).cast("long"))
        )

    return _compact(spark, store_dir, fold)
