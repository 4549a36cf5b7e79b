"""Streaming HLL maintenance (streaming/sketch_stream.py): the
mergeable-sketch property as an exactly-correct rolling-crawl counter.

What is under test is the CLAIM in the module doc: because register
max-merge is associative/commutative/IDEMPOTENT, an append-only
register log + at-least-once file delivery composes to the exact same
estimate as the batch sketch over everything ever streamed — no
transactional sink, and replays/compaction change nothing.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from edgar_finance_ontology_spark.operators.sketches import hll_distinct
from edgar_finance_ontology_spark.streaming.sketch_stream import (
    compact_hll_store,
    read_hll_estimates,
    stream_hll_distinct,
)

SCHEMA = "grp string, v long"


def _batch(spark, lo, hi, grp="a"):
    return spark.range(lo, hi).select(
        F.lit(grp).alias("grp"), F.col("id").alias("v")
    )


def _estimates(spark, store):
    return {
        r["grp"]: (r["n_registers_hit"], r["hll_estimate"])
        for r in read_hll_estimates(spark, store, ["grp"]).collect()
    }


def _drain(spark, src, store, ckpt):
    q = stream_hll_distinct(
        spark, src, store, ckpt, SCHEMA, "v", ["grp"]
    )
    q.awaitTermination()


def test_stream_equals_batch_across_drains(spark, tmp_path):
    """Two drains over overlapping per-group value ranges: the folded
    log must equal the one-shot batch sketch over the union — same
    registers hit, same estimate, per group."""
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    b1 = _batch(spark, 0, 4_000, "a").unionByName(_batch(spark, 0, 500, "b"))
    b1.write.mode("append").parquet(src)
    _drain(spark, src, store, ckpt)

    # second file: overlaps group a (2k-6k), extends group b
    b2 = _batch(spark, 2_000, 6_000, "a").unionByName(
        _batch(spark, 250, 1_500, "b")
    )
    b2.write.mode("append").parquet(src)
    _drain(spark, src, store, ckpt)

    everything = b1.unionByName(b2)
    exp = {
        r["grp"]: (r["n_registers_hit"], r["hll_estimate"])
        for r in hll_distinct(everything, "v", ["grp"]).collect()
    }
    assert _estimates(spark, store) == exp
    # sanity: the estimate is a real cardinality, not a row count
    assert abs(_estimates(spark, store)["a"][1] - 6_000) / 6_000 < 0.05


def test_replayed_batch_changes_nothing(spark, tmp_path):
    """Crash between the sink append and the checkpoint commit =>
    the batch's registers are appended AGAIN on restart. Idempotent
    max-merge: estimates must be bit-identical."""
    from edgar_finance_ontology_spark.operators.sketches import (
        hll_registers,
    )

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    b1 = _batch(spark, 0, 3_000, "a")
    b1.write.mode("append").parquet(src)
    _drain(spark, src, store, ckpt)
    before = _estimates(spark, store)

    # simulate the redelivered batch: append its register rows directly
    hll_registers(b1, "v", ["grp"]).write.mode("append").parquet(store)
    assert _estimates(spark, store) == before

    # and a genuine restart with the same checkpoint reprocesses nothing
    _drain(spark, src, store, ckpt)
    assert _estimates(spark, store) == before


def test_compaction_is_pure_space_reclamation(spark, tmp_path):
    """compact_hll_store folds generations to one; estimates are
    unchanged and the stored row count shrinks to distinct
    (grp, idx)."""
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    for lo, hi in ((0, 2_000), (1_000, 3_000), (2_500, 4_000)):
        _batch(spark, lo, hi, "a").write.mode("append").parquet(src)
        _drain(spark, src, store, ckpt)

    before = _estimates(spark, store)
    raw_rows = spark.read.parquet(store).count()
    kept = compact_hll_store(spark, store, ["grp"])
    assert kept == spark.read.parquet(store).count()
    assert kept < raw_rows  # generations actually folded
    assert _estimates(spark, store) == before
    assert not os.path.exists(store + ".compact")  # temp generation gone
