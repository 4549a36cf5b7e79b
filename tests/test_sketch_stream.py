"""Streaming sketch maintenance (streaming/sketch_stream.py): the
mergeable-sketch property as exactly-correct rolling-crawl statistics.

What is under test is the CLAIM in the module doc: the idempotent
folds (HLL max-merge, KMV min-k union) make an append-only log +
at-least-once file delivery compose to the exact batch result with no
transactional sink — replays and compaction change nothing; and the
NON-idempotent histogram sum-merge gets the same guarantee from
batch-id dedup instead.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from edgar_finance_ontology_spark.operators.sketches import (
    hll_distinct,
    histogram_quantiles,
    kmv_pairwise_jaccard,
)
from edgar_finance_ontology_spark.streaming.sketch_stream import (
    compact_hist_store,
    compact_hll_store,
    compact_kmv_store,
    read_hist_quantiles,
    read_hll_estimates,
    read_kmv_jaccard,
    stream_hist_counts,
    stream_hll_distinct,
    stream_kmv_sketch,
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


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_kmv_stream_equals_batch_and_replay_is_noop(spark, tmp_path):
    """Two drains of per-set value files; the folded sketch's pairwise
    Jaccard must equal the batch estimate over the union, and a
    re-delivered sketch append must change nothing (min-k set union is
    idempotent)."""
    from edgar_finance_ontology_spark.operators.sketches import kmv_sketch

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    k = 64

    def vals(set_name, lo, hi):
        return spark.range(lo, hi).select(
            F.lit(set_name).alias("s"), F.concat(F.lit("v"), F.col("id")).alias("v")
        )

    b1 = vals("a", 0, 800).unionByName(vals("b", 400, 1_200))
    b1.write.mode("append").parquet(src)
    q = stream_kmv_sketch(spark, src, store, ckpt, "s string, v string",
                          "v", "s", k)
    q.awaitTermination()

    b2 = vals("a", 600, 1_000).unionByName(vals("b", 0, 200))
    b2.write.mode("append").parquet(src)
    q = stream_kmv_sketch(spark, src, store, ckpt, "s string, v string",
                          "v", "s", k)
    q.awaitTermination()

    everything = b1.unionByName(b2)
    exp = _rows(kmv_pairwise_jaccard(everything, "v", "s", k))
    assert _rows(read_kmv_jaccard(spark, store, k)) == exp

    # crash-replay: the same batch's sketch rows appended again
    kmv_sketch(b2, "v", "s", k).write.mode("append").parquet(store)
    assert _rows(read_kmv_jaccard(spark, store, k)) == exp

    # compaction: pure space reclamation
    before_rows = spark.read.parquet(store).count()
    kept = compact_kmv_store(spark, store, k)
    assert kept < before_rows
    assert _rows(read_kmv_jaccard(spark, store, k)) == exp


def test_hist_stream_equals_batch_and_batchid_dedups_replay(spark, tmp_path):
    """Sum-merge is NOT idempotent, so the log carries batch ids and
    the fold dedups on them: a byte-identical re-append under the same
    batch_id (= the crash-replay shape) must not double-count, while a
    genuinely NEW batch must."""
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    kw = dict(lo=0.0, hi=100.0, n_buckets=50, quantiles=(0.5, 0.95))

    def vals(grp, lo, hi):
        return spark.range(lo, hi).select(
            F.lit(grp).alias("grp"), (F.col("id") % 100).cast("double").alias("v")
        )

    b1 = vals("a", 0, 5_000)
    b1.write.mode("append").parquet(src)
    q = stream_hist_counts(spark, src, store, ckpt, "grp string, v double",
                           "v", ["grp"], kw["lo"], kw["hi"], kw["n_buckets"])
    q.awaitTermination()
    b2 = vals("a", 5_000, 7_000).unionByName(vals("b", 0, 1_000))
    b2.write.mode("append").parquet(src)
    q = stream_hist_counts(spark, src, store, ckpt, "grp string, v double",
                           "v", ["grp"], kw["lo"], kw["hi"], kw["n_buckets"])
    q.awaitTermination()

    everything = b1.unionByName(b2)
    exp = _rows(histogram_quantiles(everything, "v", ["grp"], **kw))
    got = _rows(read_hist_quantiles(spark, store, ["grp"], kw["lo"],
                                    kw["hi"], kw["n_buckets"], kw["quantiles"]))
    assert got == exp

    # crash-replay: batch 1's count rows re-appended under batch_id 1
    from edgar_finance_ontology_spark.operators.sketches import (
        histogram_counts,
    )
    replay = histogram_counts(b2, "v", ["grp"], kw["lo"], kw["hi"],
                              kw["n_buckets"]) \
        .withColumn("batch_id", F.lit(1).cast("long"))
    replay.write.mode("append").parquet(store)
    got = _rows(read_hist_quantiles(spark, store, ["grp"], kw["lo"],
                                    kw["hi"], kw["n_buckets"], kw["quantiles"]))
    assert got == exp

    # exact-count sanity straight off the fold: every row counted once
    from edgar_finance_ontology_spark.streaming.sketch_stream import (
        _merged_hist_counts,
    )
    total = _merged_hist_counts(spark, store, ["grp"]) \
        .agg(F.sum("c")).collect()[0][0]
    assert total == everything.count()

    # compaction folds to one generation; estimates unchanged and a
    # post-compaction batch keeps composing
    kept = compact_hist_store(spark, store, ["grp"])
    assert kept == spark.read.parquet(store).count()
    got = _rows(read_hist_quantiles(spark, store, ["grp"], kw["lo"],
                                    kw["hi"], kw["n_buckets"], kw["quantiles"]))
    assert got == exp
    b3 = vals("b", 1_000, 3_000)
    b3.write.mode("append").parquet(src)
    q = stream_hist_counts(spark, src, store, ckpt, "grp string, v double",
                           "v", ["grp"], kw["lo"], kw["hi"], kw["n_buckets"])
    q.awaitTermination()
    exp3 = _rows(histogram_quantiles(everything.unionByName(b3), "v",
                                     ["grp"], **kw))
    got3 = _rows(read_hist_quantiles(spark, store, ["grp"], kw["lo"],
                                     kw["hi"], kw["n_buckets"], kw["quantiles"]))
    assert got3 == exp3


def test_countmin_stream_equals_batch_and_batchid_dedups_replay(
        spark, tmp_path):
    """The count-min cell log composes like the histogram log (SUM +
    batch-id dedup): streamed estimates equal the batch sketch over
    everything streamed, a crash-replay re-append under the same
    batch_id changes nothing, and compaction is pure space
    reclamation."""
    from edgar_finance_ontology_spark.operators.sketches import (
        countmin_cells, countmin_estimate,
    )
    from edgar_finance_ontology_spark.streaming.sketch_stream import (
        compact_countmin_store,
        read_countmin_estimates,
        stream_countmin_cells,
    )

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    kw = dict(w=128, d=3)

    def vals(lo, hi, mod):
        return spark.range(lo, hi).select(
            F.concat(F.lit("k"), (F.col("id") % mod).cast("string"))
            .alias("v"))

    b1, b2 = vals(0, 3_000, 17), vals(0, 2_000, 29)
    b1.write.mode("append").parquet(src)
    q = stream_countmin_cells(spark, src, store, ckpt, "v string", "v",
                              **kw)
    q.awaitTermination()
    b2.write.mode("append").parquet(src)
    q = stream_countmin_cells(spark, src, store, ckpt, "v string", "v",
                              **kw)
    q.awaitTermination()

    everything = b1.unionByName(b2)
    keys = everything.select("v").distinct()

    def rows(df):
        return sorted(map(tuple, df.collect()))

    exp = rows(countmin_estimate(
        countmin_cells(everything, "v", **kw), keys, "v", **kw))
    got = rows(read_countmin_estimates(spark, store, keys, "v", **kw))
    assert got == exp

    # crash-replay: batch 1's cells re-appended under its batch_id
    countmin_cells(b2, "v", **kw) \
        .withColumn("batch_id", F.lit(1).cast("long")) \
        .write.mode("append").parquet(store)
    assert rows(read_countmin_estimates(spark, store, keys, "v",
                                        **kw)) == exp

    kept = compact_countmin_store(spark, store)
    assert kept == spark.read.parquet(store).count()
    assert rows(read_countmin_estimates(spark, store, keys, "v",
                                        **kw)) == exp

    # a post-compaction batch keeps composing
    b3 = vals(0, 1_000, 5)
    b3.write.mode("append").parquet(src)
    q = stream_countmin_cells(spark, src, store, ckpt, "v string", "v",
                              **kw)
    q.awaitTermination()
    all3 = everything.unionByName(b3)
    keys3 = all3.select("v").distinct()
    exp3 = rows(countmin_estimate(
        countmin_cells(all3, "v", **kw), keys3, "v", **kw))
    assert rows(read_countmin_estimates(spark, store, keys3, "v",
                                        **kw)) == exp3
