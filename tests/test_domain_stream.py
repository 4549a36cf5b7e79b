"""Streamed domain-link-graph maintenance (pages_stream.py): the
sum-merge edge log composes at-least-once file delivery to exactly-once
edge counts, and the maintained graph's PageRank equals the batch
composition on the same accumulated pages."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from edgar_finance_ontology_spark.operators.webgraph import (
    domain_edges,
    domain_pagerank,
    extract_links,
)
from edgar_finance_ontology_spark.streaming.pages_stream import (
    compact_domain_store,
    read_domain_graph,
    read_domain_pagerank,
    stream_domain_edges,
)

TS = dt.datetime(2025, 3, 1)


def _pages_df(spark, rows):
    return spark.createDataFrame(
        [(u, TS, h.encode(), None, "en") for u, h in rows],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    )


def _wave(i):
    # every wave links spokes -> hub; later waves add new spokes
    return [(
        f"https://s{j}.test/p{i}",
        f'<a href="https://hub.test/x{i}">h</a>'
        f'<a href="https://s{(j + 1) % 6}.test/">n</a>',
    ) for j in range(3 * (i + 1))]


def _graph(spark, store):
    return {(r["src"], r["dst"]): r["n_links"]
            for r in read_domain_graph(spark, str(store)).collect()}


def _drain(spark, src, store, ckpt):
    stream_domain_edges(
        spark, str(src), str(store), str(ckpt)
    ).awaitTermination()


def test_streamed_graph_equals_batch(spark, tmp_path):
    src = tmp_path / "pages"
    store, ckpt = tmp_path / "store", tmp_path / "ckpt"
    all_rows = []
    for i in range(2):
        rows = _wave(i)
        all_rows += rows
        _pages_df(spark, rows).write.mode("append").parquet(str(src))
        _drain(spark, src, store, ckpt)
        batch = {
            (r["src"], r["dst"]): r["n_links"]
            for r in domain_edges(
                extract_links(_pages_df(spark, all_rows))).collect()
        }
        assert _graph(spark, store) == batch

    # restart with the same checkpoint: nothing new -> log unchanged
    before = _graph(spark, store)
    _drain(spark, src, store, ckpt)
    assert _graph(spark, store) == before

    # maintained PageRank == batch composition on the union
    streamed = {r["id"]: r["rank_units"]
                for r in read_domain_pagerank(
                    spark, str(store), iters=3).collect()}
    composed = {r["id"]: r["rank_units"]
                for r in domain_pagerank(
                    _pages_df(spark, all_rows), iters=3).collect()}
    assert streamed == composed

    # compaction folds to one generation and changes nothing
    n = compact_domain_store(spark, str(store))
    assert n == len(before)
    assert _graph(spark, store) == before
    log = spark.read.parquet(str(store))
    assert [r["batch_id"] for r in
            log.select("batch_id").distinct().collect()] == [-1]

    # post-compaction drains keep composing
    _pages_df(spark, _wave(2)).write.mode("append").parquet(str(src))
    _drain(spark, src, store, ckpt)
    batch = {
        (r["src"], r["dst"]): r["n_links"]
        for r in domain_edges(extract_links(
            _pages_df(spark, all_rows + _wave(2)))).collect()
    }
    assert _graph(spark, store) == batch


def test_replayed_batch_is_deduped(spark, tmp_path):
    """A crash-replayed micro-batch re-appends rows under the SAME
    batch_id; fold-on-read must count it once."""
    src = tmp_path / "pages"
    store, ckpt = tmp_path / "store", tmp_path / "ckpt"
    rows = _wave(0)
    _pages_df(spark, rows).write.mode("append").parquet(str(src))
    _drain(spark, src, store, ckpt)
    before = _graph(spark, store)
    # simulate the replay: duplicate the batch's log rows verbatim
    log = spark.read.parquet(str(store))
    log.write.mode("append").parquet(str(store))
    assert _graph(spark, store) == before