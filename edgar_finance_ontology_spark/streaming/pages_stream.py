"""Structured Streaming skin over the batch stage functions.

The reference is a per-fiscal-year batch snapshot (SURVEY.md §2.9), so
streaming is an incremental-processing skin, not a semantic change:
the same extraction/parse transformations run under
Trigger.AvailableNow over a file-backed pages table (the stand-in for
an Iceberg streaming scan), appending parsed fact records exactly-once
per input file via the checkpoint.

Also provides the late-data pattern the events surface needs:
watermarked sliding-window aggregation over an event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extraction import with_extracted_text
from ..plans.web_pipeline import parse_fact_records
from ..sources.schemas import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, pages_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )


def stream_facts(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """pages parquet dir -> extracted fact records, incrementally.
    Returns the StreamingQuery (AvailableNow: drains what exists, then
    stops; re-running picks up only new files — batch-incremental
    resume, the streaming twin of plans/lineage.py)."""
    pages = read_pages_stream(spark, pages_dir)
    facts = parse_fact_records(with_extracted_text(pages))
    return (
        facts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked (late-data-tolerant) windowed aggregation:
    (window, event_type) -> count + value sum."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type", "n", "total_value",
        )
    )


def stateful_session_counts(
    events_stream: DataFrame,
    gap_sec: int = 1800,
):
    """Custom stateful operator (applyInPandasWithState): per-user
    session counting with explicit GroupState carried across
    micro-batches — the Structured-Streaming twin of the batch
    sessionizer (queries.q_sessionize).

    State: (last_ts epoch-seconds, sessions, events). A new session
    starts when the gap to the previous event exceeds gap_sec. Emits
    one row per (user, trigger) with running totals.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        (user_id,) = key
        if state.exists:
            last_ts, sessions, events = state.get
        else:
            last_ts, sessions, events = None, 0, 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts")
            for ts in pdf["ts"]:
                t = int(ts.timestamp())
                if last_ts is None or t - last_ts > gap_sec:
                    sessions += 1
                events += 1
                last_ts = t
        state.update((last_ts, sessions, events))
        yield pd.DataFrame(
            {"user": [user_id], "sessions": [sessions], "events": [events]}
        )

    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType="user long, sessions long, events long",
            stateStructType="last_ts long, sessions long, events long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_dedup_exact(
    pages_stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup: keep the first-seen page per content hash
    within the watermark horizon. dropDuplicatesWithinWatermark bounds
    the dedup state — at 10^12 pages an unbounded dedup state is
    impossible, so the horizon IS the operator's contract (re-crawls
    newer than the horizon dedup; a year-later duplicate re-emits and
    is handled by the batch dedup family instead)."""
    keyed = pages_stream.withColumn(
        "content_md5",
        F.md5(F.coalesce(F.col("text"), F.col("html").cast("string"))),
    )
    return (
        keyed.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_md5"])
    )


def stream_url_dedup(
    pages_stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming URL-level dedup at ingest: first capture per CANONICAL
    url (functions/urls.py — tracking-param variants, www/port/case
    noise, recrawl storms collapse) within the watermark horizon.
    Canonicalization is a pure map, so the only state is the bounded
    key set dropDuplicatesWithinWatermark keeps; URLs that don't
    canonicalize keep their raw string as the key — never silently
    merged under NULL."""
    from ..functions.urls import canonical_url

    keyed = pages_stream.withColumn(
        "url_key", F.coalesce(canonical_url(F.col("url")), F.col("url"))
    )
    return (
        keyed.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url_key"])
    )


def mention_triples_frame(pages: DataFrame) -> DataFrame:
    """Per-page mention/provenance triples: (subj=page IRI, pred,
    obj, begin) — one row per gazetteer hit. PAGE-LOCAL by
    construction: a page's mentions never depend on any other page, so
    emitting them incrementally is exact under ANY micro-batching
    (unlike per-company observation families, which need the company's
    complete fact set and therefore stay in the batch/lineage path)."""
    from ..operators.mentions import (
        concept_lexicon_terms, detect_mentions, mention_triple_columns,
    )

    p = with_extracted_text(pages)
    return mention_triple_columns(
        detect_mentions(p, concept_lexicon_terms())
    )


def stream_mention_triples(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Streaming skin of the KG's provenance layer: pages parquet dir
    -> mention triples, appended incrementally with exactly-once file
    tracking (AvailableNow). Re-running with the same checkpoint emits
    nothing new; new page files emit only their own triples."""
    pages = read_pages_stream(spark, pages_dir)
    return (
        mention_triples_frame(pages)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )


def stream_incremental_maintenance(
    spark: SparkSession,
    pages_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    fy: int,
    **inc_kw,
):
    """ROLLING-CRAWL maintenance mode (north_rule): late pages arrive
    as new files under `pages_dir`; each microbatch runs the
    company-grain incremental update (plans/incremental.py) against
    the shared stores — only companies whose content actually changed
    are re-derived, everything else's partitions stay untouched.

    foreachBatch + AvailableNow: the file-source checkpoint guarantees
    each page file is processed exactly once across restarts, and
    run_incremental's url-grain stores make a REPLAYED batch (crash
    between checkpoint commit and store append) idempotent — a url
    already in the extraction store is anti-joined away, so at-least-
    once delivery composes to exactly-once store contents. Returns the
    StreamingQuery; batch metrics accumulate on the returned query via
    `.lastProgress` and in the store manifests."""
    from ..plans.incremental import run_incremental

    pages = read_pages_stream(spark, pages_dir)

    def _apply(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        run_incremental(spark, batch_df, fy, store_dir, **inc_kw)

    return (
        pages.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_domain_edges(
    spark: SparkSession,
    pages_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    suffix_file: str | None = None,
):
    """Rolling-crawl maintenance of the domain link graph: each
    AvailableNow micro-batch of page files contracts its hyperlinks to
    (src, dst, n_links) and APPENDS them under its batch_id — the same
    sum-merge log contract as the histogram/count-min sketch logs
    (streaming/sketch_stream.py): the file-source checkpoint delivers
    each page file to exactly one batch_id, a crash-replayed batch
    re-appends under the SAME id, and fold-on-read dedups by
    (batch_id, src, dst) before summing, so at-least-once delivery
    composes to exactly-once edge counts."""
    from ..operators.webgraph import domain_edges, extract_links

    pages = read_pages_stream(spark, pages_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        domain_edges(extract_links(batch_df), suffix_file) \
            .withColumn("batch_id", F.lit(batch_id).cast("long")) \
            .write.mode("append").parquet(store_dir)

    return (
        pages.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_domain_graph(spark: SparkSession, store_dir: str) -> DataFrame:
    """(src, dst, n_links) over everything ever streamed — identical
    to batch domain_edges on the union of all pages (each batch's
    contribution summed exactly once via batch-id dedup)."""
    log = spark.read.parquet(store_dir)
    return (
        log.dropDuplicates(["batch_id", "src", "dst"])
        .groupBy("src", "dst")
        .agg(F.sum("n_links").cast("long").alias("n_links"))
    )


def read_domain_pagerank(spark: SparkSession, store_dir: str,
                         iters: int = 5) -> DataFrame:
    """Domain PageRank over the maintained edge log. PR runs on the
    DISTINCT edge set, so it matches the batch composition
    domain_pagerank() exactly for the same accumulated pages."""
    from ..operators.graphs import pagerank_int

    return pagerank_int(
        read_domain_graph(spark, store_dir).select("src", "dst"),
        iters=iters,
    )


def compact_domain_store(spark: SparkSession, store_dir: str) -> int:
    """Fold the edge log to one generation under batch_id −1. Same
    replay-window constraint as the sketch-store compactions: run only
    after a completed AvailableNow drain (SUM is not idempotent)."""
    from .sketch_stream import _compact

    def fold(df: DataFrame) -> DataFrame:
        return (
            df.dropDuplicates(["batch_id", "src", "dst"])
            .groupBy("src", "dst")
            .agg(F.sum("n_links").cast("long").alias("n_links"))
            .withColumn("batch_id", F.lit(-1).cast("long"))
        )

    return _compact(spark, store_dir, fold)
