"""PySpark-native knowledge-graph construction engine.

Re-implements the query & data-processing capabilities of the reference
`minjoonchoi/edgar-finance-ontology` (a single-process Python pipeline
that converts SEC EDGAR XBRL company facts into a financial-ontology
triple stream) as an idiomatic, horizontally-scalable Spark DataFrame
pipeline, re-targeted at Common-Crawl-style web-page tables
(url, warc_ts, html, text, lang) per the graft spec.

Layout:
    vocab/      -- ported *data* (metric lists, candidate gazetteer,
                   growth regexes, SIC map, namespaces); pure Python.
    functions/  -- scalar column helpers (IRI, dates, scoring, text).
    sources/    -- table schemas, readers, synthetic generators.
    operators/  -- the dataflow operators (selection, growth, derived,
                   benchmarks, rankings, dedup, similarity, linking...).
    plans/      -- end-to-end pipelines + lineage checkpointing.
    emit/       -- triple generation and canonical Turtle emission.
    streaming/  -- incremental (Trigger.AvailableNow) skin.

All heavy logic is DataFrame-native (Catalyst-optimizable); Python only
appears inside Arrow-batched pandas UDFs (never per-row).
"""

__version__ = "0.1.0"
