"""Explicit StructTypes for every table in the engine (never inferred).

Shapes mirror the reference's row tables (SURVEY.md §1.2, FIXTURES.md):
  facts         — exploded long form of the nested companyfacts JSON
                  (facts→taxonomy→tag→units→unit→[records],
                  select_xbrl_tags.py:1475-1486)
  companies     — companies_{fy}.csv, 8 cols (select_xbrl_tags.py:2992)
  observations  — tags_{fy}.csv, 24 cols (select_xbrl_tags.py:2999-3003)
  benchmarks    — benchmarks_{fy}.csv, 11 cols (select_xbrl_tags.py:3015-3018)
  rankings      — rankings_{fy}.csv, 10 cols (select_xbrl_tags.py:3030-3033)
  triples       — the canonical (subj, pred, obj) store
  pages         — the graft input table (BASELINE.json input_hint)
  lineage       — per-partition checkpoint metrics (north_rule)
"""

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# One row per (cik, qname, unit, record) — the long fact table both
# front-ends (companyfacts JSON, web pages) produce.
FACTS_SCHEMA = StructType([
    StructField("cik", StringType(), False),          # zero-padded 10
    StructField("qname", StringType(), False),        # "taxonomy:Tag"
    StructField("unit", StringType(), False),
    StructField("val", DoubleType(), True),
    StructField("end", StringType(), True),           # YYYY-MM-DD
    StructField("start", StringType(), True),
    StructField("fp", StringType(), True),            # FY/Q1.. or null
    StructField("rec_fy", IntegerType(), True),
    StructField("form", StringType(), True),          # 10-K/10-Q/...
    StructField("accn", StringType(), True),
    StructField("qtrs", IntegerType(), True),
    StructField("has_segment", BooleanType(), False),
    StructField("frame", StringType(), True),
    # Position of the record within its (qname, unit) array — preserves
    # the reference's pool iteration order for deterministic tie-breaks
    # (select_xbrl_tags.py:1821-1825).
    StructField("rec_pos", IntegerType(), False),
])

COMPANIES_SCHEMA = StructType([
    StructField("symbol", StringType(), True),
    StructField("cik", StringType(), False),
    StructField("name", StringType(), True),
    StructField("sector", StringType(), True),
    StructField("industry", StringType(), True),
    StructField("sic", StringType(), True),
    StructField("sic_description", StringType(), True),
    StructField("fye", StringType(), True),           # "MMDD"
])

OBSERVATIONS_SCHEMA = StructType([
    StructField("cik", StringType(), False),
    StructField("symbol", StringType(), True),
    StructField("name", StringType(), True),
    StructField("sector", StringType(), True),
    StructField("industry", StringType(), True),
    StructField("sic", StringType(), True),
    StructField("sic_description", StringType(), True),
    StructField("fye", StringType(), True),
    StructField("fy", IntegerType(), False),
    StructField("metric", StringType(), False),
    StructField("is_derived", BooleanType(), False),
    StructField("value", DoubleType(), True),
    StructField("unit", StringType(), True),
    StructField("period_type", StringType(), True),   # duration|instant
    StructField("end", StringType(), True),
    StructField("form", StringType(), True),
    StructField("accn", StringType(), True),
    StructField("source_type", StringType(), True),
    StructField("selected_tag", StringType(), True),
    StructField("composite_name", StringType(), True),
    StructField("computed_from", StringType(), True),
    StructField("confidence", DoubleType(), True),
    StructField("reason", StringType(), True),
    StructField("components", StringType(), True),    # JSON text
])

BENCHMARKS_SCHEMA = StructType([
    StructField("industry", StringType(), True),      # "" = all-market
    StructField("sector", StringType(), True),
    StructField("metric", StringType(), False),
    StructField("fy", IntegerType(), False),
    StructField("average_value", DoubleType(), True),
    StructField("median_value", DoubleType(), True),
    StructField("max_value", DoubleType(), True),
    StructField("min_value", DoubleType(), True),
    StructField("percentile25", DoubleType(), True),
    StructField("percentile75", DoubleType(), True),
    StructField("sample_size", IntegerType(), True),
])

RANKINGS_SCHEMA = StructType([
    StructField("cik", StringType(), False),
    StructField("symbol", StringType(), True),
    StructField("industry", StringType(), True),      # "" = all scope
    StructField("sector", StringType(), True),
    StructField("metric", StringType(), False),       # incl. "Composite"
    StructField("ranking_type", StringType(), False), # Top10|All
    StructField("rank", IntegerType(), False),
    StructField("value", DoubleType(), True),
    StructField("composite_score", DoubleType(), True),
    StructField("fy", IntegerType(), False),
])

TRIPLES_SCHEMA = StructType([
    StructField("subj", StringType(), False),
    StructField("pred", StringType(), False),
    StructField("obj", StringType(), False),
    StructField("obj_is_literal", BooleanType(), False),
    StructField("obj_dtype", StringType(), True),     # xsd:* or null/lang tag
])

# The graft input table — exactly BASELINE.json's input_hint.
PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

# Per-partition lineage checkpoint rows (resume + metrics).
LINEAGE_SCHEMA = StructType([
    StructField("run_id", StringType(), False),
    StructField("stage", StringType(), False),
    StructField("bucket", IntegerType(), False),      # url-hash bucket
    StructField("rows_in", LongType(), True),
    StructField("rows_out", LongType(), True),
    StructField("status", StringType(), False),       # done|failed
    StructField("wall_ms", LongType(), True),
])

# Mention rows produced by the gazetteer matcher over pages.text.
MENTIONS_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("term", StringType(), False),
    StructField("begin", IntegerType(), False),
    StructField("end", IntegerType(), False),
    StructField("payload", StringType(), True),
])
