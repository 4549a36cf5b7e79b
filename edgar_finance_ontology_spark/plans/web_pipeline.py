"""Web-pages front-end: pages -> extracted text -> parsed fact records
-> the SAME selection/derivation/emission pipeline as the companyfacts
front-end.

Stage map (north_star):
  1. extraction  — html -> text (operators/extraction.py, mapInPandas)
  2. mention     — Aho-Corasick gazetteer hits (operators/mentions.py)
                   for analytics; fact parsing itself is native regex
                   (regexp_extract, JVM-side) over structured filing
                   sentences — the reference's C21 regex-mining analog
  3. assembly    — records dedup'd + pool-ordered -> FACTS_SCHEMA
  4. selection/derivation/aggregation/triples — plans/pipeline.py

Every stage is bucket-partitioned by url hash and checkpointable via
plans/lineage.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.extraction import with_extracted_text
from ..vocab.sic import sic_sector_expr

# fact_sentence() layout (sources/pages.py) — the structured filing
# sentence grammar the parser understands.
_FACT_RE = (
    r"CIK (\d{10}) reported (\S+) of (\S+) (\S+) for the period ending "
    r"(\S+) \(fiscal year (\d+), fp (\S+), form (\S+), accession (\S+), "
    r"qtrs (\S+), segment (\S+)\)\."
)
_PROFILE_RE = (
    r"Company profile: (.+) \(ticker (\S+), CIK (\d{10})\) files under "
    r"SIC (\d+) \((.+)\); fiscal year ends (\d{4})\."
)


def _na_null(c):
    return F.when(c == "NA", F.lit(None).cast("string")).otherwise(c)


def parse_fact_records(pages_with_text: DataFrame) -> DataFrame:
    """Per-page narrow stage: explode text lines, regexp_extract each
    fact field (whole-stage codegen). Keeps the page's `bucket` column
    when present — this is the checkpointable per-partition stage; the
    global dedup/pool-ordering lives in assemble_facts()."""
    carry = ["url"] + (
        ["bucket"] if "bucket" in pages_with_text.columns else []
    )
    lines = pages_with_text.select(
        *carry, F.explode(F.split(F.col("text"), "\n")).alias("line")
    ).where(F.col("line").rlike(_FACT_RE))

    g = lambda i: F.regexp_extract("line", _FACT_RE, i)  # noqa: E731
    return lines.select(
        *carry,
        g(1).alias("cik"),
        g(2).alias("qname"),
        g(3).cast("double").alias("val"),
        g(4).alias("unit"),
        g(5).alias("end"),
        g(6).cast("int").alias("rec_fy"),
        _na_null(g(7)).alias("fp"),
        _na_null(g(8)).alias("form"),
        _na_null(g(9)).alias("accn"),
        _na_null(g(10)).cast("int").alias("qtrs"),
        _na_null(g(11)).alias("segment"),
    ).where(F.col("val").isNotNull())


def assemble_facts(records: DataFrame) -> DataFrame:
    """Global half: dedup replicated records (head-entity page copies),
    assign the deterministic pool order -> FACTS_SCHEMA."""
    recs = records.dropDuplicates(
        ["cik", "qname", "unit", "val", "end", "fp", "rec_fy", "form",
         "accn", "qtrs", "segment"]
    )
    # deterministic pool order within (cik, qname, unit): by period end,
    # then accession, then consolidated-before-segmented — matches the
    # synthetic filings' array order (and is our documented order for
    # real web data, where no array order exists)
    w = Window.partitionBy("cik", "qname", "unit").orderBy(
        F.col("end").asc_nulls_first(),
        F.col("accn").asc_nulls_first(),
        F.col("segment").isNotNull().asc(),
        F.col("val").asc(),
    )
    return recs.select(
        "cik", "qname", "unit", "val", "end",
        F.lit(None).cast("string").alias("start"),
        "fp", "rec_fy", "form", "accn", "qtrs",
        (F.col("segment").isNotNull() & (F.col("segment") != "")).alias(
            "has_segment"
        ),
        F.lit(None).cast("string").alias("frame"),
        (F.row_number().over(w) - 1).cast("int").alias("rec_pos"),
    )


def profile_rows(pages_with_text: DataFrame) -> DataFrame:
    """Pre-selection half of the profile parse: every profile sentence
    in the text, one row each, NO per-cik dedup. This is the grain the
    incremental profiles store persists (plans/incremental.py) — tiny
    rows that accumulate append-only, so a patch run never re-parses
    stored text to rebuild the companies dim."""
    lines = pages_with_text.select(
        F.explode(F.split(F.col("text"), "\n")).alias("line")
    ).where(F.col("line").rlike(_PROFILE_RE))
    g = lambda i: F.regexp_extract("line", _PROFILE_RE, i)  # noqa: E731
    return lines.select(
        g(2).alias("symbol"),
        g(3).alias("cik"),
        g(1).alias("name"),
        g(4).alias("sic"),
        g(5).alias("sic_description"),
        g(6).alias("fye"),
    )


def profiles_to_companies(prof: DataFrame) -> DataFrame:
    """Selection half: deterministic one-row-per-cik (lexicographic min
    over the full extracted tuple — NOT dropDuplicates, whose pick is
    partition-order-dependent and would break the incremental-store ==
    scratch-run byte-parity contract), then the SIC sector ladder."""
    w = Window.partitionBy("cik").orderBy(
        F.col("symbol").asc_nulls_first(),
        F.col("name").asc_nulls_first(),
        F.col("sic").asc_nulls_first(),
        F.col("sic_description").asc_nulls_first(),
        F.col("fye").asc_nulls_first(),
    )
    prof = (
        prof.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1).drop("_rn")
    )
    sic_int = F.col("sic").try_cast("int")
    sector = sic_sector_expr(sic_int)
    return prof.select(
        "symbol", "cik", "name",
        sector.alias("sector"),
        F.when(F.col("sic_description") != "", F.col("sic_description"))
        .otherwise(sector)
        .alias("industry"),
        "sic", "sic_description", "fye",
    )


def parse_company_profiles(pages_with_text: DataFrame) -> DataFrame:
    """profile sentences -> COMPANIES_SCHEMA (sector via SIC ladder,
    industry = sic_description; infer_sector_industry analog)."""
    return profiles_to_companies(profile_rows(pages_with_text))


def extracted_text_stage(pages: DataFrame) -> DataFrame:
    """Extraction, materialized ONCE and slimmed to what the parsers
    need (url, bucket?, text). Dropping the html binary before the
    checkpoint halves the string byte volume every downstream consumer
    pays — at 10^12 pages the raw html is the dominant byte stream and
    must never be carried past this stage. localCheckpoint is the
    local-mode stand-in for writing the stage table (plans/lineage.py)."""
    carry = ["url"] + (["bucket"] if "bucket" in pages.columns else [])
    return (
        with_extracted_text(pages)
        .select(*carry, "text")
        .localCheckpoint(eager=False)
    )


def pages_to_inputs(pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(facts, companies) from a raw pages table. Both parsers consume
    the same single extraction pass (extraction is the most expensive
    Python stage; running it once per consumer doubles the bill)."""
    p = extracted_text_stage(pages)
    return assemble_facts(parse_fact_records(p)), parse_company_profiles(p)


def run_web_pipeline(pages: DataFrame, fy: int, **kw) -> dict:
    from .pipeline import run_pipeline

    facts, companies = pages_to_inputs(pages)
    return run_pipeline(facts, companies, fy, **kw)


def run_web_pipeline_resumable(
    pages: DataFrame, fy: int, run_dir: str, run_id: str = "r1", **kw
) -> dict:
    """The resumable shape of the front-end (north_rule): the two
    volume-proportional stages — extraction and fact-record parsing —
    run through per-bucket lineage checkpoints (plans/lineage.py), so a
    killed run restarted with the same run_dir/run_id reprocesses ONLY
    the buckets whose lineage rows are missing; completed buckets are
    read back from the stage tables, never recomputed or duplicated.

    Requires the pages table to carry the url-hash `bucket` column
    (the Iceberg bucket(url) partition stand-in)."""
    from .lineage import LineageLog, run_stage
    from .pipeline import run_pipeline

    spark = pages.sparkSession
    log = LineageLog(spark, run_dir, run_id)
    extracted = run_stage(
        log, "extract", pages,
        lambda df: with_extracted_text(df).select("url", "bucket", "text"),
    )
    records = run_stage(log, "fact_records", extracted, parse_fact_records)
    # TRIPLE counts per url-bucket (north_rule metrics contract): the
    # page-local mention/provenance triples are bucket-preserving, so
    # they run through the same lineage machinery — the metrics table
    # carries rows AND triples per bucket, and a resumed run skips
    # completed buckets' triple emission too. (Per-company observation
    # triples are company-granular by design — see
    # streaming/pages_stream.py — and are counted at the run level.)
    mention_triples = run_stage(
        log, "mention_triples", extracted,
        lambda df: _bucketed_mention_triples(df),
    )
    facts = assemble_facts(records)
    companies = parse_company_profiles(extracted)
    out = run_pipeline(facts, companies, fy, **kw)
    out["facts"] = facts
    out["mention_triples"] = mention_triples
    out["lineage"] = log.metrics()
    return out


def _bucketed_mention_triples(extracted: DataFrame) -> DataFrame:
    """Page-local mention triples with the bucket column preserved
    (input: extracted pages slice with url/bucket/text). The triple
    shape comes from the ONE shared definition
    (operators.mentions.mention_triple_columns) — the streaming path
    renders through the same select, so they cannot diverge."""
    from ..operators.mentions import (
        concept_lexicon_terms, detect_mentions, mention_triple_columns,
    )

    # dedup BEFORE detection: a crawl slice can carry the same url more
    # than once (url_dedup exists for exactly that). Deduping only the
    # join side would stop the quadratic fan-out but still emit each
    # duplicate page's mentions once per copy AND run the detector per
    # copy — deduping the input makes the per-bucket triple counts the
    # lineage metrics record exact and halves the detection work.
    # Deterministic pick: lowest content hash per url (no timestamp at
    # this stage; duplicate crawl rows are normally content-identical).
    w = Window.partitionBy("url").orderBy(F.md5(F.col("text")).asc())
    one_per_url = (
        extracted.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1).drop("_rn")
    )
    triples = mention_triple_columns(
        detect_mentions(one_per_url, concept_lexicon_terms())
    )
    return triples.join(
        one_per_url.select(F.col("url").alias("page_url"), "bucket"),
        "page_url",
    ).select("bucket", "subj", "pred", "obj", "begin")
