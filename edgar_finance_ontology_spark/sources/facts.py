"""Company-facts ingestion: nested JSON -> long fact table.

The reference navigates the nested dict per (company, qname) probe
(get_unit_records / iter_all_facts, select_xbrl_tags.py:1475-1486).
We explode the whole nest ONCE into a long DataFrame
(cik, qname, unit, record...) and let every downstream operator be a
join/window over it — one scan instead of |metrics|×|candidates|
probes, and it parallelizes over companies × tags.

All explodes are native (generator expressions inside whole-stage
codegen); no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# One XBRL fact record (subset of EDGAR company-facts fields the
# reference reads: val/end/start/fp/fy/form/accn/qtrs/frame/segment).
FACT_RECORD_SCHEMA = StructType([
    StructField("val", DoubleType(), True),
    StructField("end", StringType(), True),
    StructField("start", StringType(), True),
    StructField("fp", StringType(), True),
    StructField("fy", LongType(), True),
    StructField("form", StringType(), True),
    StructField("accn", StringType(), True),
    StructField("qtrs", LongType(), True),
    StructField("frame", StringType(), True),
    StructField("segment", StringType(), True),
])

COMPANYFACTS_JSON_SCHEMA = StructType([
    StructField("cik", LongType(), True),
    StructField("entityName", StringType(), True),
    StructField("entityTicker", StringType(), True),
    StructField(
        "facts",
        MapType(
            StringType(),
            MapType(
                StringType(),
                StructType([
                    StructField(
                        "units", MapType(StringType(), ArrayType(FACT_RECORD_SCHEMA))
                    )
                ]),
            ),
        ),
        True,
    ),
])

SUBMISSIONS_JSON_SCHEMA = StructType([
    StructField("cik", LongType(), True),
    StructField("sic", StringType(), True),
    StructField("sicDescription", StringType(), True),
    StructField("fiscalYearEnd", StringType(), True),
    StructField("tickers", ArrayType(StringType()), True),
])


def read_companyfacts_json(spark: SparkSession, path: str) -> DataFrame:
    """Read company-facts JSON files (one object per file)."""
    return spark.read.schema(COMPANYFACTS_JSON_SCHEMA).option(
        "multiLine", "true"
    ).json(path)


def explode_facts(cf: DataFrame) -> DataFrame:
    """Nested facts -> long table matching FACTS_SCHEMA.

    posexplode preserves the record's position within its (qname, unit)
    array — the reference's pool order for deterministic tie-breaks.
    Only numeric-val records survive (reference guard
    select_xbrl_tags.py:1824: isinstance(val, (int, float))).
    """
    out = (
        cf.select(
            F.lpad(F.col("cik").cast("string"), 10, "0").alias("cik"),
            F.explode("facts").alias("tax", "tags"),
        )
        .select("cik", "tax", F.explode("tags").alias("tag", "body"))
        .select(
            "cik",
            F.concat_ws(":", "tax", "tag").alias("qname"),
            F.explode("body.units").alias("unit", "recs"),
        )
        .select("cik", "qname", "unit", F.posexplode("recs").alias("rec_pos", "rec"))
        .select(
            "cik",
            "qname",
            "unit",
            F.col("rec.val").alias("val"),
            F.col("rec.end").alias("end"),
            F.col("rec.start").alias("start"),
            F.col("rec.fp").alias("fp"),
            F.col("rec.fy").cast("int").alias("rec_fy"),
            F.col("rec.form").alias("form"),
            F.col("rec.accn").alias("accn"),
            F.col("rec.qtrs").cast("int").alias("qtrs"),
            (
                F.col("rec.segment").isNotNull() & (F.col("rec.segment") != "")
            ).alias("has_segment"),
            F.col("rec.frame").alias("frame"),
            F.col("rec_pos").cast("int").alias("rec_pos"),
        )
        .where(F.col("val").isNotNull())
    )
    return out


def read_submissions_json(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(SUBMISSIONS_JSON_SCHEMA).option(
        "multiLine", "true"
    ).json(path)


def build_companies(cf: DataFrame, subs: DataFrame) -> DataFrame:
    """companies dim table (COMPANIES_SCHEMA shape) from facts metadata +
    submissions, mirroring infer_sector_industry
    (select_xbrl_tags.py:1540-1549): sector from the SIC rule ladder,
    industry = sicDescription (falls back to sector)."""
    from ..vocab.sic import sic_sector_expr

    c = cf.select(
        F.lpad(F.col("cik").cast("string"), 10, "0").alias("cik"),
        F.coalesce(F.col("entityName"), F.lit("")).alias("name"),
        F.coalesce(F.col("entityTicker"), F.lit("")).alias("ticker_from_facts"),
    )
    s = subs.select(
        F.lpad(F.col("cik").cast("string"), 10, "0").alias("cik"),
        F.col("sic"),
        F.coalesce(F.col("sicDescription"), F.lit("")).alias("sic_description"),
        F.coalesce(F.col("fiscalYearEnd"), F.lit("")).alias("fye"),
        F.coalesce(F.element_at(F.col("tickers"), 1), F.lit("")).alias(
            "ticker_from_subs"
        ),
        F.input_file_name().alias("_src"),
    )
    # ONE row per cik, whatever the cache holds: a submissions cache
    # legitimately carries the same snapshot under several date-stamped
    # filenames (the reference resolves strictly by run-date, so panels
    # ship today+tomorrow to survive midnight) — and after an overnight
    # EDGAR refresh the snapshots' CONTENT can differ too, where a
    # full-row dedup would still fan out the company join. The latest
    # snapshot wins (filenames embed an ISO date, so lexicographic max
    # = newest); content columns break ties so frames built off-file
    # (_src = "") stay deterministic.
    pick = Window.partitionBy("cik").orderBy(
        F.col("_src").desc(),
        F.col("ticker_from_subs").asc(),
        F.col("sic").asc_nulls_last(),
        F.col("sic_description").asc(),
        F.col("fye").asc(),
    )
    s = (
        s.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    sic_int = F.col("sic").try_cast("int")
    sector = sic_sector_expr(sic_int)
    joined = c.join(F.broadcast(s), "cik", "left")
    return joined.select(
        F.when(
            F.col("ticker_from_facts") != "", F.col("ticker_from_facts")
        ).otherwise(F.col("ticker_from_subs")).alias("symbol"),
        "cik",
        "name",
        sector.alias("sector"),
        F.when(F.col("sic_description") != "", F.col("sic_description"))
        .otherwise(sector)
        .alias("industry"),
        F.when(sic_int.isNotNull(), sic_int.cast("string"))
        .otherwise(F.lit(""))
        .alias("sic"),
        "sic_description",
        "fye",
    )
