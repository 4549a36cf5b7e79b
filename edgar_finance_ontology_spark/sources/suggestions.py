"""Curated QName suggestion store (SURVEY §2.1 S11).

Reference: record_suggestion / dump_suggestions / --suggestions JSONL
(select_xbrl_tags.py:1335-1355, 2733-2736): a first-wins keyed store of
(cik, metric, qname, origin, note), optionally restricted to
extension-taxonomy qnames, dumped/loaded as JSON lines.

Spark shape: dedup on the key with first-wins order = input order
(deterministic via a provided ordering column), JSONL via
spark.read/write.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

STD_PREFIXES = ("us-gaap", "ifrs-full", "dei", "srt")

SUGGESTIONS_SCHEMA = StructType([
    StructField("cik", StringType(), False),
    StructField("metric", StringType(), False),
    StructField("qname", StringType(), False),
    StructField("origin", StringType(), True),
    StructField("note", StringType(), True),
])


def record_suggestions(
    rows: DataFrame,
    ext_only: bool = False,
    order_col: str | None = None,
) -> DataFrame:
    """first-wins dedup on (cik, metric, qname); cik normalized like
    the reference's str(int(cik)) key (:1346). ext_only drops standard-
    taxonomy qnames (:1344)."""
    d = rows.withColumn(
        "cik", F.col("cik").cast("long").cast("string")
    ).where(F.col("cik").isNotNull())
    if ext_only:
        prefix = F.split(F.col("qname"), ":").getItem(0)
        d = d.where(~prefix.isin(*STD_PREFIXES))
    if order_col:
        w = Window.partitionBy("cik", "metric", "qname").orderBy(order_col)
        d = (
            d.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        d = d.dropDuplicates(["cik", "metric", "qname"])
    return d.select("cik", "metric", "qname",
                    F.coalesce("origin", F.lit("")).alias("origin"),
                    F.coalesce("note", F.lit("")).alias("note"))


def dump_suggestions(df: DataFrame, path: str, append: bool = False):
    df.select("cik", "metric", "qname", "origin", "note").write.mode(
        "append" if append else "overwrite"
    ).json(path)


def load_suggestions(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(SUGGESTIONS_SCHEMA).json(path)
