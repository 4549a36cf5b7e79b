"""Ticker -> CIK resolution (SURVEY §2.1 S4, §2.3 J1, §2.8 C6).

Reference: fetch_sec_ticker_cik_map reads the SEC ticker JSON (or the
pipe-delimited fallback) into a dict keyed by a normalized ticker
(upper, strip [.\\-\\s]), then company symbols are resolved by lookup
(select_xbrl_tags.py:2689-2710, 2827-2832).

Spark: small-dim readers + a broadcast equi-join on the normalized key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def normalize_ticker_col(c) -> F.Column:
    """upper + strip per the reference AS SHIPPED: its pattern is the
    double-escaped r"[.\\\\-\\\\s]" (select_xbrl_tags.py:2690), which the
    regex engine reads as {'.', '\\', 's'} — so dashes and inner spaces
    SURVIVE ('bf-b' -> 'BF-B'); only dots/backslashes are stripped
    (post-upper there are no lowercase 's'). Drift documented; parity
    fuzz-tested against the reference function."""
    return F.regexp_replace(F.upper(F.trim(c)), "[.\\\\s]", "")


def read_ticker_map_json(spark: SparkSession, path: str) -> DataFrame:
    """SEC company_tickers.json shape: {"0": {cik_str, ticker, title},
    ...} — a map of index -> record."""
    raw = spark.read.schema(
        "root map<string, struct<cik_str: long, ticker: string, title: string>>"
    ).option("multiLine", "true").json(path) if False else spark.read.option(
        "multiLine", "true"
    ).json(path)
    # generic shape: one JSON object whose values are the records;
    # normalize via stack of all top-level structs
    cols = raw.columns
    recs = raw.select(F.array(*[F.col(f"`{c}`") for c in cols]).alias("a"))
    return recs.select(F.explode("a").alias("r")).select(
        F.col("r.ticker").alias("ticker"),
        F.lpad(F.col("r.cik_str").cast("string"), 10, "0").alias("cik"),
        F.coalesce(F.col("r.title"), F.lit("")).alias("title"),
    ).where(F.col("ticker").isNotNull()).withColumn(
        "ticker_norm", normalize_ticker_col(F.col("ticker"))
    )


def read_ticker_map_text(spark: SparkSession, path: str) -> DataFrame:
    """Fallback pipe-delimited `ticker|cik` text (reference :2702-2707)."""
    df = spark.read.schema("ticker string, cik string").option(
        "sep", "|"
    ).csv(path)
    return df.where(F.col("ticker").isNotNull() & F.col("cik").isNotNull()).select(
        F.upper("ticker").alias("ticker"),
        F.lpad(F.col("cik"), 10, "0").alias("cik"),
        F.lit("").alias("title"),
    ).withColumn("ticker_norm", normalize_ticker_col(F.col("ticker")))


def resolve_tickers(
    companies: DataFrame, ticker_map: DataFrame, symbol_col: str = "symbol"
) -> DataFrame:
    """Broadcast equi inner join on the normalized ticker (J1)."""
    left = companies.withColumn(
        "ticker_norm", normalize_ticker_col(F.col(symbol_col))
    )
    m = ticker_map.select("ticker_norm", F.col("cik").alias("resolved_cik"),
                          "title").dropDuplicates(["ticker_norm"])
    return left.join(F.broadcast(m), "ticker_norm", "inner").drop("ticker_norm")
