"""HTML-table -> structured-rows extraction (SURVEY §2.1 S3).

The reference's only page-to-structured extractor scrapes the S&P 500
constituents table with bs4 (fetch_sp500_constituents,
select_xbrl_tags.py:2660-2687): find the table, lower-cased header
match, one record per <tr>. This operator generalizes it: every
<table> in a page becomes (url, table_idx, row_idx, header -> cell)
map rows, via a stdlib HTML parser inside mapInPandas.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, MapType, StringType, StructField, StructType,
)

TABLE_ROWS_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("table_idx", IntegerType(), False),
    StructField("row_idx", IntegerType(), False),
    StructField("cells", MapType(StringType(), StringType()), False),
])


class _TableParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.tables: list[list[list[str]]] = []
        self.in_table = 0
        self.in_cell = False
        self.cur_row: list[str] | None = None
        self.buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self.in_table += 1
            if self.in_table == 1:
                self.tables.append([])
        elif self.in_table and tag == "tr":
            self.cur_row = []
        elif self.in_table and tag in ("td", "th"):
            self.in_cell = True
            self.buf = []

    def handle_endtag(self, tag):
        if tag == "table":
            self.in_table = max(0, self.in_table - 1)
        elif self.in_table and tag in ("td", "th") and self.in_cell:
            self.in_cell = False
            if self.cur_row is not None:
                self.cur_row.append(" ".join("".join(self.buf).split()))
        elif self.in_table and tag == "tr" and self.cur_row is not None:
            if self.cur_row:
                self.tables[-1].append(self.cur_row)
            self.cur_row = None

    def handle_data(self, data):
        if self.in_cell:
            self.buf.append(data)


def parse_html_tables(html) -> list[list[list[str]]]:
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _TableParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return []
    return p.tables


def extract_table_rows(pages: DataFrame, url_col: str = "url",
                       html_col: str = "html") -> DataFrame:
    """One output row per data <tr>, keyed by the table's first row
    (lower-cased headers, like the reference's header match)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                for t_idx, table in enumerate(parse_html_tables(html)):
                    if len(table) < 2:
                        continue
                    headers = [h.lower() for h in table[0]]
                    for r_idx, row in enumerate(table[1:]):
                        cells = {
                            headers[i]: row[i]
                            for i in range(min(len(headers), len(row)))
                        }
                        out.append({
                            "url": str(url), "table_idx": t_idx,
                            "row_idx": r_idx, "cells": cells,
                        })
            yield pd.DataFrame(
                out, columns=["url", "table_idx", "row_idx", "cells"]
            )

    return pages.select(url_col, html_col).mapInPandas(
        run, TABLE_ROWS_SCHEMA
    )


def constituents_from_tables(table_rows: DataFrame) -> DataFrame:
    """The S&P500-constituents shape (symbol, name, sector, industry)
    from extracted table rows — mirrors the reference's column picks
    (symbol / security / gics sector / gics sub-industry,
    select_xbrl_tags.py:2671-2686)."""
    c = F.col("cells")
    return table_rows.where(
        c.getItem("symbol").isNotNull() & c.getItem("security").isNotNull()
    ).select(
        F.upper(c.getItem("symbol")).alias("symbol"),
        c.getItem("security").alias("name"),
        F.coalesce(c.getItem("gics sector"), c.getItem("sector"),
                   F.lit("")).alias("sector"),
        F.coalesce(c.getItem("gics sub-industry"), c.getItem("sub-industry"),
                   F.lit("")).alias("industry"),
    )
