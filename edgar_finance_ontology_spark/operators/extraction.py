"""Boilerplate-stripped text extraction: html (binary) -> text.

The graft analog of the reference's only web-page extractor (the bs4
S&P500 table scrape, select_xbrl_tags.py:2660-2687), generalized to a
trafilatura-style main-content extractor. Deterministic and
byte-stable per url (north_rule gate: byte-identical extracted text,
verified by the golden test in tests/test_extraction.py).

Runs as mapInPandas (Arrow batches); pure stdlib (html.parser), no
per-row Python API calls from the driver.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Elements whose content is boilerplate/non-content.
_SKIP = {"script", "style", "nav", "footer", "header", "aside", "noscript",
         "form", "button", "svg", "iframe"}
# Elements that delimit text blocks.
_BLOCK = {"p", "div", "section", "article", "main", "li", "h1", "h2", "h3",
          "h4", "h5", "h6", "tr", "table", "ul", "ol", "blockquote", "pre",
          "br", "td", "th"}


class _MainTextParser(HTMLParser):
    """Collects text blocks, preferring <main>/<article> content when
    present (falls back to full body), skipping _SKIP subtrees."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.skip_depth = 0
        self.main_depth = 0
        self.saw_main = False
        self.blocks_all: list[str] = []
        self.blocks_main: list[str] = []
        self.buf_all: list[str] = []
        self.buf_main: list[str] = []

    def _flush(self, which: str):
        buf = self.buf_main if which == "main" else self.buf_all
        blocks = self.blocks_main if which == "main" else self.blocks_all
        text = re.sub(r"\s+", " ", "".join(buf)).strip()
        if text:
            blocks.append(text)
        buf.clear()

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self.skip_depth += 1
            return
        if tag in ("main", "article"):
            self.saw_main = True
            self.main_depth += 1
        if tag in _BLOCK:
            self._flush("all")
            if self.main_depth > 0:
                self._flush("main")

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if tag in _BLOCK:
            self._flush("all")
            if self.main_depth > 0:
                self._flush("main")
        if tag in ("main", "article"):
            self._flush("main")
            self.main_depth = max(0, self.main_depth - 1)

    def handle_data(self, data):
        if self.skip_depth:
            return
        self.buf_all.append(data)
        if self.main_depth > 0:
            self.buf_main.append(data)


def extract_text(html: bytes | str | None) -> str:
    """Deterministic main-content extraction; one text block per line."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _MainTextParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return ""
    p._flush("all")
    p._flush("main")
    blocks = p.blocks_main if p.saw_main else p.blocks_all
    return "\n".join(b for b in blocks if b)


def with_extracted_text(pages: DataFrame, overwrite: bool = False) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) with `text` filled from
    `html` where missing (or everywhere if overwrite)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            need = (
                pdf["text"].isna() | (pdf["text"] == "")
                if not overwrite
                else pd.Series(True, index=pdf.index)
            )
            extracted = pdf.loc[need, "html"].map(extract_text)
            pdf.loc[need, "text"] = extracted
            yield pdf

    return pages.mapInPandas(run, schema=pages.schema)
