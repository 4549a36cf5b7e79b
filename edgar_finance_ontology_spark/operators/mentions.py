"""Batched gazetteer mention detection: Aho-Corasick over page text.

The graft analog of the reference's candidate probing + regex mining
(select_xbrl_tags.py:1876-1882, 1757-1766): web text has no dict keys
to probe, so every concept surface form is matched in ONE pass per
document with a multi-pattern automaton.

The automaton is built once per executor from a broadcast term list
(lazy module-level cache keyed by the broadcast id) and applied inside
mapInPandas — Arrow-batched, no per-row Python round trips to the JVM.
Pure-Python AC implementation (goto/fail/output), no external deps.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.schemas import MENTIONS_SCHEMA


class AhoCorasick:
    """Classic Aho-Corasick: build(goto, fail, output), find_all."""

    def __init__(self, terms: list[tuple[str, str]], case_insensitive: bool = True):
        """terms: [(surface, payload)]"""
        self.ci = case_insensitive
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[tuple[int, str, str]]] = [[]]  # (len, term, payload)
        self.fail: list[int] = [0]
        for surface, payload in terms:
            key = surface.lower() if case_insensitive else surface
            node = 0
            for ch in key:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[node][ch] = nxt
                node = nxt
            self.out[node].append((len(key), surface, payload))
        # BFS failure links
        from collections import deque

        self.fail = [0] * len(self.goto)
        q = deque()
        for ch, nxt in self.goto[0].items():
            q.append(nxt)
        while q:
            node = q.popleft()
            for ch, nxt in self.goto[node].items():
                q.append(nxt)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[nxt] = self.goto[f].get(ch, 0)
                if self.fail[nxt] == nxt:
                    self.fail[nxt] = 0
                self.out[nxt] = self.out[nxt] + self.out[self.fail[nxt]]
            if not self.goto[node]:
                pass

    def find_all(self, text: str) -> list[tuple[int, int, str, str]]:
        """[(begin, end, term, payload)] for every occurrence."""
        if not text:
            return []
        hay = text.lower() if self.ci else text
        node = 0
        hits = []
        for i, ch in enumerate(hay):
            while node and ch not in self.goto[node]:
                node = self.fail[node]
            node = self.goto[node].get(ch, 0)
            for length, term, payload in self.out[node]:
                hits.append((i - length + 1, i + 1, term, payload))
        return hits


_AUTOMATON_CACHE: dict[int, AhoCorasick] = {}


def detect_mentions(
    pages: DataFrame,
    terms: list[tuple[str, str]],
    text_col: str = "text",
    url_col: str = "url",
    case_insensitive: bool = True,
) -> DataFrame:
    """pages -> MENTIONS_SCHEMA rows (url, term, begin, end, payload).

    `terms` ships to executors via the closure (broadcast-sized: the
    concept lexicon is ~KBs); the automaton builds once per worker.
    """
    spark = pages.sparkSession
    bc = spark.sparkContext.broadcast(terms)
    ci = case_insensitive

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        key = id(bc.value)
        ac = _AUTOMATON_CACHE.get(key)
        if ac is None:
            ac = AhoCorasick(bc.value, case_insensitive=ci)
            _AUTOMATON_CACHE[key] = ac
        for pdf in batches:
            urls, terms_o, begins, ends, payloads = [], [], [], [], []
            for url, text in zip(pdf[url_col], pdf[text_col]):
                if text is None:
                    continue
                for b, e, t, p in ac.find_all(text):
                    urls.append(url)
                    terms_o.append(t)
                    begins.append(b)
                    ends.append(e)
                    payloads.append(p)
            yield pd.DataFrame({
                "url": pd.Series(urls, dtype="object"),
                "term": pd.Series(terms_o, dtype="object"),
                "begin": pd.Series(begins, dtype="int32"),
                "end": pd.Series(ends, dtype="int32"),
                "payload": pd.Series(payloads, dtype="object"),
            })

    sel = pages.select(
        pages[url_col].alias(url_col), pages[text_col].alias(text_col)
    )
    return sel.mapInPandas(run, schema=MENTIONS_SCHEMA)


def concept_lexicon_terms() -> list[tuple[str, str]]:
    """The finance-concept gazetteer: every candidate QName plus its
    bare tag name, payload = 'metric|qname'."""
    from ..vocab.candidates import CANDIDATES_ROWS

    terms = []
    seen = set()
    for metric, _ord, qname, _score, _gate in CANDIDATES_ROWS:
        for surface in (qname,):
            if surface not in seen:
                seen.add(surface)
                terms.append((surface, f"{metric}|{qname}"))
    return terms


def mention_triple_columns(m: DataFrame) -> DataFrame:
    """(subj = page IRI, pred, obj, begin, page_url) from
    detect_mentions rows — THE single definition of the mention-triple
    shape. Both the streaming path (streaming/pages_stream.py) and the
    batch/resumable lineage path (plans/web_pipeline.py) render
    through this select, so the IRI scheme and payload split cannot
    silently diverge between them."""
    metric = F.split(F.col("payload"), r"\|").getItem(0)
    return m.select(
        F.concat(F.lit("efin:page-"), F.md5("url")).alias("subj"),
        F.lit("efin:mentionsConcept").alias("pred"),
        F.concat(F.lit("efin:"), metric).alias("obj"),
        F.col("begin").cast("long").alias("begin"),
        F.col("url").alias("page_url"),
    )
