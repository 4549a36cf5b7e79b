"""WARC source: read Common-Crawl-style WARC files into the canonical
pages frame (url, warc_ts, html, text, lang).

The north-star input is 10^12 Common-Crawl pages; Common Crawl ships
them as WARC/1.0 containers (ISO 28500), one gzip member per record.
No warcio ships in this container, so the parser is from-scratch
stdlib: WARC is a simple framing format — `WARC/1.0\\r\\n`, header
lines, blank line, exactly Content-Length payload bytes, `\\r\\n\\r\\n`
record separator — and CC's member-per-record gzip concatenation is
handled by a zlib loop over `unused_data`.

Only `response` and `resource` records yield pages (request /
warcinfo / metadata records are crawler bookkeeping). A response
payload is a raw HTTP response; the body starts after the first HTTP
header terminator. `text`/`lang` land NULL — the extraction operator
(operators/extraction.py) fills text downstream, exactly as for the
synthesized pages.

Scale posture: `spark.read.format("binaryFile")` gives one task per
WARC file, which is precisely how Common Crawl is meant to be
consumed (segments are ~1 GB gzipped, independently processable);
parsing runs in mapInPandas so each executor decodes its own files
with zero shuffle. binaryFile materializes a whole file per row, so
executor memory must cover one decompressed segment per task slot —
the same requirement warcio-based Spark jobs have. Malformed records
degrade per-record (skipped), never per-file.
"""

from __future__ import annotations

import datetime as dt
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from .schemas import PAGES_SCHEMA

_GZ_MAGIC = b"\x1f\x8b"


def maybe_gunzip(buf: bytes) -> bytes:
    """Decompress a (possibly multi-member, possibly uncompressed)
    gzip buffer. Common Crawl gzips each WARC record as its own
    member; a plain `gzip.decompress` stops at the first member in
    some Python versions, so members are walked explicitly via
    `unused_data`. Trailing garbage ends the walk instead of looping."""
    if not buf.startswith(_GZ_MAGIC):
        return buf
    out = []
    data = buf
    while data.startswith(_GZ_MAGIC):
        d = zlib.decompressobj(wbits=47)
        try:
            out.append(d.decompress(data))
        except zlib.error:
            break
        if not d.eof:  # truncated member
            break
        data = d.unused_data
    return b"".join(out)


def iter_warc_records(buf: bytes) -> Iterator[tuple[dict, bytes]]:
    """(headers, payload) per well-formed record; headers are
    lower-cased names -> stripped values. Stops at the first framing
    violation (a corrupt tail cannot resynchronize safely)."""
    i, n = 0, len(buf)
    while i < n:
        if buf.startswith(b"\r\n", i):  # inter-record separators
            i += 2
            continue
        j = buf.find(b"\r\n\r\n", i)
        if j < 0:
            return
        lines = buf[i:j].decode("utf-8", "replace").split("\r\n")
        if not lines[0].startswith("WARC/"):
            return
        headers = {}
        for ln in lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            return
        payload = buf[j + 4:j + 4 + clen]
        if len(payload) < clen:  # truncated record
            return
        yield headers, payload
        i = j + 4 + clen


def http_body(payload: bytes) -> bytes:
    """Body of a raw HTTP response payload (after the first header
    terminator); a payload that isn't an HTTP message is returned
    whole (WARC `resource` records store content directly)."""
    if payload.startswith(b"HTTP/"):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4:]
    return payload


def parse_warc_date(v: str | None) -> dt.datetime | None:
    """WARC-Date is W3C ISO-8601 UTC (with or without fractional
    seconds). Returned naive-UTC to match the pages schema."""
    if not v:
        return None
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return dt.datetime.strptime(v, fmt)
        except ValueError:
            continue
    return None


def warc_pages(buf: bytes) -> Iterator[tuple]:
    """(url, warc_ts, html, None, None) rows from one WARC buffer
    (compressed or not)."""
    for headers, payload in iter_warc_records(maybe_gunzip(buf)):
        if headers.get("warc-type") not in ("response", "resource"):
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        yield (url, parse_warc_date(headers.get("warc-date")),
               bytes(http_body(payload)), None, None)


def wet_pages(buf: bytes) -> Iterator[tuple]:
    """(url, warc_ts, None, text, None) rows from one WET buffer.
    WET is the same WARC framing with `conversion` records whose
    payload IS the extracted text (UTF-8) — so `text` arrives filled
    and the extraction operator's fill-if-missing contract leaves it
    untouched."""
    for headers, payload in iter_warc_records(maybe_gunzip(buf)):
        if headers.get("warc-type") != "conversion":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        yield (url, parse_warc_date(headers.get("warc-date")),
               None, payload.decode("utf-8", "replace"), None)


def _read_container(spark: SparkSession, path: str,
                    page_iter) -> DataFrame:
    import pandas as pd

    files = spark.read.format("binaryFile").load(path) \
        .select("content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "text", "lang"]
        for pdf in batches:
            # one output frame PER FILE: an Arrow batch can carry
            # several whole segments, and holding every decoded page
            # of all of them at once would multiply peak memory
            for content in pdf["content"]:
                yield pd.DataFrame(
                    list(page_iter(bytes(content))), columns=cols
                )

    return files.mapInPandas(run, schema=PAGES_SCHEMA)


def read_warc_files(spark: SparkSession, path: str) -> DataFrame:
    """Pages frame (PAGES_SCHEMA) from WARC files under `path` (glob).
    One task per file; parsing is executor-side, shuffle-free."""
    return _read_container(spark, path, warc_pages)


def read_wet_files(spark: SparkSession, path: str) -> DataFrame:
    """Pages frame from WET (extracted-text) files: text pre-filled,
    html NULL — the input shape for pipelines that trust CC's own
    extraction and skip the HTML stage entirely."""
    return _read_container(spark, path, wet_pages)
