"""WARC source: framing parser, CC-style member-per-record gzip,
HTTP body split, and the Spark binaryFile -> pages-frame path feeding
the standard extraction operator."""

from __future__ import annotations

import datetime as dt
import gzip

from edgar_finance_ontology_spark.sources.warc import (
    http_body,
    iter_warc_records,
    maybe_gunzip,
    parse_warc_date,
    read_warc_files,
    warc_pages,
)


def _rec(rtype: str, url: str | None = None,
         date: str = "2025-03-01T12:00:00Z",
         payload: bytes = b"") -> bytes:
    h = [b"WARC/1.0", b"WARC-Type: " + rtype.encode()]
    if url:
        h.append(b"WARC-Target-URI: " + url.encode())
    h += [b"WARC-Date: " + date.encode(),
          b"Content-Length: " + str(len(payload)).encode()]
    return b"\r\n".join(h) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(html: bytes) -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + html)


HTML_A = b"<html><body><p>Fact one about revenue.</p></body></html>"
HTML_B = b"<html><body><p>Another page body.</p></body></html>"


def _warc_buf() -> bytes:
    return (
        _rec("warcinfo", payload=b"software: test\r\n")
        + _rec("request", url="http://x.test/a",
               payload=b"GET /a HTTP/1.1\r\n\r\n")
        + _rec("response", url="http://x.test/a",
               payload=_http(HTML_A))
        + _rec("resource", url="http://x.test/raw",
               date="2025-03-01T12:00:00.500Z", payload=HTML_B)
        + _rec("metadata", url="http://x.test/a", payload=b"k: v\r\n")
    )


def test_framing_and_record_filter():
    recs = list(iter_warc_records(_warc_buf()))
    assert [h["warc-type"] for h, _ in recs] == [
        "warcinfo", "request", "response", "resource", "metadata"]
    pages = list(warc_pages(_warc_buf()))
    assert [(p[0], p[2]) for p in pages] == [
        ("http://x.test/a", HTML_A), ("http://x.test/raw", HTML_B)]
    assert pages[0][1] == dt.datetime(2025, 3, 1, 12, 0, 0)
    assert pages[1][1] == dt.datetime(2025, 3, 1, 12, 0, 0, 500000)


def test_truncated_and_garbage_tails_degrade_cleanly():
    buf = _warc_buf()
    # truncated mid-payload: earlier records still parse
    cut = buf[: buf.find(HTML_A) + 5]
    assert [h["warc-type"] for h, _ in iter_warc_records(cut)] == [
        "warcinfo", "request"]
    # non-WARC tail stops the walk without raising
    assert len(list(iter_warc_records(buf + b"garbage"))) == 5
    # non-HTTP payload comes back whole
    assert http_body(b"just bytes") == b"just bytes"
    assert http_body(_http(HTML_A)) == HTML_A
    assert parse_warc_date("not a date") is None
    assert parse_warc_date(None) is None


def test_cc_style_member_per_record_gzip():
    members = b"".join(
        gzip.compress(r) for r in (
            _rec("response", url="http://x.test/1",
                 payload=_http(HTML_A)),
            _rec("response", url="http://x.test/2",
                 payload=_http(HTML_B)),
        )
    )
    assert maybe_gunzip(b"plain") == b"plain"
    pages = list(warc_pages(members))
    assert [p[0] for p in pages] == ["http://x.test/1", "http://x.test/2"]
    # truncated final member: complete members still decode
    assert list(warc_pages(members[:-8]))[0][0] == "http://x.test/1"


def test_wet_conversion_records(spark, tmp_path):
    from edgar_finance_ontology_spark.sources.warc import (
        read_wet_files,
    )

    buf = (
        _rec("warcinfo", payload=b"software: test\r\n")
        + _rec("conversion", url="http://x.test/a",
               payload="Extracted text one.".encode())
        + _rec("response", url="http://x.test/skip",
               payload=_http(HTML_A))  # responses don't belong in WET
        + _rec("conversion", url="http://x.test/b",
               payload="Unicode: café".encode())
    )
    (tmp_path / "f.wet.gz").write_bytes(gzip.compress(buf))
    rows = {r["url"]: r for r in read_wet_files(
        spark, str(tmp_path / "*.wet.gz")).collect()}
    assert set(rows) == {"http://x.test/a", "http://x.test/b"}
    assert rows["http://x.test/a"]["text"] == "Extracted text one."
    assert rows["http://x.test/b"]["text"] == "Unicode: café"
    assert rows["http://x.test/a"]["html"] is None

    # the extraction operator's fill-if-missing contract leaves
    # pre-filled WET text untouched
    from edgar_finance_ontology_spark.operators.extraction import (
        with_extracted_text,
    )

    ext = {r["url"]: r["text"] for r in with_extracted_text(
        read_wet_files(spark, str(tmp_path / "*.wet.gz"))).collect()}
    assert ext["http://x.test/a"] == "Extracted text one."


def test_warc_roundtrip_matches_native_pipeline_inputs(spark, tmp_path):
    """Writing the synthetic panel's pages INTO a WARC container and
    reading them back through the WARC source yields the same
    extracted facts/companies as the native pages frame — the
    source-format boundary adds and loses nothing."""
    from edgar_finance_ontology_spark.plans.web_pipeline import (
        pages_to_inputs,
    )
    from edgar_finance_ontology_spark.sources.pages import (
        synthesize_pages,
    )

    native = synthesize_pages(spark, n_companies=2)
    buf = b"".join(
        gzip.compress(_rec(
            "response", url=r["url"],
            date=r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ"),
            payload=_http(bytes(r["html"])),
        ))
        for r in native.collect()
    )
    (tmp_path / "panel.warc.gz").write_bytes(buf)
    via_warc = read_warc_files(spark, str(tmp_path / "panel.warc.gz"))

    def norm(t):
        facts, companies = t
        return (sorted(map(tuple, facts.collect())),
                sorted(map(tuple, companies.collect())))

    assert norm(pages_to_inputs(via_warc)) == norm(
        pages_to_inputs(native))


def test_read_warc_files_feeds_extraction(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_warc_buf())
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(_rec(
        "response", url="http://x.test/b", payload=_http(HTML_B))))
    pages = read_warc_files(spark, str(tmp_path / "*.warc*"))
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {"http://x.test/a", "http://x.test/raw",
                         "http://x.test/b"}
    assert bytes(rows["http://x.test/a"]["html"]) == HTML_A
    assert rows["http://x.test/a"]["text"] is None

    from edgar_finance_ontology_spark.operators.extraction import (
        with_extracted_text,
    )

    ext = {r["url"]: r["text"]
           for r in with_extracted_text(pages).collect()}
    assert "Fact one about revenue." in ext["http://x.test/a"]
    assert "Another page body." in ext["http://x.test/b"]
